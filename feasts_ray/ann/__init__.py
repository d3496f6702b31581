"""Similarity search over embedding columns."""

from .brute import topk_cosine
from .ivf import topk_cosine_ivf
from .lsh import topk_cosine_lsh

__all__ = ["topk_cosine", "topk_cosine_lsh", "topk_cosine_ivf"]
