"""Similarity search over embedding columns."""

from .brute import topk_cosine
from .index import (
    build_ivf_index,
    build_lsh_index,
    topk_cosine_ivf_index,
    topk_cosine_lsh_index,
)
from .ivf import topk_cosine_ivf
from .lsh import topk_cosine_lsh

__all__ = [
    "topk_cosine",
    "topk_cosine_lsh",
    "topk_cosine_ivf",
    "build_ivf_index",
    "build_lsh_index",
    "topk_cosine_ivf_index",
    "topk_cosine_lsh_index",
]
