"""Text analysis stages for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting."""

from .analysis import add_token_counts, add_quality, add_fingerprint, add_langid

__all__ = ["add_token_counts", "add_quality", "add_fingerprint", "add_langid"]
