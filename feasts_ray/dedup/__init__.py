"""Deduplication operators for large-scale training-data pipelines.

Exact (hash-partition + per-group survivor), MinHash+LSH near-dup,
SimHash near-dup, n-gram Jaccard verification, embedding-cosine near-dup.
All are Ray-Data-native: map_batches signature stages + one groupby
shuffle keyed by the (band/bucket) hash.
"""

from .cluster import (connected_components, load_assignments,
                      minhash_dedup_docs, minhash_dedup_docs_persistent,
                      persist_assignments)
from .exact import dedup_exact, exact_groups
from .keep_best import dedup_keep_best
from .minhash import minhash_dedup_pairs, ngram_jaccard_pairs_lsh
from .ngram import ngram_jaccard_pairs
from .simhash import simhash_dedup_pairs
from .embedding import (embedding_dedup_docs, embedding_dup_pairs,
                        embedding_dup_pairs_exact)

__all__ = [
    "connected_components",
    "dedup_exact",
    "dedup_keep_best",
    "exact_groups",
    "load_assignments",
    "minhash_dedup_docs",
    "minhash_dedup_docs_persistent",
    "persist_assignments",
    "minhash_dedup_pairs",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_lsh",
    "simhash_dedup_pairs",
    "embedding_dedup_docs",
    "embedding_dup_pairs",
    "embedding_dup_pairs_exact",
]
