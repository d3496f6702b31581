"""Fused per-doc stage: ONE scan of the token table feeds BOTH the
token-feature table and the verified token archive.

Both stages are per-doc and zero-shuffle, and both need the (large)
``tokens`` list column — running them separately costs two full
parquet reads + decompressions of the corpus. The fused kernel runs
the archive encode+verify and the feature extraction on the SAME
in-memory Arrow batch:

  read_parquet(doc_id, tokens, n_tok, source)      # one scan
    -> map_batches(fused_doc_batch)                # zero-copy Arrow
         |- archive: dod encode + per-row verify -> returned (streams
         |    through Ray's parquet sink with backpressure)
         `- features: padded-matrix kernel -> side-written per batch
              (atomic tmp+rename parquet, the tier-blob pattern)

Bit-exactness: feature values are pad-bucketed with per-row reduction
trees (batch-shape independent, pinned by tests), so the fused output
is bit-identical to the standalone `token_feature_table` stage; the
archive rows are byte-identical to the standalone `archive_tokens`
stage (same kernel, same batch layout).
"""

from __future__ import annotations

import zlib
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from .token_archive import archive_tokens_batch
from .token_features import token_feature_batch


def _atomic_write_parquet(table: pa.Table, out_dir: str, stem: str) -> None:
    """tmp + rename so a killed task never leaves a half-written file;
    task retries overwrite with identical bytes (deterministic name)."""
    d = Path(out_dir)
    d.mkdir(parents=True, exist_ok=True)
    tmp = d / f".tmp-{stem}.parquet"
    pq.write_table(table, tmp)
    tmp.rename(d / f"{stem}.parquet")


def fused_doc_batch(batch: pa.Table, features_dir: str,
                    tokens_col: str = "tokens") -> pa.Table:
    """map_batches kernel: archive columns returned, feature rows
    side-written. Batches are disjoint doc sets, so naming the feature
    file by the first doc_id + row count is collision-free within a run
    and stable across task retries."""
    arch = archive_tokens_batch(batch, tokens_col=tokens_col, verify=True)
    if len(batch):
        feats = token_feature_batch(batch, tokens_col=tokens_col)
        first = str(feats["doc_id"][0].as_py())
        stem = f"feat-{zlib.crc32(first.encode()):08x}-{len(feats)}"
        _atomic_write_parquet(feats, features_dir, stem)
    return arch
