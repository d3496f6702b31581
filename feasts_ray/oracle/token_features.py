"""Single-process oracle for per-doc token-stream features: a plain
doc-by-doc loop (B=1) over the same pure per-row math. Bit-exactness vs
the Ray actor-pool kernel holds because every reduction is row-wise over
the fixed PAD_LEN, so the summation tree is identical regardless of
batching/parallelism."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.token_features import FEATURE_COLS, pad_bucket, token_feature_block
from ..synth import token_chunk


def oracle_token_features(n_docs: int, max_len: int = 512,
                          chunk: int = 4096) -> pd.DataFrame:
    """Features for the deterministic synth table, one doc at a time."""
    rows = []
    for lo in range(0, n_docs, chunk):
        t = token_chunk(lo, min(lo + chunk, n_docs), max_len)
        toks = t["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.values.to_numpy(zero_copy_only=False).astype(np.float64)
        doc_ids = t["doc_id"].to_pylist()
        sources = t["source"].to_pylist()
        for i in range(len(t)):
            v = flat[offs[i]:offs[i + 1]]
            L = pad_bucket(len(v))
            x = np.zeros((1, L))
            x[0, : len(v)] = v
            n = np.array([len(v)], dtype=np.int64)
            mask = np.arange(L)[None, :] < n[:, None]
            f = token_feature_block(x, n, mask)
            row = {"doc_id": doc_ids[i], "source": sources[i]}
            row.update({c: f[c][0] for c in FEATURE_COLS})
            rows.append(row)
    return pd.DataFrame(rows)
