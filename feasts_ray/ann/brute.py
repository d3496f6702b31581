"""Brute-force cosine top-k: the exact ANN baseline.

Query matrix is broadcast ONCE via ray.put (object-store zero-copy read
in every task, never re-shipped per batch); each map_batches task does a
vectorized matmul against its batch and keeps a per-batch partial top-k.
The final merge reduces (num_batches x nq x k) partial rows — tiny —
with a driver-side heap-free argpartition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..dedup.embedding import _emb_matrix, _normalize_rows


class _PartialTopK:
    """Actor kernel: ray.get of the broadcast queries once per actor."""

    def __init__(self, emb_col: str, id_col: str, q_ref, k: int):
        self.emb_col = emb_col
        self.id_col = id_col
        self.q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize_rows(_emb_matrix(batch, self.emb_col))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = self.q @ m.T  # (nq, nb)
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        nq = sims.shape[0]
        qi = np.repeat(np.arange(nq, dtype=np.int64), k)
        vi = ids[part.reshape(-1)]
        sv = np.take_along_axis(sims, part, axis=1).reshape(-1)
        return pa.table({
            "query_id": pa.array(qi, type=pa.int64()),
            "vec_id": pa.array(vi),
            "sim": pa.array(sv, type=pa.float64()),
        })


def topk_cosine(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    batch_size: int = 4096,
    concurrency=(1, 8),
) -> pd.DataFrame:
    """Exact top-k neighbors per query row: (query_id, rank, vec_id, sim).

    Rank ties broken by vec_id ascending (deterministic)."""
    qn = _normalize_rows(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)
    partials = ds.map_batches(
        _PartialTopK,
        fn_constructor_args=(emb_col, id_col, q_ref, k),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    ).to_pandas()  # (num_batches * nq * k) rows — small
    out = []
    for qid, g in partials.groupby("query_id", sort=True):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        out.append(pd.DataFrame({
            "query_id": np.full(len(g), qid, dtype=np.int64),
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            "vec_id": g["vec_id"].to_numpy(),
            "sim": g["sim"].to_numpy(),
        }))
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        {"query_id": [], "rank": [], "vec_id": [], "sim": []})
