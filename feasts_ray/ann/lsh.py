"""LSH-bucketed approximate top-k: the scale path for ANN.

Same random-hyperplane sketch as dedup.embedding; each query probes its
own bucket per table, so only vectors sharing a bucket with some query
are scored (the scan still touches every block; selectivity only cuts
the matmul). The persisted variant that prunes at the READ — buckets as
partition dirs — is index.build_lsh_index / topk_cosine_lsh_index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..dedup.embedding import _emb_matrix, _normalize_rows


class _BucketScorer:
    def __init__(self, emb_col: str, id_col: str, q_ref, planes, k: int):
        payload = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        self.q, self.q_buckets = payload  # (nq,d), (n_tables,nq)
        self.planes = planes
        self.emb_col = emb_col
        self.id_col = id_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize_rows(_emb_matrix(batch, self.emb_col))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n_tables = self.planes.shape[0]
        weights = (1 << np.arange(self.planes.shape[2], dtype=np.int64))
        # candidate mask: vector shares a bucket with query in ANY table
        cand = np.zeros((self.q.shape[0], len(ids)), dtype=bool)
        for t in range(n_tables):
            vb = ((m @ self.planes[t]) > 0) @ weights
            cand |= self.q_buckets[t][:, None] == vb[None, :]
        qi_list, vi_list, sv_list = [], [], []
        for qi in range(self.q.shape[0]):
            sel = np.flatnonzero(cand[qi])
            if len(sel) == 0:
                continue
            sims = m[sel] @ self.q[qi]
            k = min(self.k, len(sel))
            part = np.argpartition(-sims, k - 1)[:k]
            qi_list.append(np.full(k, qi, dtype=np.int64))
            vi_list.append(ids[sel[part]])
            sv_list.append(sims[part])
        if not qi_list:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(qi_list), type=pa.int64()),
            "vec_id": pa.array(np.concatenate(vi_list)),
            "sim": pa.array(np.concatenate(sv_list), type=pa.float64()),
        })


def topk_cosine_lsh(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_bits: int = 8,
    n_tables: int = 8,
    seed: int = 7,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """Approximate top-k per query: (query_id, rank, vec_id, sim)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, dim, n_bits))
    qn = _normalize_rows(np.asarray(queries, dtype=np.float64))
    weights = (1 << np.arange(n_bits, dtype=np.int64))
    qb = np.stack([((qn @ planes[t]) > 0) @ weights for t in range(n_tables)])
    q_ref = ray.put((qn, qb))
    partials = ds.map_batches(
        _BucketScorer,
        fn_constructor_args=(emb_col, id_col, q_ref, planes, k),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
    ).to_pandas()
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
