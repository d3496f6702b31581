"""IVF (inverted-file) approximate top-k cosine search.

Scale path: a coarse spherical-k-means quantizer is trained ONCE on a
driver-side sample (the classic IVF recipe); centroids + queries are
broadcast via ray.put, and each map_batches task scores only the vectors
whose centroid falls in a query's ``n_probe`` nearest centroids. The
filter here happens in-kernel (single-pass, no index); the persisted
variant with the cell as a partition column — so probing prunes whole
files — is index.build_ivf_index / topk_cosine_ivf_index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..dedup.embedding import _emb_matrix, _normalize_rows


def train_centroids(
    ds: "ray.data.Dataset",
    n_centroids: int = 64,
    emb_col: str = "embedding",
    sample_size: int = 20000,
    iters: int = 15,
    seed: int = 11,
) -> np.ndarray:
    """Spherical k-means on a sample (kmeans++-seeded, normalized
    centroids). Sample -> driver; O(sample x dim) memory."""
    rng = np.random.default_rng(seed)
    n_total = ds.count()
    frac = min(1.0, sample_size / max(n_total, 1))
    sample_ds = ds.random_sample(frac, seed=seed) if frac < 1.0 else ds
    rows = sample_ds.select_columns([emb_col]).take_all()
    m = _normalize_rows(np.array([r[emb_col] for r in rows], dtype=np.float64))
    k = min(n_centroids, len(m))
    # kmeans++ init
    centroids = [m[rng.integers(len(m))]]
    for _ in range(1, k):
        sims = np.max(np.stack([m @ c for c in centroids]), axis=0)
        d2 = np.maximum(1.0 - sims, 1e-12)
        centroids.append(m[rng.choice(len(m), p=d2 / d2.sum())])
    C = np.stack(centroids)
    for _ in range(iters):
        assign = np.argmax(m @ C.T, axis=1)
        for j in range(k):
            sel = m[assign == j]
            if len(sel):
                C[j] = sel.sum(axis=0)
        C = _normalize_rows(C)
    return C


class _IVFScorer:
    def __init__(self, emb_col, id_col, payload_ref, k):
        payload = ray.get(payload_ref) if isinstance(payload_ref, ray.ObjectRef) \
            else payload_ref
        self.q, self.C, self.probes = payload  # (nq,d), (nc,d), (nq,n_probe)
        self.emb_col = emb_col
        self.id_col = id_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize_rows(_emb_matrix(batch, self.emb_col))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        assign = np.argmax(m @ self.C.T, axis=1)           # coarse cell per vec
        qi_list, vi_list, sv_list = [], [], []
        for qi in range(self.q.shape[0]):
            sel = np.flatnonzero(np.isin(assign, self.probes[qi]))
            if len(sel) == 0:
                continue
            sims = m[sel] @ self.q[qi]
            kk = min(self.k, len(sel))
            part = np.argpartition(-sims, kk - 1)[:kk]
            qi_list.append(np.full(kk, qi, dtype=np.int64))
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


def topk_cosine_ivf(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 64,
    n_probe: int = 8,
    sample_size: int = 20000,
    seed: int = 11,
    batch_size: int = 4096,
    concurrency=(1, 8),
) -> pd.DataFrame:
    """Approximate top-k per query: (query_id, rank, vec_id, sim)."""
    C = train_centroids(ds, n_centroids, emb_col, sample_size, seed=seed)
    qn = _normalize_rows(np.asarray(queries, dtype=np.float64))
    n_probe = min(n_probe, len(C))
    probes = np.argsort(-(qn @ C.T), axis=1)[:, :n_probe]
    payload_ref = ray.put((qn, C, probes))
    partials = ds.map_batches(
        _IVFScorer,
        fn_constructor_args=(emb_col, id_col, payload_ref, k),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
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
