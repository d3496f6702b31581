"""Embedding-cosine near-duplicate detection via random-hyperplane LSH.

Sign-bit sketch of each embedding against H seeded random hyperplanes ->
bucket on the sketch (ONE groupby shuffle) -> exact cosine verify within
buckets. Multi-probe: emit `n_tables` independent sketches per vector so
near pairs split across one table's boundary are caught by another.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr.type, pa.ExtensionType):
        # Ray's ArrowTensorType (fixed-shape lists round-trip through Ray
        # blocks as the tensor extension): to_numpy gives (n, dim)
        m = np.asarray(arr.to_numpy(zero_copy_only=False), dtype=np.float64)
        return m.reshape(len(batch), -1)
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // len(batch) if len(batch) else 0
    return flat.reshape(len(batch), dim)


class HyperplaneSketch:
    """map_batches kernel: embedding -> (vec_id, table, bucket) rows.

    Hyperplane matrix is built once per actor (seeded, deterministic)."""

    def __init__(self, emb_col: str, id_col: str, dim: int, n_bits: int,
                 n_tables: int, seed: int):
        self.emb_col = emb_col
        self.id_col = id_col
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, dim, n_bits))
        self.n_bits = n_bits
        self.n_tables = n_tables

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch, self.emb_col)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        weights = (1 << np.arange(self.n_bits, dtype=np.int64))
        out_id, out_tab, out_b = [], [], []
        for t in range(self.n_tables):
            bits = (m @ self.planes[t]) > 0
            out_b.append(bits @ weights)
            out_id.append(ids)
            out_tab.append(np.full(n, t, dtype=np.int64))
        return pa.table({
            self.id_col: pa.array(np.concatenate(out_id)),
            "table": pa.array(np.concatenate(out_tab), type=pa.int64()),
            "bucket": pa.array(np.concatenate(out_b), type=pa.int64()),
        })


class _ExactPairKernel:
    """Actor kernel for the exact all-pairs baseline: the corpus
    (ids + float32 matrix) is broadcast ONCE via ray.put and resolved in
    __init__ (object-store zero-copy per node, never re-shipped per
    batch). Exact-fold norms are precomputed once per actor.

    Bit-exactness contract: DuckDB's list_cosine_similarity over FLOAT[]
    is a float32 SEQUENTIAL fold of dot / (sqrt(|x|^2) * sqrt(|y|^2));
    np.cumsum(..., dtype=float32)[:, -1] reproduces that fold order, so
    the emitted `sim` is bitwise-identical to the SQL oracle. The fast
    float32 BLAS matmul is only a SCREEN (threshold - margin); survivors
    are recomputed with the exact fold before the >= threshold cut."""

    def __init__(self, emb_col: str, id_col: str, corpus_ref,
                 threshold: float):
        self.emb_col = emb_col
        self.id_col = id_col
        ids, mat = (ray.get(corpus_ref)
                    if isinstance(corpus_ref, ray.ObjectRef) else corpus_ref)
        self.cids = ids
        self.cmat = mat  # (N, D) float32
        self.cnrm = np.sqrt(np.cumsum(mat * mat, axis=1,
                                      dtype=np.float32)[:, -1])
        self.threshold = threshold
        # Screen slack must dominate the worst-case relative drift between
        # the BLAS float32 matmul and the sequential float32 fold, which
        # grows linearly with dim (~dim * eps32 per accumulation chain);
        # a fixed constant would silently drop qualifying pairs at high
        # dim. 16x safety factor; floor keeps the historical 1e-3 slack.
        dim = mat.shape[1] if mat.ndim == 2 else 0
        self._margin = max(1e-3,
                           16.0 * dim * float(np.finfo(np.float32).eps))

    def __call__(self, batch: pa.Table) -> pa.Table:
        bmat = _emb_matrix(batch, self.emb_col).astype(np.float32)
        bids = batch[self.id_col].to_numpy(zero_copy_only=False)
        empty = pa.table({
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "sim": pa.array([], type=pa.float32()),
        })
        if len(bids) == 0:
            return empty
        bnrm = np.sqrt(np.cumsum(bmat * bmat, axis=1,
                                 dtype=np.float32)[:, -1])
        with np.errstate(divide="ignore", invalid="ignore"):
            screen = (bmat @ self.cmat.T) / np.outer(bnrm, self.cnrm)
        cand = (screen >= self.threshold - self._margin) & (
            bids[:, None] < self.cids[None, :])
        bi, cj = np.nonzero(cand)
        if len(bi) == 0:
            return empty
        dot = np.cumsum(bmat[bi] * self.cmat[cj], axis=1,
                        dtype=np.float32)[:, -1]
        with np.errstate(divide="ignore", invalid="ignore"):
            sim = dot / (bnrm[bi] * self.cnrm[cj])
        keep = sim.astype(np.float64) >= self.threshold
        return pa.table({
            "id_a": pa.array(bids[bi[keep]].astype(np.int64)),
            "id_b": pa.array(self.cids[cj[keep]].astype(np.int64)),
            "sim": pa.array(sim[keep], type=pa.float32()),
        })


def embedding_dup_pairs_exact(
    ds: "ray.data.Dataset",
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
    batch_size: int = 1024,
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    """EXACT embedding near-dup pairs: every (id_a < id_b) with cosine >=
    threshold, by distributed blocked all-pairs (each batch x broadcast
    corpus matmul). This is the exact BASELINE for validating the LSH
    path's recall (`embedding_dup_pairs`); it is inherently O(n^2) sims,
    so at 100 TB the LSH/IVF-bucketed variants are the scale path and
    this one runs on samples / partitions (the per-batch kernel shape —
    tile x tile — is exactly what a corpus-partitioned pair sweep would
    reuse). The `sim` column is bit-identical to DuckDB's
    list_cosine_similarity (float32 sequential fold; see _ExactPairKernel)."""
    ids_chunks, mat_chunks = [], []
    for b in ds.select_columns([id_col, emb_col]).iter_batches(
            batch_size=4096, batch_format="pyarrow"):
        ids_chunks.append(
            b[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
        mat_chunks.append(_emb_matrix(b, emb_col).astype(np.float32))
    ids = (np.concatenate(ids_chunks) if ids_chunks
           else np.array([], dtype=np.int64))
    mat = (np.concatenate(mat_chunks) if mat_chunks
           else np.zeros((0, 0), dtype=np.float32))
    corpus_ref = ray.put((ids, mat))
    return ds.map_batches(
        _ExactPairKernel,
        fn_constructor_args=(emb_col, id_col, corpus_ref, threshold),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def embedding_dedup_docs(
    ds: "ray.data.Dataset",
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
    **kwargs,
) -> "ray.data.Dataset":
    """(vec_id, cluster_id) for every embedding row: cluster_id = min id
    of its cosine near-dup component at the given threshold (rows with no
    near-dup keep their own id) — the embedding analogue of
    `minhash_dedup_docs`, i.e. the SemDeDup-style 'keep one per semantic
    component' policy is `filter(vec_id == cluster_id)` downstream.

    The pair set is the EXACT all-pairs baseline
    (`embedding_dup_pairs_exact`: blocked batch x broadcast-corpus
    matmul, `sim` bit-identical to DuckDB list_cosine_similarity), so
    cluster labels are pure-int64 min-label propagation over an exactly
    reproducible edge set — the driver oracle mirrors both. At 100 TB
    the same clustering composes with the LSH candidate pairs
    (`embedding_dup_pairs`) instead; this query is the recall-1 yardstick
    for that path."""
    from .cluster import connected_components

    pairs = embedding_dup_pairs_exact(ds, emb_col=emb_col, id_col=id_col,
                                      threshold=threshold, **kwargs)
    comp = connected_components(pairs, ds.select_columns([id_col]), id_col)

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b["node"], "cluster_id": b["label"]})

    return comp.map_batches(_rename, batch_format="pyarrow")


def embedding_dup_pairs(
    ds: "ray.data.Dataset",
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    threshold: float = 0.9,
    n_bits: int = 12,
    n_tables: int = 4,
    seed: int = 7,
    max_bucket: int = 2000,
    batch_size: int = 1024,
) -> pd.DataFrame:
    """Pairs (id_a < id_b) with cosine >= threshold found via LSH buckets.

    The id->vector lookup for verification is collected once and shipped
    to the verify kernels via the map_groups constructor (broadcast, not
    per-batch). At 100 TB the verify side would instead re-join vectors
    by id through a second bucket-keyed pass; documented scale path.
    """
    lookup: dict[int, np.ndarray] = {}
    for batch in ds.select_columns([id_col, emb_col]).iter_batches(
        batch_size=4096, batch_format="pyarrow"
    ):
        m = _normalize_rows(_emb_matrix(batch, emb_col))
        for i, vid in enumerate(batch[id_col].to_numpy(zero_copy_only=False)):
            lookup[int(vid)] = m[i]
    from .pairs import emit_candidate_pairs

    sketch = ds.map_batches(
        HyperplaneSketch,
        fn_constructor_args=(emb_col, id_col, dim, n_bits, n_tables, seed),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
    )
    pdf = emit_candidate_pairs(sketch, ["table", "bucket"], id_col,
                               max_bucket=max_bucket)
    if len(pdf) == 0:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64"),
                             "cosine": pd.Series(dtype="float64")})
    # verify: exact cosine on the candidate set (vectorized gather + rowwise dot)
    va = np.stack([lookup[int(i)] for i in pdf["id_a"]])
    vb = np.stack([lookup[int(i)] for i in pdf["id_b"]])
    cos = np.einsum("ij,ij->i", va, vb)
    out = pd.DataFrame({"id_a": pdf["id_a"], "id_b": pdf["id_b"], "cosine": cos})
    out = out[out["cosine"] >= threshold]
    return out.sort_values(["id_a", "id_b"], ignore_index=True)
