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
