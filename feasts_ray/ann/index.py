"""Persisted ANN indexes with partition-pruned probing — the 100 TB path.

The in-kernel IVF/LSH variants (ivf.py / lsh.py) still scan every vector
and filter inside the task. These builders instead write the corpus as
Hive-partitioned Parquet keyed by the coarse cell (IVF) or hash bucket
(LSH table), so a probe reads ONLY the partition directories its cells
map to — at scale the read itself prunes files, nothing else is touched.

Index layout (IVF):
    <dir>/centroids.parquet            tiny: (cell, centroid list<double>)
    <dir>/cells/cell=<c>/*.parquet     vectors of that coarse cell

Index layout (LSH):
    <dir>/meta.parquet                 planes flattened + params
    <dir>/tables/table=<t>/bucket=<b>/*.parquet
    (the corpus is replicated once per hash table — the standard
    disk-resident multi-table LSH trade: n_tables x storage for
    single-partition probes per table)

Writes are resumable: each partition directory is written atomically by
Ray's parquet sink; re-building into the same dir overwrites per file.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..dedup.embedding import _emb_matrix, _normalize_rows
from .ivf import train_centroids


def _expand_partition_files(dirs: list[str]) -> list[str]:
    """Partition dirs -> their parquet files (read_parquet needs files
    when given a list)."""
    import os

    files: list[str] = []
    for d in dirs:
        if os.path.isdir(d):
            files.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith(".parquet"))
    return files


class _CellAssigner:
    """Actor kernel: append the coarse-cell id (argmax cosine vs the
    broadcast centroid matrix) to each row."""

    def __init__(self, emb_col: str, c_ref):
        self.emb_col = emb_col
        self.C = ray.get(c_ref) if isinstance(c_ref, ray.ObjectRef) else c_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize_rows(_emb_matrix(batch, self.emb_col))
        cell = np.argmax(m @ self.C.T, axis=1).astype(np.int64)
        return batch.append_column("cell", pa.array(cell, type=pa.int64()))


def build_ivf_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    n_centroids: int = 64,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 20000,
    seed: int = 11,
    batch_size: int = 4096,
    concurrency=(1, 8),
) -> np.ndarray:
    """Train the coarse quantizer, assign every vector distributed, and
    persist Hive-partitioned by cell. Returns the centroid matrix."""
    import os

    os.makedirs(index_dir, exist_ok=True)
    C = train_centroids(ds, n_centroids, emb_col, sample_size, seed=seed)
    pq.write_table(
        pa.table({
            "cell": pa.array(np.arange(len(C), dtype=np.int64)),
            "centroid": pa.array([c.tolist() for c in C],
                                 type=pa.list_(pa.float64())),
        }),
        f"{index_dir}/centroids.parquet",
    )
    ds.map_batches(
        _CellAssigner,
        fn_constructor_args=(emb_col, ray.put(C)),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    ).write_parquet(f"{index_dir}/cells", partition_cols=["cell"])
    return C


def load_centroids(index_dir: str) -> np.ndarray:
    t = pq.read_table(f"{index_dir}/centroids.parquet").sort_by("cell")
    col = t["centroid"].combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False)
    return flat.reshape(len(t), -1)


def topk_cosine_ivf_index(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_probe: int = 8,
    batch_size: int = 4096,
    concurrency=(1, 8),
) -> pd.DataFrame:
    """Probe a persisted IVF index: ONLY the union of the queries'
    n_probe nearest cell partitions is read from storage (path-level
    pruning); scoring is the exact brute-force kernel over that slice."""
    from .brute import topk_cosine

    C = load_centroids(index_dir)
    qn = _normalize_rows(np.asarray(queries, dtype=np.float64))
    n_probe = min(n_probe, len(C))
    probes = np.argsort(-(qn @ C.T), axis=1)[:, :n_probe]
    cells = np.unique(probes)
    paths = _expand_partition_files(
        [f"{index_dir}/cells/cell={c}" for c in cells])
    sub = ray.data.read_parquet(paths, columns=[id_col, emb_col])
    return topk_cosine(sub, qn, k=k, emb_col=emb_col, id_col=id_col,
                       batch_size=batch_size, concurrency=concurrency)


class _LSHBucketer:
    """Actor kernel: replicate each row once per hash table with its
    (table, bucket) signature columns."""

    def __init__(self, emb_col: str, planes_ref):
        self.emb_col = emb_col
        self.planes = (ray.get(planes_ref)
                       if isinstance(planes_ref, ray.ObjectRef) else planes_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize_rows(_emb_matrix(batch, self.emb_col))
        n_tables, _, n_bits = self.planes.shape
        weights = (1 << np.arange(n_bits, dtype=np.int64))
        parts = []
        for t in range(n_tables):
            vb = ((m @ self.planes[t]) > 0) @ weights
            tb = batch.append_column("table", pa.array(
                np.full(len(batch), t, dtype=np.int64)))
            parts.append(tb.append_column("bucket", pa.array(vb, type=pa.int64())))
        return pa.concat_tables(parts)


def build_lsh_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    emb_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 7,
    batch_size: int = 4096,
    concurrency=(1, 8),
) -> np.ndarray:
    """Persist an LSH index partitioned by (table, bucket). Storage is
    n_tables x the corpus; each probe reads one bucket dir per table."""
    import os

    os.makedirs(index_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, dim, n_bits))
    pq.write_table(
        pa.table({
            "planes": pa.array([planes.reshape(-1).tolist()],
                               type=pa.list_(pa.float64())),
            "n_tables": pa.array([n_tables], type=pa.int64()),
            "dim": pa.array([dim], type=pa.int64()),
            "n_bits": pa.array([n_bits], type=pa.int64()),
        }),
        f"{index_dir}/meta.parquet",
    )
    ds.map_batches(
        _LSHBucketer,
        fn_constructor_args=(emb_col, ray.put(planes)),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    ).write_parquet(f"{index_dir}/tables", partition_cols=["table", "bucket"])
    return planes


def topk_cosine_lsh_index(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    batch_size: int = 4096,
    concurrency=(1, 8),
) -> pd.DataFrame:
    """Probe a persisted LSH index: read only each query's bucket dir in
    each table (path-level pruning), dedupe candidates, exact-score."""
    import os

    from .brute import topk_cosine

    meta = pq.read_table(f"{index_dir}/meta.parquet")
    n_tables = int(meta["n_tables"][0].as_py())
    dim = int(meta["dim"][0].as_py())
    n_bits = int(meta["n_bits"][0].as_py())
    planes = np.array(meta["planes"][0].as_py()).reshape(n_tables, dim, n_bits)
    qn = _normalize_rows(np.asarray(queries, dtype=np.float64))
    weights = (1 << np.arange(n_bits, dtype=np.int64))
    dirs = []
    for t in range(n_tables):
        qb = ((qn @ planes[t]) > 0) @ weights
        for b in np.unique(qb):
            p = f"{index_dir}/tables/table={t}/bucket={b}"
            if os.path.isdir(p):
                dirs.append(p)
    paths = _expand_partition_files(dirs)
    if not paths:
        return pd.DataFrame({"query_id": [], "rank": [], "vec_id": [], "sim": []})
    sub = ray.data.read_parquet(paths, columns=[id_col, emb_col])
    # a vector can land in a probed bucket of several tables: dedupe by id
    # with a BOUNDED group count (hash(id) % 64) + one vectorized
    # drop_duplicates per group — per-id map_groups would cost ~0.3 ms of
    # Python per candidate id
    _MIX = np.uint64(0x9E3779B97F4A7C15)

    def _add_group(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        g = ((ids.view(np.uint64) * _MIX) % np.uint64(64)).astype(np.int64)
        return batch.append_column("_g", pa.array(g, type=pa.int64()))

    def _dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=[id_col]).drop(columns=["_g"])

    uniq = sub.map_batches(_add_group, batch_format="pyarrow").groupby(
        "_g").map_groups(_dedup, batch_format="pandas")
    return topk_cosine(uniq, qn, k=k, emb_col=emb_col, id_col=id_col,
                       batch_size=batch_size, concurrency=concurrency)
