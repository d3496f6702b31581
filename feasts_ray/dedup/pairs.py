"""Shared LSH candidate-pair emission with BOUNDED group count.

Grouping directly by (bucket columns) gives one Ray group per bucket —
~0.3 ms of Python per group makes 10^5 buckets cost ~30 s regardless of
data size. Instead the shuffle key is hash(bucket) % num_groups (a few
hundred groups); inside each group, identical buckets are found by a
vectorized lexsort + run-length scan, and pairs are emitted per run.
Group count (and so Python overhead) is constant; per-group work is
vectorized. Correctness is unchanged: identical buckets always share a
group because the group key is a function of the bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _mix_cols(batch: pa.Table, cols: list[str]) -> np.ndarray:
    acc = np.zeros(len(batch), dtype=np.uint64)
    for c in cols:
        v = batch[c].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        acc = (acc ^ v) * _MIX
    return acc


class _RunPairKernel:
    def __init__(self, bucket_cols, id_col, carry_cols, max_bucket,
                 post_filter=None, overflow: str = "truncate"):
        self.bucket_cols = list(bucket_cols)
        self.id_col = id_col
        self.carry_cols = list(carry_cols)
        self.max_bucket = max_bucket
        self.post_filter = post_filter
        self.overflow = overflow

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        df = group.drop_duplicates(subset=[*self.bucket_cols, self.id_col])
        df = df.sort_values([*self.bucket_cols, self.id_col], kind="mergesort",
                            ignore_index=True)
        keys = np.zeros(len(df), dtype=np.uint64)
        for c in self.bucket_cols:
            keys = (keys ^ df[c].to_numpy().astype(np.int64).view(np.uint64)) * _MIX
        change = np.empty(len(df), dtype=bool)
        change[0] = True
        change[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(df))
        ids = df[self.id_col].to_numpy()
        carries = {c: df[c].to_numpy() for c in self.carry_cols}
        ia_all, ib_all = [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            if n > self.max_bucket:
                if self.overflow == "error":
                    # exact-recall callers (prefix-filtered n-gram
                    # Jaccard) must never silently drop pairs
                    raise RuntimeError(
                        f"candidate bucket of size {n} exceeds "
                        f"max_bucket={self.max_bucket}; a shingle this "
                        "common defeats the prefix filter — raise "
                        "max_bucket or pre-drop stopword shingles")
                e = s + self.max_bucket
                n = self.max_bucket
            ia, ib = np.triu_indices(n, k=1)
            ia_all.append(s + ia)
            ib_all.append(s + ib)
        if not ia_all:
            cols = {"id_a": np.array([], dtype=ids.dtype),
                    "id_b": np.array([], dtype=ids.dtype)}
            for c in self.carry_cols:
                cols[f"{c}_a"] = np.array([], dtype=carries[c].dtype)
                cols[f"{c}_b"] = np.array([], dtype=carries[c].dtype)
            return pd.DataFrame(cols)
        ia = np.concatenate(ia_all)
        ib = np.concatenate(ib_all)
        out = {"id_a": ids[ia], "id_b": ids[ib]}
        for c in self.carry_cols:
            out[f"{c}_a"] = carries[c][ia]
            out[f"{c}_b"] = carries[c][ib]
        df = pd.DataFrame(out)
        if self.post_filter is not None:
            # verify INSIDE the kernel: clustered data can explode the
            # candidate set, so cheap vectorized filters must run before
            # anything is collected
            df = self.post_filter(df)
        return df


def emit_candidate_pairs(
    ds: "ray.data.Dataset",
    bucket_cols: list[str],
    id_col: str,
    carry_cols: list[str] = (),
    num_groups: int = 128,
    max_bucket: int = 500,
    post_filter=None,
) -> pd.DataFrame:
    """(bucket..., id[, carry...]) rows -> deduped candidate pairs
    (id_a < id_b) as a small pandas DataFrame. ``post_filter`` (df -> df,
    vectorized) runs inside the pair kernels before collection — callers
    that collect here MUST verify in-kernel via post_filter so only the
    verified (small) pair set reaches the driver."""
    pairs = _candidate_pairs_raw(ds, bucket_cols, id_col, carry_cols,
                                 num_groups, max_bucket, post_filter)
    pdf = pairs.to_pandas()
    if len(pdf) == 0:
        return pdf
    return pdf.drop_duplicates(subset=["id_a", "id_b"], ignore_index=True)


def _candidate_pairs_raw(ds, bucket_cols, id_col, carry_cols, num_groups,
                         max_bucket, post_filter,
                         overflow: str = "truncate") -> "ray.data.Dataset":
    def _add_group(batch: pa.Table) -> pa.Table:
        g = (_mix_cols(batch, list(bucket_cols)) % np.uint64(num_groups)).astype(np.int64)
        return batch.append_column("pgroup", pa.array(g, type=pa.int64()))

    kernel = _RunPairKernel(bucket_cols, id_col, carry_cols, max_bucket,
                            post_filter, overflow)
    return ds.map_batches(_add_group, batch_format="pyarrow").groupby(
        "pgroup").map_groups(kernel.__call__, batch_format="pandas")


def emit_candidate_pairs_ds(
    ds: "ray.data.Dataset",
    bucket_cols: list[str],
    id_col: str,
    num_groups: int = 128,
    max_bucket: int = 500,
    dedup: bool = True,
    overflow: str = "truncate",
) -> "ray.data.Dataset":
    """Distributed variant: candidate pairs as a Dataset of (id_a, id_b)
    — nothing ever lands on the driver. With ``dedup`` (default) pairs
    are globally deduped by a hash groupby; pass dedup=False when a
    downstream stage already groups by a function of id_a and can dedup
    there for free (saves one all-to-all — see dedup/minhash.py).
    ``overflow="error"`` raises instead of truncating oversized buckets
    (exact-recall callers)."""
    raw = _candidate_pairs_raw(ds, bucket_cols, id_col, (), num_groups,
                               max_bucket, None, overflow)
    if not dedup:
        return raw
    from ray.data.aggregate import Count

    return raw.groupby(["id_a", "id_b"]).aggregate(
        Count(alias_name="_nbands")).drop_columns(["_nbands"])
