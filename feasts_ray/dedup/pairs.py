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
    """Arrow-native map_groups kernel: one vectorized lexsort finds the
    identical-bucket runs, then pairs for ALL runs of a given size are
    emitted with one broadcast add over np.triu_indices — run count never
    appears in a Python loop (the only loop is over DISTINCT capped run
    sizes, <= max_bucket iterations)."""

    def __init__(self, bucket_cols, id_col, carry_cols, max_bucket,
                 post_filter=None, overflow: str = "truncate"):
        self.bucket_cols = list(bucket_cols)
        self.id_col = id_col
        self.carry_cols = list(carry_cols)
        self.max_bucket = max_bucket
        self.post_filter = post_filter
        self.overflow = overflow

    def __call__(self, group: pa.Table) -> pa.Table:
        keys = _mix_cols(group, self.bucket_cols)
        id_col = group[self.id_col]
        if isinstance(id_col, pa.ChunkedArray):
            id_col = id_col.combine_chunks()
        ids = id_col.to_numpy(zero_copy_only=False)
        # sort runs together; ids ascend within a run (stable lexsort)
        order = np.lexsort((ids, keys))
        k_s, id_s = keys[order], ids[order]
        # drop duplicate (bucket, id) rows: first occurrence per run
        keep = np.ones(len(k_s), dtype=bool)
        keep[1:] = (k_s[1:] != k_s[:-1]) | (id_s[1:] != id_s[:-1])
        order, k_s, id_s = order[keep], k_s[keep], id_s[keep]
        first = np.ones(len(k_s), dtype=bool)
        first[1:] = k_s[1:] != k_s[:-1]
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, len(k_s)))
        if (lens > self.max_bucket).any():
            if self.overflow == "error":
                # exact-recall callers (prefix-filtered n-gram Jaccard)
                # must never silently drop pairs
                raise RuntimeError(
                    f"candidate bucket of size {int(lens.max())} exceeds "
                    f"max_bucket={self.max_bucket}; a shingle this "
                    "common defeats the prefix filter — raise "
                    "max_bucket or pre-drop stopword shingles")
            # truncate to the FIRST max_bucket ids of the run (ascending)
            lens = np.minimum(lens, self.max_bucket)
        ia_all, ib_all = [], []
        for L in np.unique(lens):
            if L < 2:
                continue
            run_starts = starts[lens == L]
            ia, ib = np.triu_indices(int(L), k=1)
            ia_all.append((run_starts[:, None] + ia[None, :]).ravel())
            ib_all.append((run_starts[:, None] + ib[None, :]).ravel())
        if ia_all:
            ia = np.concatenate(ia_all)
            ib = np.concatenate(ib_all)
        else:
            ia = ib = np.array([], dtype=np.int64)
        sorted_ids = id_col.take(pa.array(order))
        cols = {"id_a": sorted_ids.take(pa.array(ia)),
                "id_b": sorted_ids.take(pa.array(ib))}
        for c in self.carry_cols:
            cc = group[c]
            if isinstance(cc, pa.ChunkedArray):
                cc = cc.combine_chunks()
            cs = cc.take(pa.array(order))
            cols[f"{c}_a"] = cs.take(pa.array(ia))
            cols[f"{c}_b"] = cs.take(pa.array(ib))
        t = pa.table(cols)
        if self.post_filter is not None:
            # verify INSIDE the kernel: clustered data can explode the
            # candidate set, so cheap vectorized filters must run before
            # anything is collected
            t = self.post_filter(t)
        return t


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
        "pgroup").map_groups(kernel.__call__, batch_format="pyarrow")


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
