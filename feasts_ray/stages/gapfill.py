"""Explicit gap-fill of missing buckets (built-in operator).

The reference pushes gap handling to the user (tsibble::fill_gaps before
any correlogram/decomposition, R/dcmp_checks.R:1-5); our engine makes it
a first-class distributed stage (north rule). Semantics: for every series
key, densify the bucket domain to [min_bucket, max_bucket] at the tier
unit; filled buckets get count=0, sum=0, null min/max/mean.

Distributed shape (no driver-side loops over data):
  1. per-key (min, max) via a tiny groupby AGG — result is O(#keys),
     safe to collect (8 sources here; at 100 TB still only #keys rows);
  2. dense (key, bucket) rows generated distributively from
     ray.data.range over the global bucket count (each task emits its
     slice of the dense domain — no giant driver list);
  3. union with the real aggregate rows and a merge groupby coalesces
     (sum of counts/sums; min/max ignore the dense rows' nulls).

The merge shuffle runs over tier-sized (already rolled-up) data, not raw.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Max, Min

from .rollup import merge_partials


def gap_fill(
    ds: "ray.data.Dataset",
    unit_s: int,
    key_col: str = "source",
) -> "ray.data.Dataset":
    """Densify (key, bucket) domain; ds must have count/sum/min/max columns."""
    spans = (
        ds.groupby(key_col)
        .aggregate(Min("bucket", alias_name="lo"), Max("bucket", alias_name="hi"))
        .to_pandas()
    )  # O(#keys) — tiny
    if len(spans) == 0:
        return ds
    spans = spans.sort_values(key_col, ignore_index=True)
    n_buckets = ((spans["hi"] - spans["lo"]) // unit_s + 1).to_numpy(dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(n_buckets)])
    total = int(offsets[-1])
    keys = spans[key_col].to_numpy()
    los = spans["lo"].to_numpy(dtype=np.int64)
    starts = offsets[:-1]

    sch = ds.schema()  # ray Schema wrapper: parallel .names / .types lists
    types = dict(zip(sch.names, sch.types))
    min_t, max_t = types["min"], types["max"]

    def _emit(batch: dict) -> pa.Table:
        ids = batch["id"].astype(np.int64)
        ki = np.searchsorted(starts, ids, side="right") - 1
        buckets = los[ki] + (ids - starts[ki]) * unit_s
        n = len(ids)
        return pa.table(
            {
                key_col: pa.array(keys[ki]),
                "bucket": pa.array(buckets, type=pa.int64()),
                "count": pa.array(np.zeros(n, dtype=np.int64)),
                "sum": pa.array(np.zeros(n, dtype=np.int64)),
                "min": pa.nulls(n, type=min_t),
                "max": pa.nulls(n, type=max_t),
            }
        )

    dense = ray.data.range(total).map_batches(
        _emit, batch_format="numpy", batch_size=65536
    )
    cols = [key_col, "bucket", "count", "sum", "min", "max"]
    merged = merge_partials(
        ds.select_columns(cols).union(dense.select_columns(cols)),
        key_cols=(key_col, "bucket"),
    )
    return merged
