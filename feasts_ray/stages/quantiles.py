"""Exact per-key quantiles (discrete / type-1): one groupby(key)
shuffle, sort inside the group, pick sorted[ceil(q*n) - 1] — the same
definition DuckDB's quantile_disc uses, so integer inputs compare
bit-exactly against the SQL oracle.

Scale note: exact quantiles need the key's values co-located (the sort
is per group, never global). For a single key too big for one worker,
the two-pass histogram refinement (count buckets, then scan the one
bucket containing the rank) keeps it exact with O(buckets) memory; the
per-key group path here covers the keyed-series shape this engine
rolls up (thousands of values per key at any corpus size, since tiers
bound the per-key point count).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


class _QuantileKernel:
    def __init__(self, value_col, key_col, qs):
        self.value_col = value_col
        self.key_col = key_col
        self.qs = tuple(qs)

    def __call__(self, group: pa.Table) -> pa.Table:
        v = np.sort(group[self.value_col].to_numpy(zero_copy_only=False))
        n = len(v)
        out = {self.key_col: group[self.key_col].slice(0, 1),
               "n_vals": pa.array([n], type=pa.int64())}
        vtype = group.schema.field(self.value_col).type
        for q in self.qs:
            # 1-based rank ceil(q*n), computed in float64 exactly like
            # DuckDB quantile_disc so boundary ranks agree
            idx = max(int(np.ceil(q * n)) - 1, 0)
            out[f"p{round(q * 1000):03d}"] = pa.array(v[idx : idx + 1],
                                                      type=vtype)
        return pa.table(out)


def group_quantiles(
    ds: "ray.data.Dataset",
    value_col: str,
    key_col: str,
    qs=(0.5, 0.9, 0.99),
) -> "ray.data.Dataset":
    """One row per key: n_vals plus p<q*1000> discrete quantiles of
    ``value_col`` (p500 = median). Integer dtype passes through."""
    kernel = _QuantileKernel(value_col, key_col, qs)
    return ds.groupby(key_col).map_groups(kernel.__call__,
                                          batch_format="pyarrow")


def group_quantiles_hist(
    ds: "ray.data.Dataset",
    value_col: str,
    key_col: str,
    qs=(0.5, 0.9, 0.99),
) -> "ray.data.Dataset":
    """The corpus-scale exact-quantile path (the histogram refinement
    the module docstring promises): per-batch (key, value) COUNT
    partials mean the shuffle moves DISTINCT pairs — bounded for
    integer/discretized metrics — never rows, and the per-key kernel
    touches O(#distinct values), so a stratum with billions of rows
    still fits one task. Same discrete-quantile definition; pinned
    identical to ``group_quantiles`` in tests/test_windowed.py."""

    def _partial(batch: pa.Table) -> pa.Table:
        t = pa.table({key_col: batch[key_col],
                      value_col: batch[value_col]})
        g = t.group_by([key_col, value_col]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, value_col, "partial"])

    qs = tuple(qs)

    def _per_key(group: pa.Table) -> pa.Table:
        v = group[value_col].to_numpy(zero_copy_only=False)
        if len(v) == 0:
            cols = {key_col: group[key_col],
                    "n_vals": pa.array([], type=pa.int64())}
            for q in qs:
                cols[f"p{round(q * 1000):03d}"] = group[value_col]
            return pa.table(cols)
        c = group["partial"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(v, kind="stable")
        v_s, c_s = v[order], c[order]
        bnd = np.flatnonzero(np.concatenate([[True], v_s[1:] != v_s[:-1]]))
        vals = v_s[bnd]
        cum = np.cumsum(np.add.reduceat(c_s, bnd))
        n = int(cum[-1])
        vtype = group.schema.field(value_col).type
        out = {key_col: group[key_col].slice(0, 1),
               "n_vals": pa.array([n], type=pa.int64())}
        for q in qs:
            # identical rank arithmetic to _QuantileKernel
            rank = max(int(np.ceil(q * n)), 1)
            idx = int(np.searchsorted(cum, rank, side="left"))
            out[f"p{round(q * 1000):03d}"] = pa.array(
                vals[idx: idx + 1], type=vtype)
        return pa.table(out)

    return ds.map_batches(_partial, batch_format="pyarrow").groupby(
        key_col).map_groups(_per_key, batch_format="pyarrow")
