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
