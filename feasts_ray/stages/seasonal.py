"""Seasonal-display data operators.

The reference re-exports gg_season / gg_subseries / gg_lag from the
external ggtime package (/root/reference/R/graphics.R:1-34 — a
deprecation shim, no implementation in-repo). A data-processing engine
supplies the DATA those displays consume:

- ``seasonal_subseries``: per (key, phase-within-period) aggregate of the
  measured value (the gg_subseries panel data) — distributed, one
  bounded groupby.
- ``lag_pairs``: per key, the (lag, y_t, y_{t-lag}) pair table
  (gg_lag scatter data) — one groupby(key) shuffle, vectorized shifts
  inside the kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.timeutils import PERIODS_S, phase_of


def seasonal_subseries(
    ds: "ray.data.Dataset",
    value_col: str,
    key_col: str,
    bucket_col: str = "bucket",
    interval_s: int = 3600,
    period: str = "day",
) -> "ray.data.Dataset":
    """(key, phase, n, mean_value): per-phase profile of a rolled series.

    Sums are computed on exact value representations when the column is
    integral; mean = sum/n derived after the merge."""

    def _partial(batch: pa.Table) -> pa.Table:
        phase = phase_of(batch[bucket_col].to_numpy(zero_copy_only=False),
                         interval_s, period)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        df = pd.DataFrame({key_col: batch[key_col].to_numpy(zero_copy_only=False),
                           "phase": phase, "v": v})
        df = df[~np.isnan(df["v"])]
        g = df.groupby([key_col, "phase"], sort=False, observed=True)["v"]
        out = g.agg(n="count", v_sum="sum", v_min="min", v_max="max").reset_index()
        return pa.Table.from_pandas(out, preserve_index=False
                                    ).replace_schema_metadata(None)

    merged = ds.map_batches(_partial, batch_format="pyarrow").groupby(
        [key_col, "phase"]).aggregate(
        Sum("n", alias_name="n"), Sum("v_sum", alias_name="v_sum"),
        Min("v_min", alias_name="v_min"), Max("v_max", alias_name="v_max"),
    )

    def _derive(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = batch["v_sum"].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s / n
        return pa.table({
            key_col: batch[key_col],
            "phase": batch["phase"].cast(pa.int64()),
            "n": batch["n"].cast(pa.int64()),
            "mean_value": pa.array(mean, type=pa.float64()),
            "min_value": batch["v_min"],
            "max_value": batch["v_max"],
        })

    return merged.map_batches(_derive, batch_format="pyarrow")


class _LagPairKernel:
    def __init__(self, value_col, key_col, time_col, lags):
        self.value_col = value_col
        self.key_col = key_col
        self.time_col = time_col
        self.lags = tuple(lags)

    def __call__(self, group: pa.Table) -> pa.Table:
        t = group[self.time_col].to_numpy(zero_copy_only=False)
        order = np.argsort(t, kind="mergesort")
        t = t[order]
        y = np.asarray(group[self.value_col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)[order]
        n = len(y)
        ttype = group.schema.field(self.time_col).type
        ts, ys, yl, lg = [], [], [], []
        for k in self.lags:
            if k >= n:
                continue
            ts.append(t[k:])
            ys.append(y[k:])
            yl.append(y[:-k])
            lg.append(np.full(n - k, k, dtype=np.int64))
        m = sum(len(a) for a in ts)
        return pa.table({
            self.key_col: group[self.key_col].take(
                pa.array(np.zeros(m, dtype=np.int64))),
            "lag": pa.array(np.concatenate(lg) if lg
                            else np.empty(0, dtype=np.int64)),
            self.time_col: pa.array(
                np.concatenate(ts) if ts else [], type=ttype),
            "y": pa.array(np.concatenate(ys) if ys
                          else np.empty(0, dtype=np.float64)),
            "y_lagged": pa.array(np.concatenate(yl) if yl
                                 else np.empty(0, dtype=np.float64)),
        })


def lag_pairs(
    ds: "ray.data.Dataset",
    value_col: str,
    key_col: str,
    time_col: str = "bucket",
    lags=(1, 2, 3, 4, 5, 6, 7, 8, 9),
) -> "ray.data.Dataset":
    """Long (key, lag, t, y, y_lagged) table for lag scatter displays."""
    kernel = _LagPairKernel(value_col, key_col, time_col, lags)
    return ds.groupby(key_col).map_groups(kernel.__call__,
                                          batch_format="pyarrow")


def seasonal_overlay(
    ds: "ray.data.Dataset",
    value_col: str,
    key_col: str,
    bucket_col: str = "bucket",
    interval_s: int = 3600,
    period: str = "day",
) -> "ray.data.Dataset":
    """gg_season overlay data: one line per (key, cycle) over the phase
    axis — (key, cycle, phase, value). Pure projection (zero shuffle):
    cycle = period window index, phase = observation index within it."""
    from ..functions.timeutils import _MONDAY_SHIFT_S

    span = PERIODS_S[period]
    shift = _MONDAY_SHIFT_S if period == "week" else 0

    def _project(batch: pa.Table) -> pa.Table:
        b = batch[bucket_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            key_col: batch[key_col],
            "cycle": pa.array((b + shift) // span, type=pa.int64()),
            "phase": pa.array(phase_of(b, interval_s, period), type=pa.int64()),
            "value": batch[value_col].cast(pa.float64()),
        })

    return ds.map_batches(_project, batch_format="pyarrow")
