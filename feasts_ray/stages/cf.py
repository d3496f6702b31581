"""Correlogram table operators: ACF / PACF / CCF over a keyed Dataset.

Reference pipeline EP2 (/root/reference/R/acf.R:224-250 build_cf):
gap check -> per-key series in time order -> stats::acf/pacf/ccf ->
long (key, lag, value) table + per-key num_obs. Ray shape: ONE shuffle
(groupby key) and a map_groups kernel emitting the per-key lag table;
num_obs is carried in the same pass (no second aggregation).

Semantics mirrored:
- default lag_max = floor(10*log10(n)) (ccf: n/2), capped at n-1
- na.contiguous default NA handling (longest non-NA run), like the
  reference's na.action default
- lag 0 dropped for correlation/covariance, kept out for partial
- type: correlation | covariance | partial
- tapered=True -> tacf/t-pacf (McMurry-Politis; O(n^2), modest series)
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.acf import (
    acf,
    acf_exact_int,
    ccf as ccf_kernel,
    pacf,
    pacf_from_acf,
    pacf_from_acf_seq,
    tacf,
)
from ..functions.stats_utils import na_contiguous


class _CFKernel:
    def __init__(self, mode, value_col, value2_col, key_cols, lag_max, kind, tapered, time_col):
        self.mode = mode
        self.value_col = value_col
        self.value2_col = value2_col
        self.key_cols = tuple(key_cols)
        self.lag_max = lag_max
        self.kind = kind
        self.tapered = tapered
        self.time_col = time_col

    @staticmethod
    def _series(group, col, order):
        """Column -> float64 numpy in time order (nulls -> NaN), no
        pandas conversion: Arrow float columns surface nulls as NaN via
        to_numpy(zero_copy_only=False)."""
        x = group[col].to_numpy(zero_copy_only=False)
        x = np.asarray(x, dtype=np.float64)
        return x if order is None else x[order]

    def _emit(self, group, lags, col, vals, num_obs):
        m = len(lags)
        zeros = pa.array(np.zeros(m, dtype=np.int64))
        out = {k: group[k].take(zeros) for k in self.key_cols}
        out["lag"] = pa.array(np.asarray(lags, dtype=np.int64))
        out[col] = pa.array(np.asarray(vals, dtype=np.float64))
        out["num_obs"] = pa.array(np.full(m, num_obs, dtype=np.int64))
        return pa.table(out)

    def __call__(self, group: pa.Table) -> pa.Table:
        order = None
        if self.time_col is not None:
            t = group[self.time_col].to_numpy(zero_copy_only=False)
            order = np.argsort(t, kind="mergesort")
        x = self._series(group, self.value_col, order)
        num_obs = len(x)
        if self.mode == "ccf":
            # na.contiguous over the BIVARIATE series (R ts.intersect + na.action)
            y2 = self._series(group, self.value2_col, order)
            ok = ~(np.isnan(x) | np.isnan(y2))
            if not ok.all():
                from ..functions.stats_utils import longest_contiguous_run

                lo, hi = longest_contiguous_run(ok)
                x, y2 = x[lo:hi], y2[lo:hi]
            lags, vals = ccf_kernel(x, y2, self.lag_max, kind=self.kind)
            return self._emit(group, lags, "ccf", vals, num_obs)
        x = na_contiguous(x)
        n = len(x)
        # integer-valued series + plain correlation: route through the
        # exact-power-sum kernels so the driver's SQL oracle is bit-exact.
        # Gate on the ACTUAL int64 accumulations, not just per-value
        # magnitude: dot products reach n*mx^2 and sums n*mx — a 2^52
        # per-value bound alone admits silent int64 wraparound.
        if n and np.isfinite(x).all() and (np.rint(x) == x).all():
            mx = float(np.abs(x).max())
            exact = (not self.tapered and self.kind == "correlation"
                     and mx < 2**52 and n * mx * mx < 2**62 and n * mx < 2**62)
        else:
            exact = False
        if self.mode == "pacf":
            lm = self.lag_max or max(1, min(int(math.floor(10 * math.log10(n))), n - 1))
            if self.tapered:
                acvf = tacf(x)
                vals = pacf_from_acf(acvf, min(lm, len(acvf) - 1))
            elif exact:
                lm = min(lm, n - 1)
                vals = pacf_from_acf_seq(acf_exact_int(x, lm), lm)
            else:
                vals = pacf(x, lag_max=lm)
            lags = np.arange(1, len(vals) + 1)
            col = "pacf"
        else:
            lm = self.lag_max or max(1, min(int(math.floor(10 * math.log10(n))), n - 1))
            if self.tapered:
                vals = tacf(x)[: lm + 1]
            elif exact:
                vals = acf_exact_int(x, min(lm, n - 1))
            else:
                vals = acf(x, lag_max=lm, kind=self.kind)
            vals = vals[1:]  # reference drops lag 0 (R/acf.R:78-80)
            lags = np.arange(1, len(vals) + 1)
            col = "acf"
        return self._emit(group, lags, col, vals, num_obs)


def _build_cf(ds, mode, value_col, key_cols, time_col, value2_col=None,
              lag_max=None, kind="correlation", tapered=False, concurrency=(1, 8)):
    return ds.groupby(list(key_cols)).map_groups(
        _CFKernel,
        fn_constructor_args=(mode, value_col, value2_col, tuple(key_cols),
                             lag_max, kind, tapered, time_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def ACF(ds: "ray.data.Dataset", value_col: str, key_cols: list[str],
        time_col: str | None = None, lag_max: int | None = None,
        kind: str = "correlation", tapered: bool = False) -> "ray.data.Dataset":
    """Per-key autocorrelation table: (key..., lag, acf, num_obs)."""
    if kind == "partial":
        return PACF(ds, value_col, key_cols, time_col, lag_max, tapered).rename_columns(
            {"pacf": "acf"}
        )
    return _build_cf(ds, "acf", value_col, key_cols, time_col,
                     lag_max=lag_max, kind=kind, tapered=tapered)


def PACF(ds: "ray.data.Dataset", value_col: str, key_cols: list[str],
         time_col: str | None = None, lag_max: int | None = None,
         tapered: bool = False) -> "ray.data.Dataset":
    return _build_cf(ds, "pacf", value_col, key_cols, time_col,
                     lag_max=lag_max, tapered=tapered)


def CCF(ds: "ray.data.Dataset", y_col: str, x_col: str, key_cols: list[str],
        time_col: str | None = None, lag_max: int | None = None,
        kind: str = "correlation") -> "ray.data.Dataset":
    """Per-key cross-correlation table at lags -k..k."""
    return _build_cf(ds, "ccf", y_col, key_cols, time_col, value2_col=x_col,
                     lag_max=lag_max, kind=kind)
