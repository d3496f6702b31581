"""Decomposition stages: STL / classical over a keyed Dataset -> "dable".

Reference pipeline EP3 (/root/reference/R/stl.R:88-121 train_stl,
R/classical.R:13-53 train_classical): per-key component columns appended
to the input rows plus reconstruction aliases. Ray shape: ONE shuffle
(groupby key), map_groups kernel returns the group's rows + trend /
season_<p> / remainder / season_adjust columns.

The result wraps the Dataset in ``Decomposition`` exposing the dable
views (components / fitted / residuals / season_adjust — R/stl.R:125-140)
as column projections, plus ``generate`` for moving-block-bootstrap
simulation (R/stl.R:142-197) with per-key seeded RNG for determinism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.stl import classical_decompose, estimate_stl


def _time_sorted(group: pa.Table, time_col) -> pa.Table:
    if time_col is None:
        return group
    t = group[time_col].to_numpy(zero_copy_only=False)
    return group.take(pa.array(np.argsort(t, kind="mergesort")))


class _STLKernel:
    def __init__(self, value_col, key_cols, periods, time_col, iterations, stl_args):
        self.value_col = value_col
        self.key_cols = tuple(key_cols)
        self.periods = tuple(periods)
        self.time_col = time_col
        self.iterations = iterations
        self.stl_args = dict(stl_args or {})

    def __call__(self, group: pa.Table) -> pa.Table:
        group = _time_sorted(group, self.time_col)
        y = np.asarray(group[self.value_col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        # drop periods with fewer than two full cycles (R/stl.R:30)
        season_args = {
            str(p): {"period": p, **self.stl_args.get(p, {})}
            for p in self.periods
            if p > 1 and len(y) / p >= 2
        }
        dcmp = estimate_stl(y, season_args=season_args, iterations=self.iterations)
        for k, v in dcmp.items():
            group = group.append_column(
                k, pa.array(np.asarray(v, dtype=np.float64)))
        return group


class _ClassicalKernel:
    def __init__(self, value_col, key_cols, period, time_col, type_):
        self.value_col = value_col
        self.key_cols = tuple(key_cols)
        self.period = period
        self.time_col = time_col
        self.type_ = type_

    def __call__(self, group: pa.Table) -> pa.Table:
        group = _time_sorted(group, self.time_col)
        y = np.asarray(group[self.value_col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        dcmp = classical_decompose(y, self.period, self.type_)
        for k, v in dcmp.items():
            group = group.append_column(
                k, pa.array(np.asarray(v, dtype=np.float64)))
        return group


class Decomposition:
    """Dable-style views over the decomposition Dataset (S3 generics
    components/fitted/residuals re-expressed as projections)."""

    def __init__(self, ds: "ray.data.Dataset", value_col: str, method: str,
                 seasonal_cols: list[str]):
        self.dataset = ds
        self.value_col = value_col
        self.method = method
        self.seasonal_cols = seasonal_cols

    def components(self) -> "ray.data.Dataset":
        return self.dataset

    def fitted(self) -> "ray.data.Dataset":
        """fitted = y - remainder (R/stl.R:132-135)."""
        value_col = self.value_col

        def _f(b: pa.Table) -> pa.Table:
            return b.append_column(
                ".fitted", pc.subtract(b[value_col], b["remainder"]))

        return self.dataset.map_batches(_f, batch_format="pyarrow")

    def residuals(self) -> "ray.data.Dataset":
        def _f(b: pa.Table) -> pa.Table:
            return b.append_column(".resid", b["remainder"])

        return self.dataset.map_batches(_f, batch_format="pyarrow")


def stl_decomposition(
    ds: "ray.data.Dataset",
    value_col: str,
    key_cols: list[str],
    periods: list[int],
    time_col: str | None = None,
    iterations: int = 2,
    stl_args: dict | None = None,
    concurrency=(1, 8),
) -> Decomposition:
    out = ds.groupby(list(key_cols)).map_groups(
        _STLKernel,
        fn_constructor_args=(value_col, tuple(key_cols), tuple(periods), time_col,
                             iterations, stl_args),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return Decomposition(out, value_col, "STL", [f"season_{p}" for p in periods])


def classical_decomposition(
    ds: "ray.data.Dataset",
    value_col: str,
    key_cols: list[str],
    period: int,
    time_col: str | None = None,
    type_: str = "additive",
    concurrency=(1, 8),
) -> Decomposition:
    out = ds.groupby(list(key_cols)).map_groups(
        _ClassicalKernel,
        fn_constructor_args=(value_col, tuple(key_cols), period, time_col, type_),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return Decomposition(out, value_col, "Classical", ["seasonal"])


def generate_mbb(
    dcmp_ds: "ray.data.Dataset",
    value_col: str,
    key_cols: list[str],
    period: int,
    times: int = 1,
    time_col: str | None = None,
    seed: int = 0,
) -> "ray.data.Dataset":
    """Moving-block-bootstrap simulation from an STL decomposition
    (R/stl.R:142-197): bootstrap the remainder in blocks of 2*period,
    re-add trend + seasonal components. Deterministic per key: RNG seeded
    from the key hash (SURVEY.md §2.6)."""
    import zlib

    def _gen(group: pd.DataFrame) -> pd.DataFrame:
        if time_col is not None:
            group = group.sort_values(time_col, kind="mergesort")
        seas_cols = [c for c in group.columns if c.startswith("season_") and c != "season_adjust"]
        base = group["trend"].to_numpy(dtype=np.float64)
        for c in seas_cols:
            base = base + group[c].to_numpy(dtype=np.float64)
        rem = group["remainder"].to_numpy(dtype=np.float64)
        n = len(rem)
        block = min(max(2 * period, 1), n)
        key_bytes = "|".join(str(group[k].iloc[0]) for k in key_cols).encode()
        rng = np.random.default_rng(zlib.crc32(key_bytes) ^ seed)
        reps = []
        for rep in range(times):
            nblocks = int(np.ceil(n / block)) + 1
            starts = rng.integers(0, max(1, n - block + 1), size=nblocks)
            boot = np.concatenate([rem[s : s + block] for s in starts])[:n]
            out = group[list(key_cols)].copy()
            out[".rep"] = rep
            if time_col is not None:
                out[time_col] = group[time_col].to_numpy()
            out[".sim"] = base + boot
            reps.append(out)
        return pd.concat(reps, ignore_index=True)

    return dcmp_ds.groupby(list(key_cols)).map_groups(_gen, batch_format="pandas")


class _X11Kernel:
    def __init__(self, value_col, key_cols, period, time_col, type_="additive"):
        self.value_col = value_col
        self.key_cols = tuple(key_cols)
        self.period = period
        self.time_col = time_col
        self.type_ = type_

    def __call__(self, group: pa.Table) -> pa.Table:
        from ..functions.x11 import x11_decompose

        group = _time_sorted(group, self.time_col)
        y = np.asarray(group[self.value_col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        dcmp = x11_decompose(y, self.period, self.type_)
        for k, v in dcmp.items():
            group = group.append_column(
                k, pa.array(np.asarray(v, dtype=np.float64)))
        return group


def x11_decomposition(
    ds: "ray.data.Dataset",
    value_col: str,
    key_cols: list[str],
    period: int,
    time_col: str | None = None,
    type_: str = "additive",
) -> Decomposition:
    """X11-style seasonal adjustment, additive or multiplicative
    (Henderson trend with Musgrave end filters + 3x3/3x5 seasonal MAs
    with the published X-11 end weights; see functions/x11.py — the
    reference's X-11 surface is an external Census binary,
    R/x11.R:5-9,19-84, reimplemented from the published method as a
    documented deviation)."""
    kernel = _X11Kernel(value_col, tuple(key_cols), period, time_col, type_)
    out = ds.groupby(list(key_cols)).map_groups(kernel.__call__,
                                                batch_format="pyarrow")
    return Decomposition(out, value_col, "X11", ["seasonal"])
