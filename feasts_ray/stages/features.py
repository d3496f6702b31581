"""Distributed feature extraction — the engine's `features()` analogue.

Two dataflow shapes (SURVEY.md §3 EP1):

- ``extract_features``: long keyed table -> groupby(key).map_groups with
  ALL selected feature kernels fused into one pass per series (one output
  row per key, one float64 column per feature). The groupby is the only
  shuffle; within-group time sort happens in the kernel (cheap) instead of
  a global sort.
- ``extract_features_tokens``: the token-table shape where one row already
  holds a whole series (tokens:list<int32>) -> a ZERO-shuffle map_batches
  pass; rows are the parallel unit.

The kernel is a callable class (actor pool): feature-set resolution and
any setup happen once per actor, not once per batch.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.registry import FEATURES, feature_set


def _fused_row(x: np.ndarray, period: int, specs) -> dict[str, float]:
    out: dict[str, float] = {}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for spec in specs:
            try:
                out.update(spec.fn(x, period))
            except (ValueError, np.linalg.LinAlgError):
                pass  # feature undefined for this series shape -> absent/NaN
    return out


def _probe_columns(specs, period: int) -> list[str]:
    """Full output column set, learned from a well-behaved probe series so
    groups where a feature raises still emit the same (NaN-filled) schema
    — map_groups blocks must agree across groups."""
    n = max(4 * max(period, 1), 64)
    t = np.arange(n, dtype=np.float64)
    probe = (np.sin(2 * np.pi * t / max(period, 2)) + 0.01 * t
             + np.cos(0.7 * t))  # seasonal + trend + aperiodic, no NaN
    return list(_fused_row(probe, period, specs).keys())


class SeriesFeatureKernel:
    """map_groups kernel: one keyed series -> one feature row."""

    def __init__(
        self,
        value_col: str,
        key_cols: tuple[str, ...],
        period: int,
        names: list[str] | None = None,
        tags: list[str] | None = None,
        time_col: str | None = None,
    ):
        self.value_col = value_col
        self.key_cols = tuple(key_cols)
        self.period = period
        self.specs = feature_set(tags=tags, names=names)
        self.time_col = time_col
        self.columns = _probe_columns(self.specs, period)

    def __call__(self, group: pa.Table) -> pa.Table:
        x = np.asarray(group[self.value_col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        if self.time_col is not None:
            t = group[self.time_col].to_numpy(zero_copy_only=False)
            x = x[np.argsort(t, kind="mergesort")]
        row = _fused_row(x, self.period, self.specs)
        out = {k: group[k].slice(0, 1) for k in self.key_cols}
        out.update({k: pa.array([row.get(k, np.nan)], type=pa.float64())
                    for k in self.columns})
        return pa.table(out)


def extract_features(
    ds: "ray.data.Dataset",
    value_col: str,
    key_cols: list[str],
    period: int = 1,
    names: list[str] | None = None,
    tags: list[str] | None = None,
    time_col: str | None = None,
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    return ds.groupby(list(key_cols)).map_groups(
        SeriesFeatureKernel,
        fn_constructor_args=(value_col, tuple(key_cols), period, names, tags, time_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


class TokenFeatureKernel:
    """map_batches kernel over a list<int32> series column: one feature row
    per input row, zero shuffle. Stateful setup (feature-set resolution)
    in __init__ — runs once per actor.

    FLEXIBILITY path: runs arbitrary registry kernels per doc in Python
    (~100x the cost of the padded-matrix kernel). For the full-corpus
    default feature set use stages.token_features.token_feature_table —
    the batch-vectorized kernel with batch-shape-independent reduction
    trees; this class is for ad-hoc registry subsets."""

    def __init__(self, tokens_col: str, id_cols: tuple[str, ...], period: int,
                 names: list[str] | None = None, tags: list[str] | None = None):
        self.tokens_col = tokens_col
        self.id_cols = tuple(id_cols)
        self.period = period
        self.specs = feature_set(tags=tags, names=names)
        self.columns = _probe_columns(self.specs, period)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = batch[self.tokens_col]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        flat = toks.values.to_numpy(zero_copy_only=False).astype(np.float64)
        rows = []
        for i in range(len(batch)):
            x = flat[offsets[i] : offsets[i + 1]]
            r = _fused_row(x, self.period, self.specs)
            rows.append({k: r.get(k, np.nan) for k in self.columns})
        out = pd.DataFrame(rows)
        res = {c: batch[c] for c in self.id_cols}
        tbl = pa.table(res)
        for c in out.columns:
            tbl = tbl.append_column(c, pa.array(out[c], from_pandas=True))
        return tbl


def extract_features_tokens(
    ds: "ray.data.Dataset",
    tokens_col: str = "tokens",
    id_cols: list[str] = ("doc_id", "source"),
    period: int = 60,
    names: list[str] | None = None,
    tags: list[str] | None = None,
    batch_size: int = 256,
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    return ds.map_batches(
        TokenFeatureKernel,
        fn_constructor_args=(tokens_col, tuple(id_cols), period, names, tags),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
