"""Distributed as-of join: latest right-side row at-or-before each left
row's time, per key (inner semantics, ties match via >=).

Ray Data has no native as-of join, and the reference's R surface gets it
for free from single-process data frames; here it is a first-class
distributed operator with two physical plans picked by right-side size:

- ``asof_join_broadcast`` — the right side is an aggregate / dimension
  table (e.g. a retention-tier rollup: one row per (key, bucket)) that
  is tiny relative to the left. The driver ``ray.put``s one
  ``{key -> (sorted_times, payload columns)}`` index; an elastic task
  pool resolves it once per worker PROCESS (state/broadcast.py LRU) and
  answers each left batch with ``np.searchsorted`` — ZERO shuffle of
  the big side. This is the scale-correct plan for fact->dim
  enrichment at 100 TB: the only data movement is the pruned left scan.

- ``asof_join_grouped`` — both sides large. Tag + union + ONE
  ``groupby(key).map_groups`` sorted merge (the same bounded-group
  shuffle shape as every tier kernel). Partitioning assumption: one
  key's rows fit in a group; a key that outgrows a worker would be
  salted by time range with right-side boundary replication (the last
  right row before each range boundary is duplicated into the next
  range), which preserves as-of semantics exactly.

The interval (range) join gets the same two plans:
``interval_join_broadcast`` for a small window table (anomaly spans,
holdout ranges) and ``interval_join_grouped`` for a corpus-scale one
(per-key maintenance windows) — both pinned identical in
tests/test_joins.py, like the as-of pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..state.broadcast import put_once, resolve_broadcast


def _build_index(right: pd.DataFrame, key_col: str, time_col: str,
                 payload: dict[str, str],
                 end_col: str | None = None) -> tuple[dict, dict]:
    """Broadcast lookup index shared by the as-of and interval plans:
    ({key -> (sorted times, ends-or-None, {out_col: values in time
    order})}, {out_col -> numpy dtype}).

    ``end_col`` None = as-of (right times must be UNIQUE per key — the
    semantics are ambiguous otherwise, and uniqueness is what makes the
    broadcast and grouped plans trivially identical); set = half-open
    intervals (must be non-overlapping per key)."""
    idx: dict = {}
    for key, g in right.groupby(key_col, sort=False):
        t = g[time_col].to_numpy(dtype=np.int64)
        order = np.argsort(t, kind="mergesort")
        t = t[order]
        if end_col is None:
            ends = None
            if np.any(np.diff(t) == 0):
                raise ValueError(
                    f"duplicate right-side times for key {key!r}; as-of "
                    "join requires unique (key, time) on the right")
        else:
            ends = g[end_col].to_numpy(dtype=np.int64)[order]
            if np.any(ends[:-1] > t[1:]):
                raise ValueError(f"overlapping intervals for key {key!r}")
        cols = {out: g[src].to_numpy()[order] for src, out in payload.items()}
        idx[key] = (t, ends, cols)
    dtypes = {out: np.asarray(right[src].to_numpy()).dtype
              for src, out in payload.items()}
    return idx, dtypes


def _lookup_batch(batch: pa.Table, *, index_ref, key_col: str,
                  time_col: str, out_cols: tuple[str, ...]) -> pa.Table:
    """Shared broadcast kernel: one searchsorted per DISTINCT key in the
    batch (keys are few: sources / event types), each fully vectorized
    over its rows. A hit is the latest right time <= t (as-of), plus
    t < end when the index carries interval ends."""
    index, dtypes = resolve_broadcast(index_ref)
    keys = batch[key_col].to_numpy(zero_copy_only=False)
    ts = batch[time_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ts)
    valid = np.zeros(n, dtype=bool)
    out_arrays: dict[str, np.ndarray] = {}
    for key in pd.unique(keys):
        entry = index.get(key)
        if entry is None:
            continue
        t_right, ends, cols = entry
        mask = keys == key
        p = np.searchsorted(t_right, ts[mask], side="right") - 1
        safe = np.maximum(p, 0)
        hit = p >= 0
        if ends is not None:
            hit &= ts[mask] < ends[safe]
        valid[mask] = hit
        for out, vals in cols.items():
            dst = out_arrays.setdefault(
                out, np.zeros(n, dtype=np.asarray(vals).dtype))
            dst[mask] = vals[safe]
    cols_out = {name: batch[name].filter(pa.array(valid))
                for name in batch.column_names}
    for out in out_cols:
        vals = out_arrays.get(out)
        if vals is None:  # no key of this batch had an index entry:
            # typed empty column so block schemas agree across batches
            cols_out[out] = pa.array(np.zeros(0, dtype=dtypes[out]))
        else:
            cols_out[out] = pa.array(vals[valid])
    return pa.table(cols_out)


def asof_join_broadcast(
    left: "ray.data.Dataset",
    right: pd.DataFrame,
    *,
    key_col: str,
    left_time_col: str,
    right_time_col: str,
    payload: dict[str, str],
) -> "ray.data.Dataset":
    """As-of join a big left Dataset to a small in-memory right table.

    ``payload`` maps right-side source columns to output column names
    (the right time column may itself be in payload, e.g.
    ``{"bucket": "asof_bucket", "count": "asof_count"}``). Left rows
    with no right row at-or-before their time are dropped (inner).
    """
    ref = put_once(_build_index(right, key_col, right_time_col, payload))
    return left.map_batches(
        _lookup_batch, batch_format="pyarrow",
        fn_kwargs={"index_ref": ref, "key_col": key_col,
                   "time_col": left_time_col,
                   "out_cols": tuple(payload.values())},
    )


def interval_join_broadcast(
    left: "ray.data.Dataset",
    intervals: pd.DataFrame,
    *,
    key_col: str,
    time_col: str,
    start_col: str,
    end_col: str,
    payload: dict[str, str] | None = None,
) -> "ray.data.Dataset":
    """Range (interval) join: keep left rows whose time falls in one of
    the key's half-open ``[start, end)`` intervals, attaching
    ``win_start`` / ``win_end`` (+ optional payload columns).

    Same physical plan as :func:`asof_join_broadcast` — the interval
    table (e.g. anomaly windows, quarantine ranges, eval holdout spans)
    is tiny relative to the fact table, so it broadcasts once and the
    scan streams with ZERO shuffle; membership is one searchsorted per
    distinct key per batch. Intervals must be non-overlapping per key
    (validated here) — overlapping inputs would need an interval tree
    or a flatten-first normalization pass.
    """
    # the window bounds ride the shared kernel as ordinary payload
    # columns (win_start = the sorted interval starts themselves)
    full_payload = {start_col: "win_start", end_col: "win_end",
                    **(payload or {})}
    ref = put_once(_build_index(intervals, key_col, start_col,
                                full_payload, end_col=end_col))
    return left.map_batches(
        _lookup_batch, batch_format="pyarrow",
        fn_kwargs={"index_ref": ref, "key_col": key_col,
                   "time_col": time_col,
                   "out_cols": tuple(full_payload.values())},
    )


class _GroupedAsofKernel:
    """Arrow-format kernel: pyarrow blocks keep each column's real type
    through the null-padded union (a pandas group would coerce
    right-only int64 columns to float64 via the left rows' nulls and
    silently lose precision past 2^53 — e.g. microsecond timestamps).

    ``end_col`` None = as-of semantics (latest right time <= t; right
    times must be unique per key); set = half-open interval semantics
    (keep left rows with start <= t < end; intervals must be
    non-overlapping per key) — the same dual contract as
    :func:`_build_index` on the broadcast plans."""

    def __init__(self, key_col, left_time_col, right_time_col,
                 payload, left_cols, end_col=None):
        self.key_col = key_col
        self.lt = left_time_col
        self.rt = right_time_col
        self.payload = payload
        self.left_cols = left_cols
        self.end_col = end_col

    def __call__(self, group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_left = pc.equal(group["__side"], 1)
        left = group.filter(is_left)
        right = group.filter(pc.invert(is_left))
        t_right = right[self.rt].to_numpy(zero_copy_only=False).astype(
            np.int64)
        order = np.argsort(t_right, kind="mergesort")
        t_sorted = t_right[order]
        if self.end_col is None:
            ends = None
            if np.any(np.diff(t_sorted) == 0):
                raise ValueError(
                    "duplicate right-side times in as-of group; as-of "
                    "join requires unique (key, time) on the right")
        else:
            ends = right[self.end_col].to_numpy(
                zero_copy_only=False).astype(np.int64)[order]
            if np.any(ends[:-1] > t_sorted[1:]):
                key = group[self.key_col][0]
                raise ValueError(f"overlapping intervals for key {key!r}")
        ts = left[self.lt].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(t_sorted, ts, side="right") - 1
        valid = pos >= 0
        if ends is not None and len(ends):
            valid &= ts < ends[np.maximum(pos, 0)]
        vmask = pa.array(valid)
        # right-row original indices of each match; .take preserves the
        # exact arrow type of every payload column
        take = pa.array(order[pos[valid]], type=pa.int64())
        out = {c: left[c].filter(vmask) for c in self.left_cols}
        for src, name in self.payload.items():
            out[name] = right[src].take(take)
        return pa.table(out)


def _tag_pad_union(left, right, key_col, r_cols):
    """Shared physical plan prefix of the grouped joins: tag each side,
    null-pad to a common schema (preserving every column's REAL Arrow
    type), union into one Dataset ready for the groupby(key) shuffle."""
    left_cols = [c for c in left.schema().names]

    def _tag(side: int):
        def _f(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__side", pa.array(np.full(batch.num_rows, side, np.int8)))
        return _f

    # align schemas: union needs identical columns on both sides
    right = right.select_columns(sorted(r_cols)).map_batches(
        _tag(0), batch_format="pyarrow")
    left = left.select_columns(left_cols).map_batches(
        _tag(1), batch_format="pyarrow")

    def _pad(types: dict):
        def _f(batch: pa.Table) -> pa.Table:
            for c, typ in types.items():
                if c not in batch.column_names:
                    # pad with the column's REAL type from the side that
                    # has it, so the union's schemas unify for any dtype
                    batch = batch.append_column(
                        c, pa.nulls(batch.num_rows, type=typ))
            return batch.select(sorted(batch.column_names))
        return _f

    types = {f.name: f.type for f in left.schema().base_schema}
    for f in right.schema().base_schema:
        types.setdefault(f.name, f.type)
    types["__side"] = pa.int8()
    left = left.map_batches(_pad(types), batch_format="pyarrow")
    right = right.map_batches(_pad(types), batch_format="pyarrow")
    return left.union(right), left_cols


def asof_join_grouped(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    key_col: str,
    left_time_col: str,
    right_time_col: str,
    payload: dict[str, str],
) -> "ray.data.Dataset":
    """As-of join two big Datasets: tag + union + one groupby(key)
    shuffle, sorted merge inside ``map_groups``. Same output as
    :func:`asof_join_broadcast` (pinned in tests)."""
    both, left_cols = _tag_pad_union(
        left, right, key_col, {key_col, right_time_col, *payload})
    kernel = _GroupedAsofKernel(key_col, left_time_col, right_time_col,
                                payload, left_cols)
    return both.groupby(key_col).map_groups(kernel.__call__,
                                            batch_format="pyarrow")


def interval_join_grouped(
    left: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    *,
    key_col: str,
    time_col: str,
    start_col: str,
    end_col: str,
    payload: dict[str, str] | None = None,
) -> "ray.data.Dataset":
    """Interval join two big Datasets — the shuffle plan for when the
    interval side is itself corpus-scale (per-key maintenance windows,
    billions of rows) and a broadcast index would blow the driver
    budget. Tag + union + ONE groupby(key) shuffle; the group kernel
    sorts the key's intervals once and answers every left row with a
    single searchsorted + half-open end check. Same output as
    :func:`interval_join_broadcast` (pinned in tests/test_joins.py).

    Partitioning assumption (same as every grouped kernel here): one
    key's rows fit in a group. A key that outgrows a worker would be
    salted by time range with interval replication across range
    boundaries (an interval spanning a boundary lands in both ranges),
    which preserves containment semantics exactly."""
    full_payload = {start_col: "win_start", end_col: "win_end",
                    **(payload or {})}
    both, left_cols = _tag_pad_union(
        left, intervals, key_col,
        {key_col, start_col, end_col, *full_payload})
    kernel = _GroupedAsofKernel(key_col, time_col, start_col,
                                full_payload, left_cols, end_col=end_col)
    return both.groupby(key_col).map_groups(kernel.__call__,
                                            batch_format="pyarrow")
