"""Gap-based session windows (sessionization) over keyed event streams.

The classic training-data / clickstream operator: per key, events
sorted by time are split into sessions wherever the gap to the previous
event exceeds ``gap``; each session aggregates to one row. SQL mirror:
LAG + CASE + running SUM + GROUP BY (see __ray_entry__.oracle_sql
["sessionize"]) — the kernel is integer-exact so the driver compare is
bit-exact.

Physical plan: ONE groupby(key) shuffle; inside ``map_groups`` the
whole computation is vectorized (np.diff for breaks, cumsum for session
ids, np.add.reduceat over session starts for the aggregates — no
per-session loop). Partitioning assumption: one key's events fit in a
group (true for user-keyed streams; a pathological single-key stream
would be pre-split at guaranteed-gap boundaries found by a cheap
per-batch min/max pass, which preserves session identity exactly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


class _SessionKernel:
    def __init__(self, key_col: str, time_col: str, gap: int,
                 sum_col: str | None):
        self.key_col = key_col
        self.time_col = time_col
        self.gap = gap
        self.sum_col = sum_col

    def __call__(self, group: pa.Table) -> pa.Table:
        t = np.asarray(group[self.time_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        order = np.argsort(t, kind="mergesort")
        t = t[order]
        brk = np.empty(len(t), dtype=np.int64)
        brk[0] = 0
        brk[1:] = (np.diff(t) > self.gap).astype(np.int64)
        sid = np.cumsum(brk)
        starts = np.flatnonzero(np.concatenate(([1], brk[1:])))
        ends = np.concatenate((starts[1:], [len(t)])) - 1
        m = len(starts)
        out = {
            self.key_col: group[self.key_col].take(
                pa.array(np.zeros(m, dtype=np.int64))),
            "session_id": pa.array(sid[starts]),
            "session_start": pa.array(t[starts]),
            "session_end": pa.array(t[ends]),
            "n_events": pa.array(
                np.diff(np.concatenate((starts, [len(t)])))),
        }
        if self.sum_col is not None:
            v = np.asarray(group[self.sum_col]
                           .to_numpy(zero_copy_only=False),
                           dtype=np.int64)[order]
            out["sum_" + self.sum_col] = pa.array(np.add.reduceat(v, starts))
        return pa.table(out)


def sessionize(
    ds: "ray.data.Dataset",
    *,
    key_col: str,
    time_col: str,
    gap: int,
    sum_col: str | None = None,
) -> "ray.data.Dataset":
    """One session row per (key, maximal run of events with inter-event
    gap <= ``gap``): session_id (0-based per key in time order),
    session_start/end (same units as ``time_col``), n_events, and
    optionally sum_<sum_col> (integer-exact)."""
    kernel = _SessionKernel(key_col, time_col, gap, sum_col)
    return ds.groupby(key_col).map_groups(kernel.__call__,
                                          batch_format="pyarrow")
