"""Scalar/vector time-and-series utilities (reference §2.3 surface).

Semantics mirrored from /root/reference/R/utils.R:
- lag(x, n): shift with NA head-padding (R/utils.R:13-20)
- within_bounds(x, lo, hi): inclusive bounds filter (R/utils.R:202-207)
- floor_time: numeric flooring ``(x - origin) %/% unit * unit + origin``
  (R/utils.R:134-139) — vectorized; the bucketize stage uses the same rule
- interval_to_period / round_period: interval -> seasonal period counts
  (R/utils.R:90-120) for second-resolution intervals
- phase_of / time_offset_origin: position of a bucket within a seasonal
  period relative to the canonical origin (R/utils.R:176-200; the
  reference's origin is 1973-01-03 Monday-start — ours is the epoch,
  which is also a Thursday; week phases use an explicit Monday shift)
"""

from __future__ import annotations

import numpy as np

# canonical period ladder in seconds
PERIODS_S = {
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}
# epoch (1970-01-01) is a Thursday; Monday-start weeks shift by 3 days
# (mirrors the reference pinning its origin to a Monday, R/utils.R:178)
_MONDAY_SHIFT_S = 3 * 86400


def lag(x: np.ndarray, n: int = 1) -> np.ndarray:
    """Shift forward by n, NaN-padding the head (negative n = lead)."""
    x = np.asarray(x, dtype=np.float64)
    out = np.full_like(x, np.nan)
    if n >= 0:
        if n < len(x):
            out[n:] = x[: len(x) - n]
    else:
        if -n < len(x):
            out[:n] = x[-n:]
    return out


def within_bounds(x: np.ndarray, lower: float = -np.inf, upper: float = np.inf) -> np.ndarray:
    """Values inside [lower, upper]; NaNs dropped (filter, not mask)."""
    x = np.asarray(x, dtype=np.float64)
    keep = (x >= lower) & (x <= upper)
    return x[keep]


def floor_time(ts: np.ndarray, unit_s: int, origin_s: int = 0) -> np.ndarray:
    """(ts - origin) // unit * unit + origin (R numeric flooring)."""
    ts = np.asarray(ts, dtype=np.int64)
    return (ts - origin_s) // unit_s * unit_s + origin_s


def round_period(value: float, unit: str) -> tuple[float, str]:
    """Normalize carry: (60, 'second') -> (1, 'minute'), (24, 'hour') ->
    (1, 'day'), etc. (R/utils.R:98-120)."""
    ladder = [("second", 60, "minute"), ("minute", 60, "hour"),
              ("hour", 24, "day"), ("day", 7, "week")]
    for small, factor, big in ladder:
        if unit == small and value % factor == 0:
            return round_period(value / factor, big)
    return value, unit


def interval_to_period(interval_s: int) -> dict[str, float]:
    """Seasonal period counts implied by a regular interval: how many
    observations per minute/hour/day/week (only periods > 1 retained and
    with at least one full cycle representable), cf. get_frequencies."""
    out = {}
    for name, span in PERIODS_S.items():
        p = span / interval_s
        if p > 1:
            out[name] = p
    return out


def phase_of(buckets: np.ndarray, interval_s: int, period: str = "day") -> np.ndarray:
    """Position (0-based observation index) of each bucket within its
    seasonal period — the subseries assignment used by seasonal plots and
    per-phase means."""
    b = np.asarray(buckets, dtype=np.int64)
    span = PERIODS_S[period]
    shift = _MONDAY_SHIFT_S if period == "week" else 0
    return ((b + shift) % span) // interval_s


def time_offset_origin(buckets: np.ndarray, period: str = "day") -> np.ndarray:
    """Seconds since the start of each bucket's period window."""
    b = np.asarray(buckets, dtype=np.int64)
    span = PERIODS_S[period]
    shift = _MONDAY_SHIFT_S if period == "week" else 0
    return (b + shift) % span
