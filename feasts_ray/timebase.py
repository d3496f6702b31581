"""Deterministic event-time derivation shared by synth, pipeline and oracle.

The input table (driver input_hint) carries no timestamp — each doc's
event-time is a pure function of (doc index, source), so the Ray pipeline,
the single-process oracle and the synthesizer all derive identical times
with zero coordination. Docs arrive DOCS_PER_SEC per second starting at T0;
each source blacks out one minute out of every (37 + source_idx) minutes
(docs that would land there shift forward one minute), which plants
per-source gaps at the 1m tier for the gap-fill stage to fill
(reference analogue: tsibble::fill_gaps gaps, R/dcmp_checks.R:1-5).
"""

from __future__ import annotations

import numpy as np

T0 = 1_700_000_000  # fixed epoch origin (2023-11-14T22:13:20Z)
DOCS_PER_SEC = 4

# Zipf-ish source mix; "web" is the hot key that exercises salting.
SOURCES = ("web", "books", "code", "wiki", "news", "forum", "papers", "misc")
_WEIGHTS = np.array([1.0 / (r + 1) for r in range(len(SOURCES))])
_CUM = np.cumsum(_WEIGHTS / _WEIGHTS.sum())
SOURCE_INDEX = {s: i for i, s in enumerate(SOURCES)}

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain PRNG mix)."""
    with np.errstate(over="ignore"):
        z = (np.asarray(x, dtype=np.uint64) + _SM_GAMMA)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def unit_uniform(x: np.ndarray) -> np.ndarray:
    """splitmix64 -> float64 uniform in [0, 1)."""
    return splitmix64(x).astype(np.float64) / 2.0**64


def source_index_for_doc(i: np.ndarray) -> np.ndarray:
    """Deterministic Zipf-ish source assignment from doc index."""
    u = unit_uniform(np.asarray(i, dtype=np.uint64) ^ np.uint64(0xA5A5A5A5A5A5A5A5))
    return np.searchsorted(_CUM, u, side="right").astype(np.int64)


def derive_ts_seconds(i: np.ndarray, source_idx: np.ndarray) -> np.ndarray:
    """Event time (epoch seconds) for doc index ``i`` of source ``source_idx``."""
    i = np.asarray(i, dtype=np.int64)
    base = T0 + i // DOCS_PER_SEC
    minute = base // 60
    period = 37 + np.asarray(source_idx, dtype=np.int64)
    blackout = (minute % period) == (np.asarray(source_idx, dtype=np.int64) % period)
    return base + np.where(blackout, 60, 0)


def doc_index_from_id(doc_id_num: np.ndarray) -> np.ndarray:
    """doc ids are 'doc-%08d'; callers slice the suffix and cast (Arrow side)."""
    return np.asarray(doc_id_num, dtype=np.int64)


def floor_bucket(ts_s: np.ndarray, unit_s: int) -> np.ndarray:
    """Numeric floor semantics of the reference (R/utils.R:134-139) with
    origin 0: (x // unit) * unit. ts are nonnegative epoch seconds."""
    ts_s = np.asarray(ts_s, dtype=np.int64)
    return (ts_s // unit_s) * unit_s
