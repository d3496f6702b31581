"""X11-style seasonal adjustment (additive), no external binary.

The reference shells out to the Census x13as Fortran binary for
X-11/SEATS (/root/reference/R/x11.R:19-84, R/x13arimaseats.R:33-74); a
Ray-native engine cannot, so this implements the published X-11 core
iteration (Shiskin, Young & Musgrave 1967; Ladiray & Quenneville 2001):

  1. initial trend: centered MA(period) (half-weight ends, even period)
  2. S1: 3x3 moving average over each phase's subseries, recentred
  3. improved trend: Henderson-13 filter of the deseasonalized series
  4. S2: 3x5 moving average over phase subseries, recentred
  5. remainder = y - trend - seasonal

Edges use truncated, re-normalized symmetric weights (a simplification
of the asymmetric Musgrave end-filters — documented deviation). Exposed
through stages.decompose.x11_decomposition.
"""

from __future__ import annotations

import numpy as np

# Henderson 13-term symmetric weights (standard published values)
_H13 = np.array([
    -0.01935, -0.02786, 0.0, 0.06549, 0.14736, 0.21434, 0.24006,
    0.21434, 0.14736, 0.06549, 0.0, -0.02786, -0.01935,
])
_H13 = _H13 / _H13.sum()


def _sym_filter(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Symmetric weighted MA with truncated re-normalized edges
    (vectorized convolution interior; Python only at the 2h edge points)."""
    n = len(x)
    h = len(w) // 2
    if n >= len(w):
        out = np.convolve(x, w[::-1], mode="same")  # symmetric w
    else:
        out = np.empty(n)  # every point is an edge; loop computes all
    for t in range(n):
        if h <= t < n - h:
            continue  # interior handled by the convolution
        lo, hi = max(0, t - h), min(n, t + h + 1)
        ww = w[h - (t - lo): h + (hi - t)]
        out[t] = float(np.dot(x[lo:hi], ww) / ww.sum())
    return out


def _centered_ma(x: np.ndarray, period: int) -> np.ndarray:
    if period % 2 == 0:
        w = np.concatenate([[0.5], np.ones(period - 1), [0.5]]) / period
    else:
        w = np.ones(period) / period
    return _sym_filter(x, w)


def _phase_ma(detr: np.ndarray, period: int, weights: np.ndarray) -> np.ndarray:
    """Apply a weighted MA along each phase subseries, recentre per cycle."""
    n = len(detr)
    seas = np.empty(n)
    for p in range(period):
        idx = np.arange(p, n, period)
        seas[idx] = _sym_filter(detr[idx], weights)
    # recentre: remove the period-window mean so seasonal sums to ~0
    centre = _centered_ma(seas, period)
    return seas - centre


_W33 = np.array([1.0, 2.0, 3.0, 2.0, 1.0]) / 9.0
_W35 = np.array([1.0, 2.0, 3.0, 3.0, 3.0, 2.0, 1.0]) / 15.0


def x11_additive(y: np.ndarray, period: int) -> dict[str, np.ndarray]:
    """Additive X11-style decomposition -> trend/seasonal/remainder."""
    y = np.asarray(y, dtype=np.float64)
    if np.isnan(y).any():
        raise ValueError("x11_additive requires a complete (gap-filled) series")
    if len(y) < 2 * period:
        raise ValueError("series shorter than two periods")
    t1 = _centered_ma(y, period)
    s1 = _phase_ma(y - t1, period, _W33)
    t2 = _sym_filter(y - s1, _H13)
    s2 = _phase_ma(y - t2, period, _W35)
    remainder = y - t2 - s2
    return {
        "trend": t2,
        "seasonal": s2,
        "remainder": remainder,
        "season_adjust": y - s2,
    }
