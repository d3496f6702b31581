"""Seasonal-trend decomposition kernels.

- ``stl_decompose``: STL per R. B. Cleveland, W. S. Cleveland, J.E. McRae
  & I. Terpenning (1990), "STL: A Seasonal-Trend Decomposition Procedure
  Based on Loess", J. Official Statistics 6, 3-73 — the same published
  algorithm R's ``stats::stl`` implements (cycle-subseries loess with
  one-period extension, 3x moving-average + loess low-pass, trend loess,
  optional bisquare robustness weights, jump-interpolated loess).
  Reimplemented from the paper; behavioral parity with the reference's
  usage at /root/reference/R/stl.R:50-86.
- ``supsmu``: Friedman (1984) SuperSmoother (variable-span CV smoother),
  the reference's non-seasonal trend fallback (R/stl.R:80).
- ``classical_decompose``: moving-average classical decomposition per the
  textbook method behind stats::decompose (R/classical.R:30-52): centered
  MA trend (half weights at the ends for even periods), per-phase means of
  the detrended series recentred, additive or multiplicative.
- ``estimate_stl``: the reference's multi-seasonal back-fitting driver
  (R/stl.R:50-86): 2 outer iterations over seasonal periods ascending,
  default s.window = 7 + 4*rank.
"""

from __future__ import annotations

import math

import numpy as np


def _nextodd(x: float) -> int:
    v = int(round(x))
    return v + 1 if v % 2 == 0 else v


# ---------------------------------------------------------------- loess core


def _est(
    y: np.ndarray,
    length: int,
    degree: int,
    xs: float,
    nleft: int,
    nright: int,
    rw: np.ndarray | None,
) -> float | None:
    """Loess estimate at position xs (1-based data positions 1..n).

    nleft/nright are 1-based inclusive window bounds. Returns None when all
    weights vanish (caller falls back)."""
    n = len(y)
    rng = float(n) - 1.0
    h = max(xs - nleft, nright - xs)
    if length > n:
        h += (length - n) / 2.0
    h9 = 0.999 * h
    h1 = 0.001 * h
    j = np.arange(nleft, nright + 1)
    r = np.abs(j - xs)
    w = np.zeros(len(j))
    inside = r <= h9
    if h > 0:
        w[inside] = (1.0 - (r[inside] / h) ** 3) ** 3
    w[r <= h1] = 1.0
    if rw is not None:
        w *= rw[nleft - 1 : nright]
    a = w.sum()
    if a <= 0:
        return None
    w = w / a
    yw = y[nleft - 1 : nright]
    if h > 0 and degree > 0:
        xm = float(np.dot(w, j))
        c = float(np.dot(w, (j - xm) ** 2))
        if math.sqrt(c) > 0.001 * rng:
            b = (xs - xm) / c
            w = w * (b * (j - xm) + 1.0)
    return float(np.dot(w, yw))


from functools import lru_cache


@lru_cache(maxsize=256)
def _interior_weights(length: int, degree: int, n: int) -> np.ndarray | None:
    """Final loess weight vector for a fully-interior evaluation point.
    Cached (read-only) per (length, degree, n) — the cycle-subseries pass
    recomputes the same kernel once per subseries otherwise.

    Without robustness weights the loess window at every interior point
    sees the same |j - xs| pattern, the same normalization and the same
    degree-1 correction — the estimate is a CONVOLUTION with this fixed
    kernel (shift-invariance; same device as the X11 filters). Interior
    here means nsh <= i <= n - nsh with length < n."""
    nsh = (length + 1) // 2
    xs = float(nsh)
    nleft, nright = 1, length
    rng = float(n) - 1.0
    h = max(xs - nleft, nright - xs)
    h9 = 0.999 * h
    h1 = 0.001 * h
    j = np.arange(nleft, nright + 1)
    r = np.abs(j - xs)
    w = np.zeros(len(j))
    inside = r <= h9
    if h > 0:
        w[inside] = (1.0 - (r[inside] / h) ** 3) ** 3
    w[r <= h1] = 1.0
    a = w.sum()
    if a <= 0:
        return None
    w = w / a
    if h > 0 and degree > 0:
        xm = float(np.dot(w, j))
        c = float(np.dot(w, (j - xm) ** 2))
        if math.sqrt(c) > 0.001 * rng:
            b = (xs - xm) / c
            w = w * (b * (j - xm) + 1.0)
    w.setflags(write=False)
    return w


def _stless(
    y: np.ndarray, length: int, degree: int, jump: int, rw: np.ndarray | None = None
) -> np.ndarray:
    """Loess-smooth y at positions 1..n with jump-point linear interpolation
    (the paper's speed device; matches the reference's jump semantics).
    The rw-free interior runs as one vectorized correlation (see
    _interior_weights); only the 2*nsh edge points stay per-point."""
    n = len(y)
    if n < 2:
        return y.astype(np.float64).copy()
    ys = np.empty(n)
    newnj = min(jump, n - 1)
    nsh = (length + 1) // 2
    eval_pts = list(range(1, n + 1, newnj))
    if eval_pts[-1] != n:
        eval_pts.append(n)
    interior_done = np.zeros(n + 1, dtype=bool)
    if rw is None and length < n:
        W = _interior_weights(length, degree, n)
        if W is not None:
            corr = np.correlate(y, W, mode="valid")  # corr[s] = dot(W, y[s:s+length])
            for i in eval_pts:
                if nsh <= i < n - nsh + 1:
                    ys[i - 1] = corr[i - nsh]
                    interior_done[i] = True
    for i in eval_pts:
        if interior_done[i]:
            continue
        if length >= n:
            nleft, nright = 1, n
        elif i < nsh:
            nleft, nright = 1, length
        elif i >= n - nsh + 1:
            nleft, nright = n - length + 1, n
        else:
            nleft, nright = i - nsh + 1, length + i - nsh
        v = _est(y, length, degree, float(i), nleft, nright, rw)
        ys[i - 1] = y[i - 1] if v is None else v
    if newnj > 1:
        for idx in range(len(eval_pts) - 1):
            i, k = eval_pts[idx], eval_pts[idx + 1]
            if k - i > 1:
                delta = (ys[k - 1] - ys[i - 1]) / (k - i)
                for m in range(i + 1, k):
                    ys[m - 1] = ys[i - 1] + delta * (m - i)
    return ys


def _ma(x: np.ndarray, length: int) -> np.ndarray:
    """Moving average of window ``length``: output length len(x)-length+1."""
    c = np.cumsum(np.concatenate([[0.0], x]))
    return (c[length:] - c[:-length]) / length


def _stlfts(x: np.ndarray, period: int) -> np.ndarray:
    """Low-pass MA cascade: MA(p) -> MA(p) -> MA(3). len n+2p -> n."""
    return _ma(_ma(_ma(x, period), period), 3)


def _stlss(
    y: np.ndarray,
    period: int,
    s_window: int,
    s_degree: int,
    s_jump: int,
    rw: np.ndarray | None,
) -> np.ndarray:
    """Cycle-subseries smoothing with one-period extension each side:
    returns length n + 2*period."""
    n = len(y)
    out = np.empty(n + 2 * period)
    for j in range(1, period + 1):
        sub = y[j - 1 :: period]
        k = len(sub)
        subrw = rw[j - 1 :: period] if rw is not None else None
        sm = _stless(sub, s_window, s_degree, s_jump, subrw)
        work = np.empty(k + 2)
        work[1 : k + 1] = sm
        # extension at xs = 0
        nright = min(s_window, k)
        v = _est(sub, s_window, s_degree, 0.0, 1, nright, subrw)
        work[0] = work[1] if v is None else v
        # extension at xs = k+1
        nleft = max(1, k - s_window + 1)
        v = _est(sub, s_window, s_degree, float(k + 1), nleft, k, subrw)
        work[k + 1] = work[k] if v is None else v
        out[j - 1 :: period] = work[: (n + 2 * period - (j - 1) + period - 1) // period]
    return out


def _stlrwt(y: np.ndarray, fit: np.ndarray) -> np.ndarray:
    """Bisquare robustness weights with the 6*median(|r|) scale."""
    r = np.abs(y - fit)
    n = len(r)
    mid1 = n // 2  # Fortran mid(1)=n/2+1, mid(2)=n-mid(1)+1 (1-based)
    part = np.partition(r, [mid1, n - mid1 - 1] if n > 1 else [0])
    cmad = 3.0 * (part[mid1] + part[n - mid1 - 1]) if n > 1 else 6.0 * r[0]
    c9, c1 = 0.999 * cmad, 0.001 * cmad
    w = np.zeros(n)
    if cmad <= 0:
        return np.ones(n)
    mid_mask = (r > c1) & (r <= c9)
    w[r <= c1] = 1.0
    w[mid_mask] = (1.0 - (r[mid_mask] / cmad) ** 2) ** 2
    return w


def stl_decompose(
    y: np.ndarray,
    period: int,
    s_window: int | str = "periodic",
    s_degree: int = 0,
    t_window: int | None = None,
    t_degree: int = 1,
    l_window: int | None = None,
    l_degree: int | None = None,
    s_jump: int | None = None,
    t_jump: int | None = None,
    l_jump: int | None = None,
    robust: bool = False,
    inner: int | None = None,
    outer: int | None = None,
) -> dict[str, np.ndarray]:
    """Full STL: returns dict(seasonal, trend, remainder).

    Defaults mirror the published algorithm's recommended settings (and the
    reference's usage): l_window = nextodd(period), t_window =
    nextodd(1.5*period / (1 - 1.5/s_window)), jumps = ceil(window/10),
    inner=2/outer=0 (non-robust) or inner=1/outer=15 (robust).
    """
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if period < 2 or n <= 2 * period:
        raise ValueError("series is not periodic or has less than two periods")
    periodic = False
    if isinstance(s_window, str):
        if s_window != "periodic":
            raise ValueError("unknown string value for s_window")
        periodic = True
        s_window = 10 * n + 1
        s_degree = 0
    s_window = _nextodd(s_window)
    if t_window is None:
        t_window = _nextodd(math.ceil(1.5 * period / (1 - 1.5 / s_window)))
    else:
        t_window = _nextodd(t_window)
    if l_window is None:
        l_window = _nextodd(period)
    else:
        l_window = _nextodd(l_window)
    if l_degree is None:
        l_degree = t_degree
    s_jump = s_jump or max(1, math.ceil(s_window / 10))
    t_jump = t_jump or max(1, math.ceil(t_window / 10))
    l_jump = l_jump or max(1, math.ceil(l_window / 10))
    if inner is None:
        inner = 1 if robust else 2
    if outer is None:
        outer = 15 if robust else 0

    trend = np.zeros(n)
    season = np.zeros(n)
    rw: np.ndarray | None = None
    for k in range(outer + 1):
        for _ in range(inner):
            detrended = y - trend
            ext = _stlss(detrended, period, s_window, s_degree, s_jump, rw)
            low = _stless(_stlfts(ext, period), l_window, l_degree, l_jump, rw)
            season = ext[period : period + n] - low
            deseas = y - season
            trend = _stless(deseas, t_window, t_degree, t_jump, rw)
        if k < outer:
            rw = _stlrwt(y, trend + season)
    if periodic:
        # R stl: replace seasonal by its cycle means when s.window="periodic"
        phases = np.arange(n) % period
        means = np.array([season[phases == p].mean() for p in range(period)])
        season = means[phases]
    return {
        "seasonal": season,
        "trend": trend,
        "remainder": y - season - trend,
    }


# ------------------------------------------------ SQL-mirrored exact path
#
# For integer-valued series with numeric windows and robust=False the STL
# pipeline is a FIXED composition of linear filters: every loess weight
# vector depends only on (window, degree, position class), never on the
# data. The exact path below re-runs stl_decompose's algorithm with
# (a) weight vectors taken from ONE shared helper (loess_weight_vector)
#     whose float64 outputs are embedded verbatim as literals by the SQL
#     generator (oracle/stl_sql.py), and
# (b) every data-dependent accumulation folded in a fixed ascending
#     order, mirrored term-for-term by the generator's left-associated
#     chains — so DuckDB reproduces the kernel bit-for-bit (the same
#     device as the X11 / classical / ARCH-LM oracles).


@lru_cache(maxsize=4096)
def loess_weight_vector(length: int, degree: int, xs: float, nleft: int,
                        nright: int) -> tuple[float, ...] | None:
    """Final loess weight vector for evaluation point xs over 1-based
    window [nleft, nright], with the degree-1 correction applied
    UNCONDITIONALLY (the float path's guard ``sqrt(c) > 0.001*(n-1)``
    depends on the series length; the exact path asserts it holds via
    loess_guard_ok and falls back otherwise). Window length must satisfy
    length <= n (no short-series h adjustment). The internal numpy
    evaluation order is irrelevant: only the RESULTING float64 weights
    are shared between the exact kernel and the SQL literals."""
    h = max(xs - nleft, nright - xs)
    if h <= 0:
        return None
    h9 = 0.999 * h
    h1 = 0.001 * h
    j = np.arange(nleft, nright + 1)
    r = np.abs(j - xs)
    w = np.zeros(len(j))
    inside = r <= h9
    w[inside] = (1.0 - (r[inside] / h) ** 3) ** 3
    w[r <= h1] = 1.0
    a = w.sum()
    if a <= 0:
        return None
    w = w / a
    if degree > 0:
        xm = float(np.dot(w, j))
        c = float(np.dot(w, (j - xm) ** 2))
        b = (xs - xm) / c
        w = w * (b * (j - xm) + 1.0)
    return tuple(float(v) for v in w)


@lru_cache(maxsize=4096)
def loess_guard_ok(length: int, degree: int, xs: float, nleft: int,
                   nright: int, n: int) -> bool:
    """True when the float path's degree-1 correction guard
    ``sqrt(c) > 0.001*(n-1)`` matches the exact path's assumption (always
    corrected). Degree-0 windows trivially pass."""
    if degree <= 0:
        return True
    h = max(xs - nleft, nright - xs)
    if h <= 0:
        return False
    h9 = 0.999 * h
    h1 = 0.001 * h
    j = np.arange(nleft, nright + 1)
    r = np.abs(j - xs)
    w = np.zeros(len(j))
    inside = r <= h9
    w[inside] = (1.0 - (r[inside] / h) ** 3) ** 3
    w[r <= h1] = 1.0
    a = w.sum()
    if a <= 0:
        return False
    w = w / a
    xm = float(np.dot(w, j))
    c = float(np.dot(w, (j - xm) ** 2))
    return math.sqrt(c) > 0.001 * (n - 1)


def _loess_classes(length: int, L: int):
    """(xs, nleft, nright) per evaluation position class for a pass over a
    series of length L with window ``length``: positions 1..nsh-1 (left),
    interior, L-nsh+1..L (right). Requires L >= length + 2."""
    nsh = (length + 1) // 2
    out = {}
    for i in range(1, nsh):
        out[i] = (float(i), 1, length)
    for i in range(L - nsh + 1, L + 1):
        out[i] = (float(i), L - length + 1, L)
    return out, nsh


def _fold(w, x, start: int) -> float:
    """Ascending-order weighted fold: ((w0*x[s]) + w1*x[s+1]) + ... —
    the order the SQL chains reproduce."""
    acc = w[0] * x[start]
    for t in range(1, len(w)):
        acc += w[t] * x[start + t]
    return acc


def _stless_exact(x: list[float], length: int, degree: int,
                  jump: int) -> list[float]:
    """_stless with fixed ascending folds and shared weight vectors.
    Caller guarantees length + 2 <= len(x) and jump >= 1."""
    L = len(x)
    classes, nsh = _loess_classes(length, L)
    evals = list(range(1, L + 1, jump))
    if evals[-1] != L:
        evals.append(L)
    ys = [0.0] * L
    for i in evals:
        if i in classes:
            xs, nleft, nright = classes[i]
        else:
            xs, nleft, nright = float(i), i - nsh + 1, length + i - nsh
        # loess weights are shift-invariant: express the window in
        # relative coords so interior positions share one cached vector
        w = loess_weight_vector(length, degree, xs - nleft + 1, 1,
                                nright - nleft + 1)
        ys[i - 1] = _fold(w, x, nleft - 1)
    for a, b in zip(evals, evals[1:]):
        if b - a > 1:
            delta = (ys[b - 1] - ys[a - 1]) / (b - a)
            for m in range(a + 1, b):
                ys[m - 1] = ys[a - 1] + delta * (m - a)
    return ys


def _stless_guard_ok(length: int, degree: int, jump: int, L: int) -> bool:
    """All degree-1 corrections of a pass match the float path's guard."""
    if degree <= 0:
        return True
    classes, nsh = _loess_classes(length, L)
    evals = list(range(1, L + 1, jump))
    if evals[-1] != L:
        evals.append(L)
    for i in evals:
        if i in classes:
            xs, nleft, nright = classes[i]
        else:
            xs, nleft, nright = float(i), i - nsh + 1, length + i - nsh
        if not loess_guard_ok(length, degree, xs - nleft + 1, 1,
                              nright - nleft + 1, L):
            return False
    return True


def _ma_exact(x: list[float], length: int) -> list[float]:
    """Valid-mode moving average with ascending folds: out[i] =
    ((x[i] + x[i+1]) + ...) / length."""
    out = []
    for i in range(len(x) - length + 1):
        acc = x[i]
        for t in range(1, length):
            acc += x[i + t]
        out.append(acc / length)
    return out


def stl_exact_config(period: int, s_window: int,
                     t_window: int | None = None,
                     l_window: int | None = None) -> dict:
    """Resolved STL parameters for the exact path / SQL generator (same
    defaulting as stl_decompose)."""
    s_window = _nextodd(s_window)
    if t_window is None:
        t_window = _nextodd(math.ceil(1.5 * period / (1 - 1.5 / s_window)))
    if l_window is None:
        l_window = _nextodd(period)
    return {
        "period": period,
        "s_window": s_window, "s_degree": 0,
        "t_window": t_window, "t_degree": 1,
        "l_window": l_window, "l_degree": 1,
        "s_jump": max(1, math.ceil(s_window / 10)),
        "t_jump": max(1, math.ceil(t_window / 10)),
        "l_jump": max(1, math.ceil(l_window / 10)),
        "inner": 2,
    }


def stl_exact_applicable(y: np.ndarray, cfg: dict) -> bool:
    """True when the exact path reproduces the float path's branch
    structure: integral values, every pass strictly inside the
    length/window regime, and every degree-1 guard holding."""
    from .stats_utils import exact_int_ok

    n = len(y)
    p = cfg["period"]
    if n <= 2 * p or not exact_int_ok(np.asarray(y, dtype=np.float64)):
        return False
    k_min = min(int(np.sum((np.arange(n) % p) == j)) for j in range(p))
    if k_min < cfg["s_window"] + 2:
        return False
    if n < cfg["t_window"] + 2 or n < cfg["l_window"] + 2:
        return False
    for j in range(p):
        k = int(np.sum((np.arange(n) % p) == j))
        if not _stless_guard_ok(cfg["s_window"], cfg["s_degree"],
                                cfg["s_jump"], k):
            return False
    return (_stless_guard_ok(cfg["l_window"], cfg["l_degree"], cfg["l_jump"], n)
            and _stless_guard_ok(cfg["t_window"], cfg["t_degree"],
                                 cfg["t_jump"], n))


def stl_decompose_exact(y: np.ndarray, cfg: dict) -> dict[str, np.ndarray]:
    """stl_decompose(robust=False) as fixed IEEE expression trees,
    mirrored term-for-term by oracle/stl_sql.py. Caller must have checked
    stl_exact_applicable."""
    n = len(y)
    p = cfg["period"]
    yl = [float(v) for v in np.asarray(y, dtype=np.float64)]
    trend = [0.0] * n
    season = [0.0] * n
    deseas = yl
    for it in range(cfg["inner"]):
        detr = yl if it == 0 else [yl[t] - trend[t] for t in range(n)]
        ext = [0.0] * (n + 2 * p)
        for j in range(1, p + 1):
            sub = detr[j - 1::p]
            k = len(sub)
            sm = _stless_exact(sub, cfg["s_window"], cfg["s_degree"],
                               cfg["s_jump"])
            w0 = loess_weight_vector(cfg["s_window"], cfg["s_degree"],
                                     0.0, 1, min(cfg["s_window"], k))
            e0 = _fold(w0, sub, 0)
            start = max(1, k - cfg["s_window"] + 1)
            wk = loess_weight_vector(cfg["s_window"], cfg["s_degree"],
                                     float(k + 1) - start + 1, 1,
                                     k - start + 1)
            ek = _fold(wk, sub, start - 1)
            work = [e0] + sm + [ek]
            for s in range(k + 2):
                ext[(j - 1) + s * p] = work[s]
        fts = _ma_exact(_ma_exact(_ma_exact(ext, p), p), 3)
        low = _stless_exact(fts, cfg["l_window"], cfg["l_degree"],
                            cfg["l_jump"])
        season = [ext[p + t] - low[t] for t in range(n)]
        deseas = [yl[t] - season[t] for t in range(n)]
        trend = _stless_exact(deseas, cfg["t_window"], cfg["t_degree"],
                              cfg["t_jump"])
    return {
        "seasonal": np.array(season),
        "trend": np.array(trend),
        "remainder": np.array([deseas[t] - trend[t] for t in range(n)]),
    }


# ------------------------------------------------------------------ supsmu


def _smooth_fixed(
    x: np.ndarray, y: np.ndarray, span: float, vsmlsq: float, cross_validate: bool
) -> tuple[np.ndarray, np.ndarray | None]:
    """Friedman's running linear smoother with fixed span (smooth.f):
    fixed window of 2*ibw+1 points clamped at the boundaries; optional
    absolute cross-validated residuals."""
    n = len(x)
    ibw = int(0.5 * span * n + 0.5)
    if ibw < 2:
        ibw = 2
    it = min(2 * ibw + 1, n)
    starts = np.clip(np.arange(n) - ibw, 0, n - it)
    cx = np.concatenate([[0.0], np.cumsum(x)])
    cy = np.concatenate([[0.0], np.cumsum(y)])
    cxx = np.concatenate([[0.0], np.cumsum(x * x)])
    cxy = np.concatenate([[0.0], np.cumsum(x * y)])
    e = starts + it
    m = float(it)
    xm = (cx[e] - cx[starts]) / m
    ym = (cy[e] - cy[starts]) / m
    var = (cxx[e] - cxx[starts]) / m - xm * xm
    cvar = (cxy[e] - cxy[starts]) / m - xm * ym
    a = np.where(var > vsmlsq, cvar / np.where(var > vsmlsq, var, 1.0), 0.0)
    smo = a * (x - xm) + ym
    acvr = None
    if cross_validate:
        h = 1.0 / m + np.where(var > vsmlsq, (x - xm) ** 2 / np.where(var > vsmlsq, var * m, 1.0), 0.0)
        denom = 1.0 - h
        acvr = np.abs(y - smo) / np.maximum(denom, 1e-10)
    return smo, acvr


def supsmu(y: np.ndarray, span: float = 0.0, bass: float = 0.0) -> np.ndarray:
    """Friedman (1984) SuperSmoother over x = 1..n (the reference's usage
    stats::supsmu(seq_along(y), y), R/stl.R:80). Variable-span smoother:
    three candidate spans (0.05, 0.2, 0.5), per-point span selection by
    smoothed cross-validated |residual|, interpolation between span fits,
    final tweeter-span pass."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    x = np.arange(1, n + 1, dtype=np.float64)
    if n < 5:
        return y.copy()
    spans = (0.05, 0.2, 0.5)
    i, j = n // 4, 3 * (n // 4)
    scale = x[j - 1] - x[i - 1]
    if scale <= 0:
        scale = 1.0
    vsmlsq = (1e-3 * scale) ** 2
    if span > 0:
        smo, _ = _smooth_fixed(x, y, span, vsmlsq, False)
        return smo
    fits, resids = [], []
    for sp in spans:
        f, r = _smooth_fixed(x, y, sp, vsmlsq, True)
        rs, _ = _smooth_fixed(x, r, spans[1], vsmlsq, False)
        fits.append(f)
        resids.append(rs)
    resids = np.column_stack(resids)
    best = np.argmin(resids, axis=1)
    sel_span = np.asarray(spans)[best]
    if bass > 0:
        # bass enhancement: push spans toward the woofer where the CV
        # residual ratio small/large is near 1 (Friedman 1984 §4)
        small = resids[np.arange(n), best]
        large = resids[:, 2]
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio = np.where(large > 0, small / large, 1.0)
        adj = np.clip(ratio, 0, 1) ** (10.0 - bass)
        sel_span = sel_span + (spans[2] - sel_span) * adj
    sm_span, _ = _smooth_fixed(x, sel_span, spans[1], vsmlsq, False)
    sm_span = np.clip(sm_span, spans[0], spans[2])
    f_lo, f_mid, f_hi = fits
    out = np.empty(n)
    hi_mask = sm_span >= spans[1]
    fhi = (sm_span - spans[1]) / (spans[2] - spans[1])
    flo = (spans[1] - sm_span) / (spans[1] - spans[0])
    out[hi_mask] = (1 - fhi[hi_mask]) * f_mid[hi_mask] + fhi[hi_mask] * f_hi[hi_mask]
    out[~hi_mask] = (1 - flo[~hi_mask]) * f_mid[~hi_mask] + flo[~hi_mask] * f_lo[~hi_mask]
    final, _ = _smooth_fixed(x, out, spans[0], vsmlsq, False)
    return final


# -------------------------------------------------------- classical / driver


def _classical_decompose_exact_int(y: np.ndarray, period: int) -> dict[str, np.ndarray]:
    """Additive classical decomposition of an integer-valued series via
    exact integer/rational arithmetic until a single rounding division per
    output value — so an ANSI-SQL oracle evaluating the same expression
    over the same integers is bit-identical (see __ray_entry__.oracle_sql
    "classical_1h").

    Scaled scheme (d = 2*period for even period, period for odd):
      W_t  = d * trend_t            (integer centered-MA window sum)
      D_t  = d*y_t - W_t            (integer detrended, valid region only)
      A_p  = sum of D_t over phase p; c_p its count (c_p takes at most two
             distinct values because the valid region is contiguous)
      mean_p   = A_p / (d*c_p)                       (one exact division)
      overall  = N / (d*L*period), N = sum_p A_p*(L/c_p), L = lcm of c_p
      seasonal_p = mean_p - overall                  (one subtraction)
      random   = (y - seasonal) - trend
    Mathematically identical to the float path; numerically it is the
    correctly-rounded value of the underlying rational at each step."""
    n = len(y)
    yi = np.rint(y).astype(np.int64)
    even = period % 2 == 0
    half = period // 2
    d = 2 * period if even else period
    trend = np.full(n, np.nan)
    W = np.full(n, 0, dtype=np.int64)
    valid = np.zeros(n, dtype=bool)
    c = np.cumsum(np.concatenate([[0], yi]))  # c[i] = sum(yi[:i])
    if even:
        # w = y[t-half] + y[t+half] + 2*sum(y[t-half+1 .. t+half-1])
        t = np.arange(half, n - half)
        W[t] = yi[t - half] + yi[t + half] + 2 * (c[t + half] - c[t - half + 1])
    else:
        t = np.arange(half, n - half)
        W[t] = c[t + half + 1] - c[t - half]
    valid[t] = True
    trend[t] = W[t].astype(np.float64) / float(d)
    phases = np.arange(n) % period
    # per-phase integer sums of D_t = d*y_t - W_t over the valid region
    D = d * yi[valid].astype(object) - W[valid].astype(object)
    ph_valid = phases[valid]
    A = [0] * period
    cnt = [0] * period
    for p_, dv in zip(ph_valid, D):
        A[p_] += int(dv)
        cnt[p_] += 1
    cs = sorted(set(cnt))
    L = cs[0] if len(cs) == 1 else int(np.lcm.reduce(np.array(cs, dtype=np.int64)))
    N = sum(A[p_] * (L // cnt[p_]) for p_ in range(period))
    overall = float(N) / float(d * L * period)
    figure = np.array(
        [float(A[p_]) / float(d * cnt[p_]) - overall for p_ in range(period)]
    )
    seasonal = figure[phases]
    random = (y - seasonal) - trend
    return {
        "trend": trend,
        "seasonal": seasonal,
        "random": random,
        "season_adjust": y - seasonal,
    }


def classical_decompose(
    y: np.ndarray, period: int, type_: str = "additive"
) -> dict[str, np.ndarray]:
    """Classical MA decomposition (textbook method of stats::decompose):
    trend = centered MA(period) (half weights at ends when even), seasonal
    = recentred per-phase mean of detrended, random = the rest. NaN pads
    where the MA is undefined."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if period < 2 or n < 2 * period:
        raise ValueError("time series has no or less than 2 periods")
    if (type_ == "additive" and np.isfinite(y).all()
            and (np.rint(y) == y).all() and np.abs(y).max() < 2**52
            # the exact path's int64 cumsum reaches n*max|y|; bound it so
            # it cannot wrap silently (phase sums use Python ints, safe)
            and n * float(np.abs(y).max()) < 2**62):
        return _classical_decompose_exact_int(y, period)
    if period % 2 == 0:
        filt = np.concatenate([[0.5], np.ones(period - 1), [0.5]]) / period
    else:
        filt = np.ones(period) / period
    half = len(filt) // 2
    trend = np.full(n, np.nan)
    conv = np.convolve(y, filt[::-1], mode="valid")
    trend[half : half + len(conv)] = conv
    detrended = y - trend if type_ == "additive" else y / trend
    phases = np.arange(n) % period
    figure = np.empty(period)
    for p in range(period):
        vals = detrended[phases == p]
        figure[p] = np.nanmean(vals)
    if type_ == "additive":
        figure = figure - figure.mean()
        seasonal = figure[phases]
        random = y - seasonal - trend
        season_adjust = y - seasonal
    else:
        figure = figure / figure.mean()
        seasonal = figure[phases]
        random = y / (seasonal * trend)
        season_adjust = y / seasonal
    return {
        "trend": trend,
        "seasonal": seasonal,
        "random": random,
        "season_adjust": season_adjust,
    }


def estimate_stl(
    y: np.ndarray,
    season_args: dict[int | str, dict] | None = None,
    trend_args: dict | None = None,
    lowpass_args: dict | None = None,
    iterations: int = 2,
    **stl_kwargs,
) -> dict[str, np.ndarray]:
    """Multi-seasonal back-fitting STL (reference semantics, R/stl.R:50-86):

    - drop periods <= 1; order ascending; default s.window = 7 + 4*rank
    - ``iterations`` outer loops; within each, for each seasonal component:
      re-add its current seasonal, STL at that period, subtract new seasonal
    - non-seasonal fallback: supsmu trend
    - returns trend, season_<name>..., remainder, season_adjust
    """
    y = np.asarray(y, dtype=np.float64)
    if np.isnan(y).any():
        raise ValueError("STL decomposition does not support series with missing values.")
    season_args = dict(season_args or {})
    trend_args = dict(trend_args or {})
    lowpass_args = dict(lowpass_args or {})
    items = []
    for name, args in season_args.items():
        args = dict(args)
        period = int(args.pop("period", name if isinstance(name, int) else 0))
        if period > 1:
            items.append((str(name), period, args))
    items.sort(key=lambda it: it[1])
    deseas = y.astype(np.float64).copy()
    seas: dict[str, np.ndarray] = {}
    # SQL-mirrored exact path: single seasonal period, default windows /
    # degrees / jumps, robust=False, integer-valued series. With one
    # period the back-fitting loop is idempotent (iteration 2 re-fits
    # the identical input), so one stl_decompose_exact call suffices.
    if (items and len(items) == 1 and not stl_kwargs
            and not trend_args and not lowpass_args
            and set(items[0][2]) <= {"s_window"}):
        name, period, args = items[0]
        cfg = stl_exact_config(period, args.get("s_window", 11))
        if stl_exact_applicable(y, cfg):
            fit = stl_decompose_exact(y, cfg)
            out = {"trend": fit["trend"],
                   f"season_{name}": fit["seasonal"],
                   "remainder": fit["remainder"],
                   "season_adjust": y - fit["seasonal"]}
            return out
    if items:
        for rank, (name, period, args) in enumerate(items, start=1):
            args.setdefault("s_window", 7 + 4 * rank)
            seas[f"season_{name}"] = np.zeros(len(y))
        fit = None
        keys = [f"season_{name}" for name, _, _ in items]
        for _ in range(iterations):
            for (name, period, args), key in zip(items, keys):
                deseas = deseas + seas[key]
                fit = stl_decompose(
                    deseas,
                    period,
                    s_window=args.get("s_window"),
                    s_degree=args.get("s_degree", 0),
                    t_window=trend_args.get("t_window"),
                    t_degree=trend_args.get("t_degree", 1),
                    l_window=lowpass_args.get("l_window"),
                    l_degree=lowpass_args.get("l_degree"),
                    s_jump=args.get("s_jump"),
                    t_jump=trend_args.get("t_jump"),
                    l_jump=lowpass_args.get("l_jump"),
                    **stl_kwargs,
                )
                seas[key] = fit["seasonal"]
                deseas = deseas - seas[key]
        trend = fit["trend"]
    else:
        trend = supsmu(y)
    out: dict[str, np.ndarray] = {"trend": trend}
    out.update(seas)
    out["remainder"] = deseas - trend
    out["season_adjust"] = deseas
    return out
