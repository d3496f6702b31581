"""Statistical primitives (no scipy in this environment).

Reimplementations of the R building blocks the reference leans on:
run-length encoding, longest contiguous non-NA run (stats::na.contiguous),
lag-embedding (stats::embed), orthogonal polynomials (stats::poly),
chi-square upper tail (regularized incomplete gamma, Abramowitz & Stegun
6.5 series / continued fraction), linear interpolation with clamping
(stats::approx rule=2), and nrd0 bandwidth (stats::bw.nrd0).
"""

from __future__ import annotations

import math

import numpy as np


def rle(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Run-length encode: returns (values, lengths). NaN-safe for floats
    (NaN runs compare equal like R's rle does NOT — callers pass non-NaN)."""
    x = np.asarray(x)
    if len(x) == 0:
        return x, np.array([], dtype=np.int64)
    change = np.empty(len(x), dtype=bool)
    change[0] = True
    change[1:] = x[1:] != x[:-1]
    starts = np.flatnonzero(change)
    lengths = np.diff(np.append(starts, len(x)))
    return x[starts], lengths


def longest_contiguous_run(valid: np.ndarray) -> tuple[int, int]:
    """(start, stop) of the longest True run (first on ties, like
    stats::na.contiguous). stop is exclusive. valid must have any True."""
    v = np.asarray(valid, dtype=bool)
    vals, lens = rle(v)
    true_runs = np.flatnonzero(vals)
    best = true_runs[np.argmax(lens[true_runs])]
    stops = np.cumsum(lens)
    return int(stops[best] - lens[best]), int(stops[best])


def na_contiguous(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    ok = ~np.isnan(x)
    if ok.all():
        return x
    lo, hi = longest_contiguous_run(ok)
    return x[lo:hi]


def embed(x: np.ndarray, dimension: int) -> np.ndarray:
    """R stats::embed: row t = (x[t+d-1], x[t+d-2], ..., x[t])."""
    x = np.asarray(x)
    n = len(x)
    m = n - dimension + 1
    return np.column_stack([x[dimension - 1 - j : dimension - 1 - j + m] for j in range(dimension)])


def _gamma_p(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x) (series + continued fraction)."""
    if x < 0 or a <= 0:
        return math.nan
    if x == 0:
        return 0.0
    lg = math.lgamma(a)
    if x < a + 1.0:
        # series representation
        term = 1.0 / a
        total = term
        ap = a
        for _ in range(1000):
            ap += 1.0
            term *= x / ap
            total += term
            if abs(term) < abs(total) * 1e-15:
                break
        return total * math.exp(-x + a * math.log(x) - lg)
    # continued fraction for Q, then P = 1 - Q (modified Lentz)
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 1000):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    q = math.exp(-x + a * math.log(x) - lg) * h
    return 1.0 - q


def chi2_sf(x: float, df: float) -> float:
    """P(X > x) for chi-square(df) — stats::pchisq(lower.tail=FALSE)."""
    if math.isnan(x):
        return math.nan
    if x <= 0:
        return 1.0
    return max(0.0, min(1.0, 1.0 - _gamma_p(df / 2.0, x / 2.0)))


def norm_pdf(x: np.ndarray, mean=0.0, sd=1.0) -> np.ndarray:
    z = (np.asarray(x, dtype=np.float64) - mean) / sd
    return np.exp(-0.5 * z * z) / (sd * math.sqrt(2 * math.pi))


def poly_orthogonal(n: int, degree: int) -> np.ndarray:
    """stats::poly(seq_len(n), degree): orthonormal polynomial basis
    (columns have unit sum of squares, orthogonal, no intercept)."""
    t = np.arange(1, n + 1, dtype=np.float64)
    X = np.vander(t - t.mean(), degree + 1, increasing=True)
    q, r = np.linalg.qr(X)
    # drop intercept column; normalize to unit length with R's sign convention
    z = q[:, 1 : degree + 1] * np.diag(r)[1 : degree + 1]
    norm2 = np.sum(z**2, axis=0)
    return z / np.sqrt(norm2)


def exact_int_ok(x: np.ndarray) -> bool:
    """Gate for exact-integer kernels: integral values whose power sums
    cannot wrap int64 (dot products reach n*mx^2, cumsums n*mx)."""
    if len(x) == 0 or not np.isfinite(x).all() or not (np.rint(x) == x).all():
        return False
    mx = float(np.abs(x).max())
    n = len(x)
    return mx < 2**52 and n * mx * mx < 2**62 and n * mx < 2**62


def approx_clamped(xs: np.ndarray, ys: np.ndarray, xout: float) -> float:
    """stats::approx(..., rule = 2): linear interp, clamp outside range.
    xs may be descending (critical-value tables); handled by sorting."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    order = np.argsort(xs)
    xs, ys = xs[order], ys[order]
    return float(np.interp(xout, xs, ys))


def bw_nrd0(x: np.ndarray) -> float:
    """stats::bw.nrd0 (Silverman's rule of thumb variant used by density)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    sd = x.std(ddof=1) if n > 1 else 0.0
    q75, q25 = np.percentile(x, [75, 25])
    iqr = q75 - q25
    lo = min(sd, iqr / 1.349)
    if lo == 0:
        lo = sd or abs(x[0]) or 1.0
    return 0.9 * lo * n ** (-0.2)


def var_narm(x: np.ndarray, ddof: int = 1) -> float:
    """R var(x, na.rm=TRUE): sample variance over non-NA values."""
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    if len(x) <= ddof:
        return math.nan
    return float(x.var(ddof=ddof))


def mean_narm(x: np.ndarray) -> float:
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    return float(x.mean()) if len(x) else math.nan


def sd_narm(x: np.ndarray) -> float:
    v = var_narm(x)
    return math.sqrt(v) if not math.isnan(v) else math.nan


def brent_minimize(f, lower: float, upper: float, tol: float | None = None) -> float:
    """Brent's fmin (localmin, Brent 1973 ch.5 — the algorithm behind
    stats::optimise). Returns the argmin location in [lower, upper]."""
    if tol is None:
        tol = np.finfo(float).eps ** 0.25
    golden = 0.5 * (3.0 - math.sqrt(5.0))
    a, b = lower, upper
    v = w = x = a + golden * (b - a)
    fv = fw = fx = f(x)
    d = e = 0.0
    eps = math.sqrt(np.finfo(float).eps)
    for _ in range(200):
        m = 0.5 * (a + b)
        tol1 = eps * abs(x) + tol / 3.0
        tol2 = 2.0 * tol1
        if abs(x - m) <= tol2 - 0.5 * (b - a):
            break
        p = q = r = 0.0
        if abs(e) > tol1:
            r = (x - w) * (fx - fv)
            q = (x - v) * (fx - fw)
            p = (x - v) * q - (x - w) * r
            q = 2.0 * (q - r)
            if q > 0:
                p = -p
            q = abs(q)
            r, e = e, d
        if abs(p) < abs(0.5 * q * r) and p > q * (a - x) and p < q * (b - x):
            d = p / q
            u = x + d
            if (u - a) < tol2 or (b - u) < tol2:
                d = tol1 if x < m else -tol1
        else:
            e = (b if x < m else a) - x
            d = golden * e
        u = x + d if abs(d) >= tol1 else x + (tol1 if d > 0 else -tol1)
        fu = f(u)
        if fu <= fx:
            if u < x:
                b = x
            else:
                a = x
            v, fv, w, fw, x, fx = w, fw, x, fx, u, fu
        else:
            if u < x:
                a = u
            else:
                b = u
            if fu <= fw or w == x:
                v, fv, w, fw = w, fw, u, fu
            elif fu <= fv or v == x or v == w:
                v, fv = u, fu
    return x


def diff(x: np.ndarray, lag: int = 1, differences: int = 1) -> np.ndarray:
    """base::diff(x, lag, differences)."""
    x = np.asarray(x, dtype=np.float64)
    for _ in range(differences):
        x = x[lag:] - x[:-lag]
    return x
