"""Feature extractors: pure vector -> named-scalars kernels.

Each mirrors a reference extractor's semantics (cited per function into
/root/reference/R/features.R, guerrero.R, tests.R — reimplemented in
NumPy, not ported). All handle the reference's NA conventions where the
original does (na.rm means, longest-contiguous-run windows).
"""

from __future__ import annotations

import math

import numpy as np

from .acf import acf, pacf
from .registry import register_feature
from .spectral import spectral_entropy
from .stats_utils import (
    bw_nrd0,
    brent_minimize,
    chi2_sf,
    diff,
    embed,
    longest_contiguous_run,
    mean_narm,
    na_contiguous,
    norm_pdf,
    poly_orthogonal,
    rle,
    sd_narm,
    var_narm,
)
from .stl import estimate_stl


@register_feature("n_crossing_points", ("count",), uses_period=False)
def n_crossing_points(x: np.ndarray, period: int = 1) -> dict[str, float]:
    """# times the series crosses its median (features.R:4-13)."""
    x = np.asarray(x, dtype=np.float64)
    mid = np.nanmedian(x)
    ab = x <= mid
    cross = ab[:-1] ^ ab[1:]
    return {"n_crossing_points": float(np.nansum(cross))}


def _arch_lm_exact_int(xi: np.ndarray, lags: int) -> dict[str, float]:
    """ARCH LM R² for an integer series as fixed IEEE expressions:
    z_t = (x_t - S/n)^2 per element, normal equations G/c by strictly
    ascending-row folds, a fully unrolled Cholesky solve (only +-*/ and
    sqrt — all correctly rounded), and sequential residual folds — every
    operation mirrored by the generated stat_arch_lm DuckDB oracle
    (oracle/archlm_sql.py). The generic lstsq SVD is not reproducible."""
    n = len(xi)
    mu = int(xi.sum()) / n
    d = xi.astype(np.float64) - mu
    zz = (d * d).tolist()
    p = lags + 1  # regressors incl. intercept
    rows = range(lags, n)  # row t: y = zz[t], regressor j = zz[t-j]
    m = n - lags
    if m <= lags + 1:
        return {"stat_arch_lm": math.nan}
    # normal equations with ascending-row sequential folds.
    # index 0 = intercept, j>=1 = lag j.
    G = [[0.0] * p for _ in range(p)]
    c = [0.0] * p
    G[0][0] = float(m)
    for j in range(1, p):
        acc = 0.0
        for t in rows:
            acc += zz[t - j]
        G[0][j] = G[j][0] = acc
    for i in range(1, p):
        for j in range(i, p):
            acc = 0.0
            for t in rows:
                acc += zz[t - i] * zz[t - j]
            G[i][j] = G[j][i] = acc
    acc = 0.0
    for t in rows:
        acc += zz[t]
    c[0] = acc
    for i in range(1, p):
        acc = 0.0
        for t in rows:
            acc += zz[t - i] * zz[t]
        c[i] = acc
    # unrolled Cholesky G = L L^T (ascending-k subtraction chains)
    L = [[0.0] * p for _ in range(p)]
    for j in range(p):
        acc = G[j][j]
        for k2 in range(j):
            acc -= L[j][k2] * L[j][k2]
        if acc <= 0:
            return {"stat_arch_lm": 1.0}  # singular: lm R^2 NaN -> 1
        L[j][j] = math.sqrt(acc)
        for i in range(j + 1, p):
            acc = G[i][j]
            for k2 in range(j):
                acc -= L[i][k2] * L[j][k2]
            L[i][j] = acc / L[j][j]
    w = [0.0] * p
    for i in range(p):
        acc = c[i]
        for k2 in range(i):
            acc -= L[i][k2] * w[k2]
        w[i] = acc / L[i][i]
    beta = [0.0] * p
    for i in range(p - 1, -1, -1):
        acc = w[i]
        for k2 in range(i + 1, p):
            acc -= L[k2][i] * beta[k2]
        beta[i] = acc / L[i][i]
    # residual / total sums with per-row fixed chains
    ss_res = 0.0
    sy = 0.0
    for t in rows:
        fitted = beta[0]
        for j in range(1, p):
            fitted += beta[j] * zz[t - j]
        r = zz[t] - fitted
        ss_res += r * r
        sy += zz[t]
    ybar = sy / m
    ss_tot = 0.0
    for t in rows:
        dv = zz[t] - ybar
        ss_tot += dv * dv
    if ss_tot <= 0:
        return {"stat_arch_lm": 1.0}
    return {"stat_arch_lm": 1.0 - ss_res / ss_tot}


@register_feature("stat_arch_lm", ("test",), uses_period=False)
def stat_arch_lm(x: np.ndarray, period: int = 1, lags: int = 12, demean: bool = True) -> dict[str, float]:
    """R² of x² on its 12 lags — ARCH LM statistic (features.R:18-30).
    Integral series (demeaned default path) route through the unrolled
    exact kernel (SQL-bit-exact)."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) <= lags + 1:
        return {"stat_arch_lm": math.nan}
    if demean and _exact_int_ok(x) and len(x) > 2 * (lags + 1):
        return _arch_lm_exact_int(np.rint(x).astype(np.int64), lags)
    if demean:
        x = x - np.nanmean(x)
    mat = embed(x**2, lags + 1)
    mat = mat[~np.isnan(mat).any(axis=1)]  # lm's na.omit row handling
    if len(mat) <= lags + 1:
        return {"stat_arch_lm": math.nan}
    yv = mat[:, 0]
    X = np.column_stack([np.ones(len(mat)), mat[:, 1:]])
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    fitted = X @ beta
    ss_res = float(np.sum((yv - fitted) ** 2))
    ss_tot = float(np.sum((yv - yv.mean()) ** 2))
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else math.nan
    return {"stat_arch_lm": 1.0 if math.isnan(r2) else r2}


def _seq_sum(vals) -> float:
    """Ascending sequential fold — the order DuckDB's list_sum uses, so
    the SQL oracle's list(expr ORDER BY rn) folds are bit-identical."""
    acc = 0.0
    for v in vals:
        acc += v
    return acc


def _feat_stl_exact(x: np.ndarray, period: int, cfg: dict) -> dict[str, float]:
    """feat_stl for an integer series as fixed IEEE expression trees:
    STL components from the SQL-mirrored exact path
    (stl.stl_decompose_exact), every downstream statistic folded in
    ascending row order, the orthogonal degree-2 polynomial basis in
    closed form over exactly-representable power sums — all mirrored
    term-for-term by oracle/stl_sql.feat_stl_sql."""
    from .stl import stl_decompose_exact

    fit = stl_decompose_exact(x, cfg)
    n = len(x)
    yl = [float(v) for v in x]
    trend = list(fit["trend"])
    season = list(fit["seasonal"])
    rem = list(fit["remainder"])
    sadj = [yl[t] - season[t] for t in range(n)]

    def _var(vals) -> tuple[float, float, list[float]]:
        m = _seq_sum(vals) / n
        d = [v - m for v in vals]
        ss = _seq_sum(dv * dv for dv in d)
        return ss / (n - 1), ss, d

    var_e, ss_rem, d_rem = _var(rem)
    var_sa, _, _ = _var(sadj)
    var_rs, _, _ = _var([rem[t] + season[t] for t in range(n)])
    trend_strength = max(0.0, min(1.0, 1.0 - var_e / var_sa)) \
        if var_sa != 0 else math.nan
    seasonal_strength = max(0.0, min(1.0, 1.0 - var_e / var_rs)) \
        if var_rs != 0 else math.nan
    # spikiness: variance of leave-one-out variances (mirrored chain:
    # var_e*(n-1) is NOT re-folded to ss_rem)
    loo = [(var_e * (n - 1) - d_rem[t] * d_rem[t]) / (n - 2)
           for t in range(n)]
    m_loo = _seq_sum(loo) / n
    spikiness = _seq_sum((v - m_loo) * (v - m_loo) for v in loo) / (n - 1)
    # closed-form orthonormal poly over 1..n: the centered powers are
    # multiples of 0.25 / 0.0625 so their sums are EXACT in float64 —
    # any summation order (incl. DuckDB's plain SUM) gives the same bits
    c = (n + 1) / 2
    s2 = _seq_sum((t - c) * (t - c) for t in range(1, n + 1))
    s4 = _seq_sum(((t - c) * (t - c)) * ((t - c) * (t - c))
                  for t in range(1, n + 1))
    u = s2 / n
    sq2 = math.sqrt(s2)
    sqn = math.sqrt(s4 - s2 * u)
    linearity = _seq_sum(((t - c) / sq2) * trend[t - 1]
                         for t in range(1, n + 1))
    curvature = _seq_sum((((t - c) * (t - c) - u) / sqn) * trend[t - 1]
                         for t in range(1, n + 1))
    # residual ACF (R divisor n, demeaned) with sequential folds
    c0 = ss_rem / n
    rho = []
    for k in range(1, 11):
        sk = _seq_sum(d_rem[t] * d_rem[t + k] for t in range(n - k))
        rho.append((sk / n) / c0)
    acf10 = _seq_sum(r * r for r in rho)
    # first-occurrence argmax/argmin, 1-based index mod period
    peak = float((min(t for t in range(n) if season[t] == max(season)) + 1)
                 % period)
    trough = float((min(t for t in range(n) if season[t] == min(season)) + 1)
                   % period)
    return {
        "trend_strength": trend_strength,
        f"seasonal_strength_{period}": seasonal_strength,
        f"seasonal_peak_{period}": peak,
        f"seasonal_trough_{period}": trough,
        "spikiness": spikiness,
        "linearity": linearity,
        "curvature": curvature,
        "stl_e_acf1": rho[0],
        "stl_e_acf10": acf10,
    }


@register_feature("feat_stl", ("stl", "trend", "seasonal", "decomposition"))
def feat_stl(x: np.ndarray, period: int = 1, s_window: int = 11, **stl_kwargs) -> dict[str, float]:
    """STL-based strength/shape features (features.R:49-119): trend/seasonal
    strength (variance ratios clamped to [0,1]), seasonal peak/trough
    position mod period, spikiness (variance of leave-one-out variances),
    linearity/curvature (orthogonal-poly coefs of the trend), residual
    acf1 and sum-of-squares acf10. Seasonality skipped when
    len(x) <= 2*period; longest contiguous non-NA run is used."""
    x = np.asarray(x, dtype=np.float64)
    if (period > 1 and len(x) > 2 * period and not stl_kwargs
            and not np.isnan(x).any() and _exact_int_ok(x)):
        from .stl import stl_exact_applicable, stl_exact_config

        cfg = stl_exact_config(period, s_window)
        if stl_exact_applicable(x, cfg):
            return _feat_stl_exact(x, period, cfg)
    season_args = {}
    if len(x) > period * 2 and period > 1:
        season_args[str(period)] = {"period": period, "s_window": s_window}
    ok = ~np.isnan(x)
    if not ok.any():
        return {"trend_strength": math.nan}
    if (~ok).any():
        lo, hi = longest_contiguous_run(ok)
        x = x[lo:hi]
    else:
        lo = 0
    dcmp = estimate_stl(x, season_args=season_args, **stl_kwargs)
    trend = dcmp["trend"]
    remainder = dcmp["remainder"]
    season_adjust = dcmp["season_adjust"]
    seasonalities = {k[len("season_"):]: v for k, v in dcmp.items() if k.startswith("season_") and k != "season_adjust"}

    var_e = var_narm(remainder)
    n = len(x)

    d = (remainder - mean_narm(remainder)) ** 2
    var_loo = (var_e * (n - 1) - d) / (n - 2) if n > 2 else np.full(n, math.nan)
    spikiness = var_narm(var_loo)

    if n >= 3:
        P = poly_orthogonal(n, 2)
        linearity = float(P[:, 0] @ trend)
        curvature = float(P[:, 1] @ trend)
    else:
        linearity = curvature = math.nan

    denom = var_narm(season_adjust)
    trend_strength = max(0.0, min(1.0, 1.0 - var_e / denom)) if denom and not math.isnan(denom) else math.nan

    out = {"trend_strength": trend_strength}
    for name, seas in seasonalities.items():
        v = var_narm(remainder + seas)
        out[f"seasonal_strength_{name}"] = (
            max(0.0, min(1.0, 1.0 - var_e / v)) if v and not math.isnan(v) else math.nan
        )
    for name, seas in seasonalities.items():
        out[f"seasonal_peak_{name}"] = float((int(np.argmax(seas)) + 1 + lo) % period)
    for name, seas in seasonalities.items():
        out[f"seasonal_trough_{name}"] = float((int(np.argmin(seas)) + 1 + lo) % period)
    out["spikiness"] = spikiness
    out["linearity"] = linearity
    out["curvature"] = curvature
    acf_r = acf(remainder, lag_max=max(10, period))
    out["stl_e_acf1"] = float(acf_r[1]) if len(acf_r) > 1 else math.nan
    upper = min(11, len(acf_r))
    out["stl_e_acf10"] = float(np.sum(acf_r[1:upper] ** 2))
    return out


@register_feature("unitroot_kpss", ("test", "unitroot"), uses_period=False)
def feat_unitroot_kpss(x: np.ndarray, period: int = 1) -> dict[str, float]:
    from .unitroot import unitroot_kpss

    return unitroot_kpss(np.asarray(x, dtype=np.float64))


@register_feature("unitroot_pp", ("test", "unitroot"), uses_period=False)
def feat_unitroot_pp(x: np.ndarray, period: int = 1) -> dict[str, float]:
    from .unitroot import unitroot_pp

    return unitroot_pp(np.asarray(x, dtype=np.float64))


@register_feature("unitroot_ndiffs", ("test", "unitroot"), uses_period=False)
def unitroot_ndiffs(x: np.ndarray, period: int = 1, alpha: float = 0.05) -> dict[str, float]:
    """Min d in {0,1,2} for stationarity by KPSS p-value (features.R:181-203;
    candidate-set semantics mirrored exactly: ndiffs = max of differences
    whose predicate holds, prefixed by 0)."""
    from .unitroot import unitroot_kpss

    x = np.asarray(x, dtype=np.float64)
    differences = [d for d in (0, 1, 2) if not np.all(np.isnan(diff(x, differences=d)) if d else np.isnan(x))]
    candidates = [differences[0]] if differences else [0]
    for d in differences[1:]:
        p = unitroot_kpss(diff(x, differences=d - 1))["kpss_pvalue"]
        if not math.isnan(p) and p < alpha:
            candidates.append(d)
    return {"ndiffs": float(max(candidates))}


@register_feature("unitroot_nsdiffs", ("test", "seasonal", "unitroot"))
def unitroot_nsdiffs(x: np.ndarray, period: int = 1, alpha: float = 0.05) -> dict[str, float]:
    """Min seasonal D by the feat_stl seasonal-strength >= 0.64 rule
    (features.R:209-235)."""
    if period == 1:
        return {"nsdiffs": 0.0}
    x = np.asarray(x, dtype=np.float64)

    def strength_rule(v: np.ndarray) -> bool:
        vals = list(feat_stl(v, period).values())
        # reference indexes feat_stl(.)[2]: the second element of the vector
        second = vals[1] if len(vals) > 1 else math.nan
        return (not math.isnan(second)) and second >= 0.64

    differences = [d for d in (0, 1, 2) if not np.all(np.isnan(diff(x, lag=period, differences=d)) if d else np.isnan(x))]
    candidates = [differences[0]] if differences else [0]
    for d in differences[1:]:
        if strength_rule(diff(x, lag=period, differences=d - 1)):
            candidates.append(d)
    return {"nsdiffs": float(max(candidates))}


def _cut_codes(x: np.ndarray, breaks: int = 10) -> np.ndarray:
    """R cut(x, breaks, include.lowest=TRUE, labels=FALSE): equal-width
    bins over [min, max] with outer limits pushed out by 0.1% of range."""
    lo, hi = np.nanmin(x), np.nanmax(x)
    rng = hi - lo
    if rng == 0:
        rng = abs(lo) if lo != 0 else 1.0
        edges = np.linspace(lo - rng * 0.001, hi + rng * 0.001, breaks + 1)
    else:
        edges = np.linspace(lo, hi, breaks + 1)
        edges[0] -= rng * 0.001
        edges[-1] += rng * 0.001
    return np.digitize(x, edges[1:-1], right=True)


@register_feature("longest_flat_spot", ("count", "rle"), uses_period=False)
def longest_flat_spot(x: np.ndarray, period: int = 1) -> dict[str, float]:
    """Max run length within any of 10 equal-width bins (features.R:349-353)."""
    codes = _cut_codes(np.asarray(x, dtype=np.float64))
    _, lengths = rle(codes)
    return {"longest_flat_spot": float(lengths.max()) if len(lengths) else math.nan}


def _arfima_neg2loglik(xc: np.ndarray, d: float) -> float:
    """-2 profile log-likelihood (up to constants) of ARFIMA(0,d,0) for a
    demeaned series, via the Durbin-Levinson innovations decomposition
    with Hosking's (1981) closed-form fractional-noise PACF
    phi_kk = d/(k-d):  n*log(ssq/n) + sum log nu_t  (sigma^2 profiled)."""
    n = len(xc)
    e0 = xc[0]
    ssq = e0 * e0
    logdet = 0.0
    nu = 1.0
    phi_prev = np.empty(0)
    for k in range(1, n):
        pk = d / (k - d)
        if k == 1:
            new = np.array([pk])
        else:
            new = np.concatenate([phi_prev - pk * phi_prev[::-1], [pk]])
        nu *= 1.0 - pk * pk
        err = xc[k] - float(np.dot(new, xc[k - 1::-1]))
        ssq += err * err / nu
        logdet += math.log(nu)
        phi_prev = new
    return n * math.log(ssq / n) + logdet


@register_feature("coef_hurst", ("coefficients",), uses_period=False)
def coef_hurst(x: np.ndarray, period: int = 1) -> dict[str, float]:
    """Hurst = d + 0.5 on the longest contiguous run (features.R:372-376).

    The reference calls fracdiff::fracdiff(x, 0, 0) (Haslett & Raftery
    1989 approximate MLE). Here d is the EXACT Gaussian MLE for
    ARFIMA(0,d,0): Durbin-Levinson innovations likelihood with Hosking's
    closed-form PACF d/(k-d), minimized by Brent on (-0.5, 0.5) — the
    same model/quantity, the exact rather than approximate likelihood.
    Documented deviation, MEASURED: tests/test_functions.py pins the
    innovations likelihood == the full Toeplitz-Cholesky Gaussian
    likelihood (1e-13 relative) and the |d| gap to the H&R truncated
    likelihood (fracdiff's M=100 scheme) at 0.0003-0.0073 (< 0.01)
    across d in [-0.2, 0.42] — the engine differs from the reference by
    at most the published approximation's own error, in the exact
    direction.

    O(n^2) per likelihood eval; series longer than 2048 use the longest
    contiguous run's last 2048 points (d is a long-memory parameter —
    tail truncation is standard for the quadratic exact MLE)."""
    x = na_contiguous(np.asarray(x, dtype=np.float64))
    n = len(x)
    if n < 16 or np.all(x == x[0]):
        return {"coef_hurst": math.nan}
    if n > 2048:
        x = x[-2048:]
    xc = x - x.mean()
    from .stats_utils import brent_minimize

    d = brent_minimize(lambda dd: _arfima_neg2loglik(xc, dd),
                       -0.49999, 0.49999)
    return {"coef_hurst": float(d + 0.5)}


def _roll_mean_trailing(x: np.ndarray, size: int) -> np.ndarray:
    """slider::slide_dbl(x, mean, .before=size-1, na.rm=TRUE): trailing
    window, partial at the start, NaN-ignoring."""
    x = np.asarray(x, dtype=np.float64)
    ok = ~np.isnan(x)
    xs = np.where(ok, x, 0.0)
    cs = np.concatenate([[0.0], np.cumsum(xs)])
    cn = np.concatenate([[0], np.cumsum(ok)])
    idx = np.arange(len(x))
    start = np.maximum(0, idx - size + 1)
    s = cs[idx + 1] - cs[start]
    c = cn[idx + 1] - cn[start]
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(c > 0, s / c, np.nan)


def _roll_var_trailing(x: np.ndarray, size: int) -> np.ndarray:
    """Trailing rolling sample variance (ddof=1), partial windows, na.rm."""
    x = np.asarray(x, dtype=np.float64)
    ok = ~np.isnan(x)
    xs = np.where(ok, x, 0.0)
    cs = np.concatenate([[0.0], np.cumsum(xs)])
    cs2 = np.concatenate([[0.0], np.cumsum(xs * xs)])
    cn = np.concatenate([[0], np.cumsum(ok)])
    idx = np.arange(len(x))
    start = np.maximum(0, idx - size + 1)
    s = cs[idx + 1] - cs[start]
    s2 = cs2[idx + 1] - cs2[start]
    c = (cn[idx + 1] - cn[start]).astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        v = (s2 - s * s / c) / (c - 1)
    v[c < 2] = np.nan
    return v


@register_feature("shift_level_max", ("roll", "slide"))
def shift_level_max(x: np.ndarray, period: int = 1, size: int | None = None) -> dict[str, float]:
    """Largest |mean shift| between trailing windows .size apart
    (features.R:395-417)."""
    if size is None:
        size = 10 if period == 1 else period
    rollmean = _roll_mean_trailing(x, size)
    means = np.abs(rollmean[size:] - rollmean[:-size])
    if len(means) == 0:
        return {"shift_level_max": 0.0, "shift_level_index": math.nan}
    if np.all(np.isnan(means)):
        return {"shift_level_max": math.nan, "shift_level_index": math.nan}
    return {
        "shift_level_max": float(np.nanmax(means)),
        "shift_level_index": float(int(np.nanargmax(means)) + 2),  # R which.max + 1, 1-based
    }


@register_feature("shift_var_max", ("roll", "slide"))
def shift_var_max(x: np.ndarray, period: int = 1, size: int | None = None) -> dict[str, float]:
    """Largest |variance shift| between trailing windows (features.R:421-444)."""
    if size is None:
        size = 10 if period == 1 else period
    rollvar = _roll_var_trailing(x, size)
    vars_ = np.abs(rollvar[size:] - rollvar[:-size])
    if len(vars_) == 0:
        return {"shift_var_max": 0.0, "shift_var_index": math.nan}
    if np.all(np.isnan(vars_)):
        return {"shift_var_max": math.nan, "shift_var_index": math.nan}
    return {
        "shift_var_max": float(np.nanmax(vars_)),
        "shift_var_index": float(int(np.nanargmax(vars_)) + 2),
    }


@register_feature("shift_kl_max", ("roll", "slide"))
def shift_kl_max(x: np.ndarray, period: int = 1, size: int | None = None) -> dict[str, float]:
    """Largest jump in KL divergence between KDE-smoothed densities of
    consecutive windows (features.R:448-487): 100-point grid, nrd0
    bandwidth, density floor dnorm(38)."""
    x = np.asarray(x, dtype=np.float64)
    if size is None:
        size = 10 if period == 1 else period
    n = len(x)
    if n <= 2 * size:
        return {"shift_kl_max": math.nan, "shift_kl_index": math.nan}
    gw = 100
    lo, hi = np.nanmin(x), np.nanmax(x)
    xgrid = np.linspace(lo, hi, gw)
    grid = xgrid[1] - xgrid[0] if gw > 1 else 0.0
    bw = bw_nrd0(x[~np.isnan(x)])
    floor = float(norm_pdf(np.array([38.0]))[0])
    # densities[g, t] = max(dnorm(xgrid[g]; x[t], bw), dnorm(38))
    dens = np.maximum(norm_pdf(xgrid[:, None], mean=x[None, :], sd=bw), floor)
    # trailing rolling mean over t for each grid row, computed DIRECTLY
    # per window (like R's slider::slide_dbl(mean)): a cumsum-difference
    # rolling mean catastrophically cancels to exact 0 when a window of
    # ~1e-300 floor densities sits inside a cumsum of O(1) values, which
    # then makes log(b) = -inf and kl = inf (seen on WWWusage)
    rmean = np.empty_like(dens)
    for t in range(n):
        rmean[:, t] = dens[:, max(0, t - size + 1):t + 1].mean(axis=1)
    a = rmean[:, : n - size]
    b = rmean[:, size:]
    with np.errstate(invalid="ignore", divide="ignore"):
        kl = np.nansum(a * (np.log(a) - np.log(b)) * grid, axis=0)
    diffkl = np.diff(kl)
    if len(diffkl) == 0:
        return {"shift_kl_max": 0.0, "shift_kl_index": math.nan}
    return {
        "shift_kl_max": float(np.nanmax(diffkl)),
        "shift_kl_index": float(int(np.nanargmax(diffkl)) + 2),
    }


@register_feature("feat_spectral", ("spectral",))
def feat_spectral(x: np.ndarray, period: int = 1) -> dict[str, float]:
    """Shannon spectral entropy of the Burg AR spectrum (features.R:528-545)."""
    return {"spectral_entropy": spectral_entropy(np.asarray(x, dtype=np.float64), period)}


def _tile_stats(x: np.ndarray, size: int, stat: str, complete: bool) -> np.ndarray:
    vals = []
    for s in range(0, len(x), size):
        tile = x[s : s + size]
        if complete and len(tile) < size:
            continue
        t = tile[~np.isnan(tile)]
        if stat == "mean":
            vals.append(t.mean() if len(t) else math.nan)
        else:
            vals.append(t.var(ddof=1) if len(t) > 1 else math.nan)
    return np.asarray(vals, dtype=np.float64)


def _seq_var(tiles: list[float]) -> float:
    """Sample variance of an ordered float list via strictly sequential
    power-sum accumulation — mirrored by the oracle's
    list_sum(list(... ORDER BY tile)) which also folds left-to-right."""
    k = len(tiles)
    if k < 2:
        return math.nan
    sm = 0.0
    sq = 0.0
    for t in tiles:
        sm = sm + t
        sq = sq + t * t
    return (sq - sm * (sm / k)) / (k - 1)


def _var_tiled_exact_int(x: np.ndarray, size: int, stat: str,
                         complete: bool) -> float:
    """Exact-int tiled variance: every per-tile statistic is ONE fixed
    IEEE expression over exact integer tile power sums (S_t, SS_t, c_t)
    and the global (mu, sd); the across-tile variance uses sequential
    accumulation. Bit-reproducible by the features_exact_1h oracle."""
    xi = np.rint(x).astype(np.int64)
    mu, v_all = _var_mean_exact_int(xi)
    sd = math.sqrt(v_all)
    tiles: list[float] = []
    for s in range(0, len(xi), size):
        tile = xi[s: s + size]
        if complete and len(tile) < size:
            continue
        c = len(tile)
        S_t = int(tile.sum())
        if stat == "mean":
            tiles.append((S_t / c - mu) / sd)
        else:
            if c < 2:
                tiles.append(math.nan)
                continue
            SS_t = int(np.dot(tile, tile))
            vt = (SS_t - S_t * (S_t / c)) / (c - 1)
            tiles.append((vt / sd) / sd)
    tiles = [t for t in tiles if not math.isnan(t)]
    return _seq_var(tiles)


@register_feature("var_tiled_var", ("lumpiness", "tile"))
def var_tiled_var(x: np.ndarray, period: int = 1, size: int | None = None) -> dict[str, float]:
    """Lumpiness: variance of per-tile variances of the scaled series
    (features.R:562-576); 0 when fewer than 2 full tiles. Integral
    series route through exact integer power sums (SQL-bit-exact)."""
    x = np.asarray(x, dtype=np.float64)
    if size is None:
        size = 10 if period == 1 else period
    if len(x) < 2 * size:
        return {"var_tiled_var": 0.0}
    if _exact_int_ok(x) and var_narm(x) > 0:
        return {"var_tiled_var": _var_tiled_exact_int(x, size, "var", True)}
    mu, sd = mean_narm(x), sd_narm(x)
    z = (x - mu) / sd if sd else x - mu
    tiles = _tile_stats(z, size, "var", complete=True)
    return {"var_tiled_var": var_narm(tiles)}


@register_feature("var_tiled_mean", ("stability", "tile"))
def var_tiled_mean(x: np.ndarray, period: int = 1, size: int | None = None) -> dict[str, float]:
    """Stability: variance of per-tile means (features.R:580-595); partial
    trailing tile included (mirrors slide .step without .complete).
    Integral series route through exact integer power sums."""
    x = np.asarray(x, dtype=np.float64)
    if size is None:
        size = 10 if period == 1 else period
    if len(x) < 2 * size:
        return {"var_tiled_mean": 0.0}
    if _exact_int_ok(x) and var_narm(x) > 0:
        return {"var_tiled_mean": _var_tiled_exact_int(x, size, "mean", False)}
    mu, sd = mean_narm(x), sd_narm(x)
    z = (x - mu) / sd if sd else x - mu
    tiles = _tile_stats(z, size, "mean", complete=False)
    return {"var_tiled_mean": var_narm(tiles)}


def _fold_sq(r: np.ndarray, lo: int, hi: int) -> float:
    """Ordered left fold of squares (mirrored by the SQL oracle's
    left-associated chain; np.sum's pairwise order is not)."""
    acc = 0.0
    for k in range(lo, hi):
        acc += r[k] * r[k]
    return acc


@register_feature("feat_acf", ("acf", "autocorrelation"))
def feat_acf(x: np.ndarray, period: int = 1, lag_max: int | None = None) -> dict[str, float]:
    """acf1 / sum-of-squares acf10 for x, diff(x), diff2(x) (+ seasonal lag)
    (features.R:616-653). Integral series route through the exact
    power-sum ACF with ordered square-sum folds (SQL-bit-exact)."""
    x = np.asarray(x, dtype=np.float64)
    # diff2 values reach 4*max|x| -> its power sums 16x the gate's bound
    if (_exact_int_ok(x) and len(x) > 3
            and 16.0 * len(x) * float(np.abs(x).max()) ** 2 < 2**62):
        from .acf import acf_exact_int

        xi = np.rint(x).astype(np.int64)
        d1 = np.diff(xi)
        d2 = np.diff(d1)
        lmx = lag_max or max(period, 10)
        acfx = acf_exact_int(xi, min(lmx, len(xi) - 1))
        acfd1 = acf_exact_int(d1, min(lag_max or 10, len(d1) - 1))
        acfd2 = acf_exact_int(d2, min(lag_max or 10, len(d2) - 1))
        out = {
            "acf1": float(acfx[1]),
            "acf10": _fold_sq(acfx, 1, min(11, len(acfx))),
            "diff1_acf1": float(acfd1[1]),
            "diff1_acf10": _fold_sq(acfd1, 1, len(acfd1)),
            "diff2_acf1": float(acfd2[1]),
            "diff2_acf10": _fold_sq(acfd2, 1, len(acfd2)),
        }
        if period > 1 and len(acfx) > period:
            out["season_acf1"] = float(acfx[period])
        return out
    acfx = acf(x, lag_max=lag_max or max(period, 10))
    acfd1 = acf(diff(x), lag_max=lag_max or 10)
    acfd2 = acf(diff(x, differences=2), lag_max=lag_max or 10)
    out = {
        "acf1": float(acfx[1]),
        "acf10": float(np.sum(acfx[1 : min(11, len(acfx))] ** 2)),
        "diff1_acf1": float(acfd1[1]),
        "diff1_acf10": float(np.sum(acfd1[1:] ** 2)),
        "diff2_acf1": float(acfd2[1]),
        "diff2_acf10": float(np.sum(acfd2[1:] ** 2)),
    }
    if period > 1 and len(acfx) > period:
        out["season_acf1"] = float(acfx[period])
    return out


@register_feature("feat_pacf", ("pacf", "autocorrelation"))
def feat_pacf(x: np.ndarray, period: int = 1, lag_max: int | None = None) -> dict[str, float]:
    """Sum of squares of first 5 pacfs for x, diff, diff2 (+ seasonal)
    (features.R:669-695). Integral series route through the exact
    power-sum ACF + sequential Durbin-Levinson with ordered folds
    (SQL-bit-exact; recursive-CTE oracle)."""
    x = np.asarray(x, dtype=np.float64)
    lm = lag_max or max(period, 5)
    if (_exact_int_ok(x) and len(x) > 3
            and 16.0 * len(x) * float(np.abs(x).max()) ** 2 < 2**62):
        from .acf import acf_exact_int, pacf_from_acf_seq

        xi = np.rint(x).astype(np.int64)
        d1 = np.diff(xi)
        d2 = np.diff(d1)

        def _p(v):
            k = min(lm, len(v) - 1)
            return pacf_from_acf_seq(acf_exact_int(v, k), k)

        px, pd1_, pd2_ = _p(xi), _p(d1), _p(d2)
        out = {
            "pacf5": _fold_sq(px, 0, min(5, len(px))),
            "diff1_pacf5": _fold_sq(pd1_, 0, min(5, len(pd1_))),
            "diff2_pacf5": _fold_sq(pd2_, 0, min(5, len(pd2_))),
        }
        if period > 1 and len(px) >= period:
            out["season_pacf"] = float(px[period - 1])
        return out
    px = pacf(x, lag_max=lm)
    pd1 = pacf(diff(x), lag_max=lm)
    pd2 = pacf(diff(x, differences=2), lag_max=lm)
    out = {
        "pacf5": float(np.sum(px[:5] ** 2)),
        "diff1_pacf5": float(np.sum(pd1[:5] ** 2)),
        "diff2_pacf5": float(np.sum(pd2[:5] ** 2)),
    }
    if period > 1 and len(px) >= period:
        out["season_pacf"] = float(px[period - 1])
    return out


from .stats_utils import exact_int_ok as _exact_int_ok  # shared gate


def _var_mean_exact_int(xi: np.ndarray) -> tuple[float, float]:
    """(mean, sample var) of an int array as ONE fixed IEEE expression
    over exact integer power sums — bit-reproducible by a SQL oracle
    evaluating  m = S/n;  v = (SS - S*m)/(n-1)."""
    nn = len(xi)
    S = int(xi.sum())
    SS = int(np.dot(xi, xi))
    m = S / nn
    v = (SS - S * m) / (nn - 1) if nn > 1 else math.nan
    return m, v


@register_feature("feat_intermittent", ("intermittent",), uses_period=False)
def feat_intermittent(x: np.ndarray, period: int = 1) -> dict[str, float]:
    """Intermittency measures (features.R:716-726).

    zero-run / proportion outputs are single int/int divisions (already
    SQL-exact); for integral series the nonzero CV² routes through exact
    integer power sums so the DuckDB oracle is bit-exact."""
    x = np.asarray(x, dtype=np.float64)
    vals, lengths = rle(x)
    nonzero = x[x != 0]
    zero_runs = lengths[vals == 0]
    if len(nonzero) and _exact_int_ok(nonzero):
        mu_nz, v_nz = _var_mean_exact_int(np.rint(nonzero).astype(np.int64))
        sd_nz = math.sqrt(v_nz) if not math.isnan(v_nz) else math.nan
    else:
        sd_nz = sd_narm(nonzero) if len(nonzero) else math.nan
        mu_nz = mean_narm(nonzero) if len(nonzero) else math.nan
    if mu_nz not in (0,) and not math.isnan(mu_nz):
        ratio = sd_nz / mu_nz
        cv2 = ratio * ratio  # x*x, not pow(): mirrored by the SQL oracle
    else:
        cv2 = math.nan
    return {
        "zero_run_mean": 0.0 if len(nonzero) == len(x) else (float(zero_runs.mean()) if len(zero_runs) else math.nan),
        "nonzero_squared_cv": cv2,
        "zero_start_prop": float(lengths[0] / len(x)) if len(vals) and vals[0] == 0 else 0.0,
        "zero_end_prop": float(lengths[-1] / len(x)) if len(vals) and vals[-1] == 0 else 0.0,
    }


@register_feature("guerrero", ("optimisation", "boxcox"))
def guerrero(x: np.ndarray, period: int = 1, lower: float = -0.9, upper: float = 2.0) -> dict[str, float]:
    """Guerrero's (1993) Box-Cox lambda: minimize the CV of per-subseries
    sd/mean^(1-lambda) over tail-aligned subseries of width period
    (guerrero.R:30-60); constant series -> lambda = 1."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) == 0 or np.all(x == x[0]):
        return {"lambda_guerrero": 1.0}
    p = max(2, period)
    n_obs = len(x)
    n_sub = n_obs // p
    if n_sub < 2:
        return {"lambda_guerrero": math.nan}
    tail = x[n_obs - n_sub * p :]
    mat = tail.reshape(n_sub, p).T  # column = one subseries (R column-major)

    mu = np.nanmean(mat, axis=0)
    sig = np.nanstd(mat, axis=0, ddof=1)

    def cv(lam: float) -> float:
        with np.errstate(invalid="ignore", divide="ignore"):
            rat = sig / mu ** (1.0 - lam)
        m = np.nanmean(rat)
        s = np.nanstd(rat, ddof=1)
        return s / m if m else math.inf

    lam = brent_minimize(cv, lower, upper)
    return {"lambda_guerrero": float(lam)}


def _portmanteau_r(x: np.ndarray, lag: int) -> tuple[np.ndarray, bool]:
    """ACF for the portmanteau stats; integral series route through the
    exact power-sum kernel (SQL-bit-exact r_k)."""
    if _exact_int_ok(x):
        from .acf import acf_exact_int

        return acf_exact_int(np.rint(x).astype(np.int64),
                             min(lag, len(x) - 1)), True
    return acf(x, lag_max=lag), False


@register_feature("ljung_box", ("test", "portmanteau"), uses_period=False)
def ljung_box(x: np.ndarray, period: int = 1, lag: int = 1, dof: int = 0) -> dict[str, float]:
    """Ljung-Box Q and chi-square p-value (tests.R:19-22)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    r, exact = _portmanteau_r(x, lag)
    if exact:
        # ordered fold mirrored by the SQL oracle's list_sum chain
        acc = 0.0
        for kk in range(1, min(lag, n - 1) + 1):
            acc += (r[kk] * r[kk]) / (n - kk)
        stat = (n * (n + 2)) * acc
    else:
        k = np.arange(1, lag + 1)
        stat = float(n * (n + 2) * np.sum(r[1 : lag + 1] ** 2 / (n - k)))
    return {"lb_stat": stat, "lb_pvalue": chi2_sf(stat, lag - dof)}


@register_feature("box_pierce", ("test", "portmanteau"), uses_period=False)
def box_pierce(x: np.ndarray, period: int = 1, lag: int = 1, dof: int = 0) -> dict[str, float]:
    """Box-Pierce Q and p-value (tests.R:28-31)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    r, exact = _portmanteau_r(x, lag)
    if exact:
        acc = 0.0
        for kk in range(1, min(lag, n - 1) + 1):
            acc += r[kk] * r[kk]
        stat = n * acc
    else:
        stat = float(n * np.sum(r[1 : lag + 1] ** 2))
    return {"bp_stat": stat, "bp_pvalue": chi2_sf(stat, lag - dof)}


# composite set mirroring portmanteau_tests (tests.R:35)
PORTMANTEAU_TESTS = (ljung_box, box_pierce)


@register_feature("n_flat_spots", ("count", "rle"), uses_period=False)
def n_flat_spots(x: np.ndarray, period: int = 1) -> dict[str, float]:
    """Deprecated alias of longest_flat_spot (R/features.R:356-359)."""
    return {"n_flat_spots": longest_flat_spot(x, period)["longest_flat_spot"]}


@register_feature("portmanteau_tests", ("test", "portmanteau"), uses_period=False)
def portmanteau_tests(x: np.ndarray, period: int = 1, lag: int = 1,
                      dof: int = 0) -> dict[str, float]:
    """Composite [ljung_box, box_pierce] feature set (R/tests.R:35)."""
    out = ljung_box(x, period, lag=lag, dof=dof)
    out.update(box_pierce(x, period, lag=lag, dof=dof))
    return out
