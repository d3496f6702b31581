"""Unit-root tests: KPSS and Phillips-Perron (Z-tau), reimplemented from
the published tests (Kwiatkowski, Phillips, Schmidt & Shin 1992; Phillips &
Perron 1988) with the same knobs the reference uses through urca
(/root/reference/R/features.R:139-159): lag truncation "short" =
trunc(4*(n/100)^0.25), Bartlett-kernel long-run variance, p-values by
linear interpolation of the tabulated critical values (approx rule=2)."""

from __future__ import annotations

import math

import numpy as np

from .stats_utils import approx_clamped

# KPSS critical values (KPSS 1992 Table 1), columns 10%, 5%, 2.5%, 1%
_KPSS_CVAL = {
    "mu": np.array([0.347, 0.463, 0.574, 0.739]),
    "tau": np.array([0.119, 0.146, 0.176, 0.216]),
}
_KPSS_PCT = np.array([0.10, 0.05, 0.025, 0.01])

# Dickey-Fuller tau_mu critical values (Fuller 1976, as used for PP with a
# constant), rows n = 25, 50, 100, 250, 500, inf; columns 1%, 5%, 10%.
_DF_TAU_MU_N = np.array([25, 50, 100, 250, 500, 100000], dtype=np.float64)
_DF_TAU_MU = np.array(
    [
        [-3.75, -3.00, -2.63],
        [-3.58, -2.93, -2.60],
        [-3.51, -2.89, -2.58],
        [-3.46, -2.88, -2.57],
        [-3.44, -2.87, -2.57],
        [-3.43, -2.86, -2.57],
    ]
)
_DF_PCT = np.array([0.01, 0.05, 0.10])

# Dickey-Fuller normalized-bias (rho_mu) critical values for the Z-alpha
# statistic, constant-mean case (Fuller 1976, Table 8.5.1) — the Z-alpha
# statistic is n*(rho-1) corrected, NOT a t-ratio, so it needs its own
# table.
_DF_RHO_MU = np.array(
    [
        [-12.9, -7.7, -5.5],
        [-13.3, -7.9, -5.6],
        [-13.6, -8.0, -5.7],
        [-13.7, -8.1, -5.7],
        [-13.7, -8.1, -5.7],
        [-13.8, -8.1, -5.7],
    ]
)


def _bartlett_lrv(e: np.ndarray, lags: int) -> float:
    """Long-run variance with Bartlett weights: s^2 = (1/n)Σe² +
    (2/n)Σ_l w_l Σ_t e_t e_{t-l}, w_l = 1 - l/(lags+1)."""
    n = len(e)
    s2 = float(np.dot(e, e)) / n
    for l in range(1, lags + 1):
        w = 1.0 - l / (lags + 1.0)
        s2 += 2.0 / n * w * float(np.dot(e[l:], e[:-l]))
    return s2


def _short_lags(n: int) -> int:
    return int(math.trunc(4.0 * (n / 100.0) ** 0.25))


def _kpss_mu_exact_int(xi: np.ndarray, L: int) -> dict[str, float]:
    """KPSS level stat for an integer series as fixed IEEE expressions
    over exact integer power sums — bit-reproducible by the unitroot_1h
    DuckDB oracle:
      m   = S/n;  e2 = SS - S*m
      lrv = e2/n  +  sum_{l=1..L} ((2/n)*w_l) * dot_l   (ascending l)
      dot_l = (Sxy_l - m*(H_l + T_l)) + ((n-l)*m)*m     (acf_exact_int's
              lagged centered-product numerator)
      stat = [seq sum of ((C_k - k*m))^2] / ((n*n)*lrv)  (ordered fold,
              mirrored by list_sum over an ORDERED list in SQL)
    """
    n = len(xi)
    S = int(xi.sum())
    SS = int(np.dot(xi, xi))
    m = S / n
    e2 = SS - S * m
    s2 = e2 / n
    C = np.cumsum(xi)
    for l in range(1, L + 1):
        w = 1.0 - l / (L + 1.0)
        sxy = int(np.dot(xi[:-l], xi[l:]))
        h = int(C[n - l - 1])
        t_ = S - int(C[l - 1])
        dot_l = (sxy - m * (h + t_)) + ((n - l) * m) * m
        s2 = s2 + ((2.0 / n) * w) * dot_l
    if s2 <= 0:
        return {"kpss_stat": math.nan, "kpss_pvalue": math.nan}
    sv = C.astype(np.float64) - np.arange(1, n + 1, dtype=np.float64) * m
    acc = 0.0
    for v in sv.tolist():
        acc += v * v
    stat = acc / ((n * n) * s2)
    pval = approx_clamped(_KPSS_CVAL["mu"], _KPSS_PCT, stat)
    return {"kpss_stat": float(stat), "kpss_pvalue": pval}


def unitroot_kpss(x: np.ndarray, type_: str = "mu", lags: str | int = "short") -> dict[str, float]:
    """KPSS stat + interpolated p-value (kpss_stat, kpss_pvalue).

    Integer-valued series on the level ("mu") test route through the
    exact power-sum kernel so the DuckDB oracle is bit-exact."""
    from .stats_utils import exact_int_ok

    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    n = len(x)
    if n < 4:
        return {"kpss_stat": math.nan, "kpss_pvalue": math.nan}
    if isinstance(lags, str):
        if lags == "short":
            L = _short_lags(n)
        elif lags == "long":
            L = int(math.trunc(12.0 * (n / 100.0) ** 0.25))
        else:  # "nil"
            L = 0
    else:
        L = int(lags)
    if type_ == "mu" and exact_int_ok(x) and n * n * float(np.abs(x).max()) < 2**62:
        return _kpss_mu_exact_int(np.rint(x).astype(np.int64), L)
    if type_ == "mu":
        e = x - x.mean()
    else:  # tau: residuals of regression on a linear trend
        t = np.arange(1, n + 1, dtype=np.float64)
        X = np.column_stack([np.ones(n), t])
        beta, *_ = np.linalg.lstsq(X, x, rcond=None)
        e = x - X @ beta
    s = np.cumsum(e)
    lrv = _bartlett_lrv(e, L)
    if lrv <= 0:  # constant / perfectly-fit series
        return {"kpss_stat": math.nan, "kpss_pvalue": math.nan}
    stat = float(np.dot(s, s)) / (n * n * lrv)
    pval = approx_clamped(_KPSS_CVAL[type_], _KPSS_PCT, stat)
    return {"kpss_stat": stat, "kpss_pvalue": pval}


def _seq_dot_lagged(e: np.ndarray, l: int) -> float:
    """Strictly sequential sum of e[i]*e[i-l], i ascending — the ordered
    fold mirrored by list_sum over an ORDERED product list in SQL."""
    acc = 0.0
    ev = e.tolist()
    for i in range(l, len(ev)):
        acc += ev[i] * ev[i - l]
    return acc


def _pp_ztau_exact_int(xi: np.ndarray) -> dict[str, float]:
    """PP Z-tau (constant model) for an integer series via the CLOSED-
    FORM 2x2 OLS over exact integer power sums — every float op is a
    fixed expression mirrored by the unitroot_pp_1h DuckDB oracle:
      det = n*Sll - Sl*Sl (int);  b1 = (n*Syl - Sl*Sy)/det (one division)
      b0  = (Sy - b1*Sl)/n;  e_t = (y_t - b0) - b1*ylag_t
      ss_e / lagged sums by sequential folds; Bartlett lam2 chain;
      Z-tau per Phillips-Perron 1988; p by the two-stage interpolation.
    (The generic path's np.linalg.lstsq SVD is not SQL-reproducible.)"""
    y = xi[1:].astype(np.float64)
    yl = xi[:-1].astype(np.float64)
    n = len(y)
    n0 = n + 1
    yi, li = xi[1:], xi[:-1]
    Sy = int(yi.sum())
    Sl = int(li.sum())
    Sll = int(np.dot(li, li))
    Syl = int(np.dot(yi, li))
    det = n * Sll - Sl * Sl
    if det == 0:
        return {"pp_stat": math.nan, "pp_pvalue": math.nan}
    b1 = (n * Syl - Sl * Sy) / det
    b0 = (Sy - b1 * Sl) / n
    e = (y - b0) - b1 * yl
    ss_e = _seq_dot_lagged(e, 0)
    s2 = ss_e / (n - 2)
    if s2 <= 0:
        return {"pp_stat": math.nan, "pp_pvalue": math.nan}
    se_rho = math.sqrt(s2 * (n / det))
    t_stat = (b1 - 1.0) / se_rho
    L = _short_lags(n)
    gamma0 = ss_e / n
    lam2 = gamma0
    for l in range(1, L + 1):
        w = 1.0 - l / (L + 1.0)
        lam2 = lam2 + ((2.0 / n) * w) * _seq_dot_lagged(e, l)
    if lam2 <= 0:
        return {"pp_stat": math.nan, "pp_pvalue": math.nan}
    stat = math.sqrt(gamma0 / lam2) * t_stat - (lam2 - gamma0) * n * se_rho / (
        2.0 * math.sqrt(lam2) * math.sqrt(s2)
    )
    cvals = np.array([approx_clamped(_DF_TAU_MU_N, _DF_TAU_MU[:, j], n0)
                      for j in range(3)])
    pval = approx_clamped(cvals, _DF_PCT, stat)
    return {"pp_stat": float(stat), "pp_pvalue": float(pval)}


def unitroot_pp(
    x: np.ndarray, type_: str = "Z-tau", model: str = "constant", lags: str = "short"
) -> dict[str, float]:
    """Phillips-Perron test (Z-tau or Z-alpha) with constant trend.

    Integer series on the default Z-tau/constant path route through the
    closed-form exact power-sum kernel (SQL-bit-exact)."""
    from .stats_utils import exact_int_ok

    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    n0 = len(x)
    if n0 < 5:
        return {"pp_stat": math.nan, "pp_pvalue": math.nan}
    if (type_ == "Z-tau" and model == "constant" and lags == "short"
            and exact_int_ok(x)
            and n0 * n0 * float(np.abs(x).max()) ** 2 < 2**62):
        return _pp_ztau_exact_int(np.rint(x).astype(np.int64))
    y = x[1:]
    ylag = x[:-1]
    n = len(y)
    if model == "constant":
        X = np.column_stack([np.ones(n), ylag])
    else:  # trend
        t = np.arange(1, n + 1, dtype=np.float64)
        X = np.column_stack([np.ones(n), t - n / 2.0, ylag])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    e = y - X @ beta
    rho_idx = X.shape[1] - 1
    s2 = float(np.dot(e, e)) / (n - X.shape[1])
    if s2 <= 0:
        return {"pp_stat": math.nan, "pp_pvalue": math.nan}
    XtX_inv = np.linalg.pinv(X.T @ X)  # pinv: tolerate collinear regressors
    se_rho = math.sqrt(s2 * XtX_inv[rho_idx, rho_idx])
    rho = beta[rho_idx]
    t_stat = (rho - 1.0) / se_rho
    L = _short_lags(n) if lags == "short" else int(math.trunc(12.0 * (n / 100.0) ** 0.25))
    gamma0 = float(np.dot(e, e)) / n
    lam2 = _bartlett_lrv(e, L)
    if type_ == "Z-tau":
        stat = math.sqrt(gamma0 / lam2) * t_stat - (lam2 - gamma0) * n * se_rho / (
            2.0 * math.sqrt(lam2) * math.sqrt(s2)
        )
    else:  # Z-alpha
        stat = n * (rho - 1.0) - (lam2 - gamma0) / 2.0 * (n * se_rho) ** 2 / s2
    # interpolate the critical-value row for this sample size, then the
    # p-value; Z-alpha is a normalized-bias statistic with its own table
    table = _DF_TAU_MU if type_ == "Z-tau" else _DF_RHO_MU
    cvals = np.array([approx_clamped(_DF_TAU_MU_N, table[:, j], n0) for j in range(3)])
    pval = approx_clamped(cvals, _DF_PCT, stat)
    return {"pp_stat": float(stat), "pp_pvalue": float(pval)}
