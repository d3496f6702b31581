"""Cointegration tests (multivariate features): Phillips-Ouliaris
residual test and Johansen trace test, reimplemented from the published
methods (Phillips & Ouliaris 1990; Johansen 1991; Osterwald-Lenum 1992
critical values) — the reference exposes them through urca
(/root/reference/R/features.R:249-261, R/features.R:330-335).

These take a (n, m) matrix (multiple series for one key), so they sit
outside the univariate feature registry; `stages.features` callers pass
them explicitly via multivariate_features=... (or use them directly in a
map_groups kernel over several value columns).
"""

from __future__ import annotations

import math

import numpy as np

from .stats_utils import approx_clamped
from .unitroot import _bartlett_lrv, _short_lags

# Phillips-Ouliaris Z-alpha critical values for the demeaned case,
# by number of regressors m-1 = 1..5 (Phillips & Ouliaris 1990, Table Ia/IIa
# style), columns 10%, 5%, 1%.
_PO_CVAL = {
    1: np.array([-17.04, -20.49, -28.32]),
    2: np.array([-22.19, -26.09, -34.17]),
    3: np.array([-27.58, -32.06, -41.13]),
    4: np.array([-32.74, -37.15, -47.51]),
    5: np.array([-37.01, -41.94, -52.17]),
}
_PO_PCT = np.array([0.10, 0.05, 0.01])

# Johansen trace-statistic critical values, model with constant
# (Osterwald-Lenum 1992, Table 1*), rows = (p - r) = 1..5,
# columns 10%, 5%, 1%.
_JO_TRACE_CVAL = {
    1: np.array([2.69, 3.76, 6.65]),
    2: np.array([13.33, 15.41, 20.04]),
    3: np.array([26.79, 29.68, 35.65]),
    4: np.array([43.95, 47.21, 54.46]),
    5: np.array([64.84, 68.52, 76.07]),
}
_JO_PCT = np.array([0.10, 0.05, 0.01])


def cointegration_phillips_ouliaris(xm: np.ndarray) -> dict[str, float]:
    """P-O residual cointegration test on columns of xm (first column is
    the regressand). Returns (po_stat, po_pvalue); H0 = no cointegration."""
    xm = np.asarray(xm, dtype=np.float64)
    xm = xm[~np.isnan(xm).any(axis=1)]
    n, m = xm.shape
    if n < 10 or m < 2:
        return {"po_stat": math.nan, "po_pvalue": math.nan}
    y, X = xm[:, 0], xm[:, 1:]
    Xc = np.column_stack([np.ones(n), X])
    beta, *_ = np.linalg.lstsq(Xc, y, rcond=None)
    u = y - Xc @ beta
    # PP Z-alpha on the residuals (no constant: residuals are centred)
    u1, u0 = u[1:], u[:-1]
    denom = float(np.dot(u0, u0))
    if denom <= 0:
        return {"po_stat": math.nan, "po_pvalue": math.nan}
    rho = float(np.dot(u0, u1)) / denom
    e = u1 - rho * u0
    nn = len(e)
    gamma0 = float(np.dot(e, e)) / nn
    lam2 = _bartlett_lrv(e, _short_lags(nn))
    z_alpha = nn * (rho - 1.0) - (lam2 - gamma0) / 2.0 * nn * nn / denom
    cv = _PO_CVAL[min(m - 1, 5)]
    pval = approx_clamped(cv[::-1], _PO_PCT[::-1], z_alpha)
    return {"po_stat": float(z_alpha), "po_pvalue": float(pval)}


def cointegration_johansen(xm: np.ndarray, lag: int = 2) -> dict[str, float]:
    """Johansen trace test (VECM with constant, K=lag). Returns the trace
    statistic and p-value for rank r=0 (H0: no cointegration) plus the
    estimated cointegration rank at 5%."""
    xm = np.asarray(xm, dtype=np.float64)
    xm = xm[~np.isnan(xm).any(axis=1)]
    n, p = xm.shape
    lag = max(2, int(lag))
    if n < lag + p + 10 or p < 2:
        return {"johansen_trace": math.nan, "johansen_pvalue": math.nan,
                "johansen_rank": math.nan}
    dx = np.diff(xm, axis=0)                       # (n-1, p)
    # regress dX_t and X_{t-lag} on lagged differences + constant
    T = n - lag
    Z = [np.ones((T, 1))]
    for j in range(1, lag):
        Z.append(dx[lag - 1 - j: n - 1 - j])
    Z = np.hstack(Z)                                # (T, 1+(lag-1)p)
    d0 = dx[lag - 1:]                               # dX_t
    l1 = xm[: n - lag]                              # X_{t-lag}
    q, _ = np.linalg.qr(Z)
    R0 = d0 - q @ (q.T @ d0)
    R1 = l1 - q @ (q.T @ l1)
    S00 = R0.T @ R0 / T
    S11 = R1.T @ R1 / T
    S01 = R0.T @ R1 / T
    try:
        M = np.linalg.solve(S11, S01.T) @ np.linalg.solve(S00, S01)
        eig = np.sort(np.real(np.linalg.eigvals(M)))[::-1]
    except np.linalg.LinAlgError:
        return {"johansen_trace": math.nan, "johansen_pvalue": math.nan,
                "johansen_rank": math.nan}
    eig = np.clip(eig, 0.0, 1.0 - 1e-12)
    traces = [-T * float(np.sum(np.log(1.0 - eig[r:]))) for r in range(p)]
    cv0 = _JO_TRACE_CVAL[min(p, 5)]
    pval0 = approx_clamped(cv0, _JO_PCT, traces[0])
    # rank = first r whose trace stat is below its 5% critical value
    rank = p
    for r in range(p):
        cv = _JO_TRACE_CVAL[min(p - r, 5)]
        if traces[r] < cv[1]:
            rank = r
            break
    return {"johansen_trace": float(traces[0]), "johansen_pvalue": float(pval0),
            "johansen_rank": float(rank)}
