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
from .stats_utils import exact_int_ok as _exact_int_ok
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


def _interp3(xs, ys, v: float) -> float:
    """np.interp over a 3-knot ascending table with rule-2 clamps,
    written as the explicit branch/formula the SQL oracle emits (slope
    computed then slope*(v-x0)+y0, np.interp's own expression order)."""
    if v <= xs[0]:
        return float(ys[0])
    if v >= xs[2]:
        return float(ys[2])
    if v < xs[1]:
        return ((ys[1] - ys[0]) / (xs[1] - xs[0])) * (v - xs[0]) + ys[0]
    return ((ys[2] - ys[1]) / (xs[2] - xs[1])) * (v - xs[1]) + ys[1]


def _po_exact_int(ya: np.ndarray, xb: np.ndarray) -> dict[str, float]:
    """P-O test for an integer pair as fixed IEEE expressions: the 2x2
    OLS is closed-form over exact integer power sums, residuals are
    per-row fixed expressions, every float dot product folds
    sequentially in ascending row order, and the Bartlett long-run
    variance accumulates the same s2-chain as _bartlett_lrv — all
    mirrored term-for-term by oracle/cointegration_sql.py."""
    n = len(ya)
    Sy = int(ya.sum())
    Sx = int(xb.sum())
    Sxx = int(np.dot(xb, xb))
    Sxy = int(np.dot(ya, xb))
    det = n * Sxx - Sx * Sx
    if det == 0:
        return {"po_stat": math.nan, "po_pvalue": math.nan}
    b1 = float(n * Sxy - Sx * Sy) / float(det)
    b0 = (float(Sy) - b1 * float(Sx)) / n
    yl = ya.tolist()
    xl = xb.tolist()
    u = [(yl[t] - b0) - b1 * xl[t] for t in range(n)]
    denom = 0.0
    for t in range(n - 1):
        denom += u[t] * u[t]
    if denom <= 0:
        return {"po_stat": math.nan, "po_pvalue": math.nan}
    num = 0.0
    for t in range(n - 1):
        num += u[t] * u[t + 1]
    rho = num / denom
    e = [u[t + 1] - rho * u[t] for t in range(n - 1)]
    nn = n - 1
    ss_e = 0.0
    for t in range(nn):
        ss_e += e[t] * e[t]
    gamma0 = ss_e / nn
    L = int(math.trunc(4.0 * (nn / 100.0) ** 0.25))
    s2 = ss_e / nn
    for l in range(1, L + 1):
        w = 1.0 - l / (L + 1.0)
        d = 0.0
        for t in range(l, nn):
            d += e[t] * e[t - l]
        s2 = s2 + ((2.0 / nn) * w) * d
    lam2 = s2
    z_alpha = nn * (rho - 1.0) - ((((lam2 - gamma0) / 2.0) * nn) * nn) / denom
    cv = _PO_CVAL[1]
    pval = _interp3([cv[2], cv[1], cv[0]], [0.01, 0.05, 0.10], z_alpha)
    return {"po_stat": z_alpha, "po_pvalue": pval}


def cointegration_phillips_ouliaris(xm: np.ndarray) -> dict[str, float]:
    """P-O residual cointegration test on columns of xm (first column is
    the regressand). Returns (po_stat, po_pvalue); H0 = no cointegration.
    Integer pairs route through the SQL-mirrored exact kernel."""
    xm = np.asarray(xm, dtype=np.float64)
    xm = xm[~np.isnan(xm).any(axis=1)]
    n, m = xm.shape
    if n < 10 or m < 2:
        return {"po_stat": math.nan, "po_pvalue": math.nan}
    if m == 2 and _exact_int_ok(xm[:, 0]) and _exact_int_ok(xm[:, 1]):
        return _po_exact_int(np.rint(xm[:, 0]).astype(np.int64),
                             np.rint(xm[:, 1]).astype(np.int64))
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


_CLIP_HI = 1.0 - 1e-12


def _johansen_exact_int(a: np.ndarray, b: np.ndarray) -> dict[str, float]:
    """Johansen trace test for an integer pair (p=2, lag=2) as fixed
    IEEE expressions, mirrored term-for-term by the generated DuckDB
    oracle (oracle/cointegration_sql.py):

    - the QR projection is replaced by OLS residuals from the 3x3
      normal equations (exact integer Gram/moment sums, order-free),
      solved by a fully unrolled Cholesky (+-*/ and sqrt only);
    - residual cross-moments S00/S01/S11 fold sequentially in
      ascending row order;
    - the 2x2 eigenproblem is the closed-form quadratic formula
      (LAPACK eigvals is not reproducible in SQL);
    - logs go through libm (math.log == DuckDB ln on this host)."""
    nan3 = {"johansen_trace": math.nan, "johansen_pvalue": math.nan,
            "johansen_rank": math.nan}
    n = len(a)
    T = n - 2
    da = np.diff(a)
    db = np.diff(b)
    za, zb = da[:T], db[:T]          # dx_{t-1}
    tg = {"d0a": da[1:T + 1], "d0b": db[1:T + 1],  # dx_t
          "l1a": a[:T], "l1b": b[:T]}              # x_{t-lag}
    # exact integer normal equations (3 regressors: 1, za, zb)
    G = [[float(T), float(int(za.sum())), float(int(zb.sum()))],
         [0.0, float(int(np.dot(za, za))), float(int(np.dot(za, zb)))],
         [0.0, 0.0, float(int(np.dot(zb, zb)))]]
    G[1][0], G[2][0], G[2][1] = G[0][1], G[0][2], G[1][2]
    C = {k: [float(int(v.sum())), float(int(np.dot(za, v))),
             float(int(np.dot(zb, v)))] for k, v in tg.items()}
    # unrolled 3x3 Cholesky (ascending-k chains, archlm pattern)
    L = [[0.0] * 3 for _ in range(3)]
    for j in range(3):
        acc = G[j][j]
        for k in range(j):
            acc -= L[j][k] * L[j][k]
        if acc <= 0:
            return nan3
        L[j][j] = math.sqrt(acc)
        for i in range(j + 1, 3):
            acc = G[i][j]
            for k in range(j):
                acc -= L[i][k] * L[j][k]
            L[i][j] = acc / L[j][j]
    beta = {}
    for k, c in C.items():
        w = [0.0] * 3
        for i in range(3):
            acc = c[i]
            for k2 in range(i):
                acc -= L[i][k2] * w[k2]
            w[i] = acc / L[i][i]
        bt = [0.0] * 3
        for i in range(2, -1, -1):
            acc = w[i]
            for k2 in range(i + 1, 3):
                acc -= L[k2][i] * bt[k2]
            bt[i] = acc / L[i][i]
        beta[k] = bt
    # per-row residuals (fixed chains) + ascending sequential folds
    zal, zbl = za.tolist(), zb.tolist()
    res = {}
    for k, v in tg.items():
        bt = beta[k]
        vl = v.tolist()
        res[k] = [vl[t] - ((bt[0] + bt[1] * zal[t]) + bt[2] * zbl[t])
                  for t in range(T)]

    def fold(p_, q_):
        acc = 0.0
        for t in range(T):
            acc += p_[t] * q_[t]
        return acc

    s00aa = fold(res["d0a"], res["d0a"]) / T
    s00ab = fold(res["d0a"], res["d0b"]) / T
    s00bb = fold(res["d0b"], res["d0b"]) / T
    s11aa = fold(res["l1a"], res["l1a"]) / T
    s11ab = fold(res["l1a"], res["l1b"]) / T
    s11bb = fold(res["l1b"], res["l1b"]) / T
    s01aa = fold(res["d0a"], res["l1a"]) / T
    s01ab = fold(res["d0a"], res["l1b"]) / T
    s01ba = fold(res["d0b"], res["l1a"]) / T
    s01bb = fold(res["d0b"], res["l1b"]) / T
    det00 = s00aa * s00bb - s00ab * s00ab
    det11 = s11aa * s11bb - s11ab * s11ab
    if det00 == 0 or det11 == 0:
        return nan3
    # K = S00^{-1} S01 ; Q = S01^T K ; M = S11^{-1} Q  (row, col)
    k00 = (s00bb * s01aa - s00ab * s01ba) / det00
    k01 = (s00bb * s01ab - s00ab * s01bb) / det00
    k10 = (s00aa * s01ba - s00ab * s01aa) / det00
    k11 = (s00aa * s01bb - s00ab * s01ab) / det00
    q00 = s01aa * k00 + s01ba * k10
    q01 = s01aa * k01 + s01ba * k11
    q10 = s01ab * k00 + s01bb * k10
    q11 = s01ab * k01 + s01bb * k11
    m00 = (s11bb * q00 - s11ab * q10) / det11
    m01 = (s11bb * q01 - s11ab * q11) / det11
    m10 = (s11aa * q10 - s11ab * q00) / det11
    m11 = (s11aa * q11 - s11ab * q01) / det11
    tr = m00 + m11
    dt = m00 * m11 - m01 * m10
    disc = tr * tr - 4.0 * dt
    if disc >= 0.0:
        sq = math.sqrt(disc)
        lam1 = (tr + sq) / 2.0
        lam2 = (tr - sq) / 2.0
    else:
        lam1 = lam2 = tr / 2.0
    lam1 = min(max(lam1, 0.0), _CLIP_HI)
    lam2 = min(max(lam2, 0.0), _CLIP_HI)
    trace0 = -T * (math.log(1.0 - lam1) + math.log(1.0 - lam2))
    trace1 = -T * math.log(1.0 - lam2)
    cv0 = _JO_TRACE_CVAL[2]
    pval0 = _interp3([cv0[0], cv0[1], cv0[2]], [0.10, 0.05, 0.01], trace0)
    if trace0 < cv0[1]:
        rank = 0.0
    elif trace1 < _JO_TRACE_CVAL[1][1]:
        rank = 1.0
    else:
        rank = 2.0
    return {"johansen_trace": trace0, "johansen_pvalue": pval0,
            "johansen_rank": rank}


def cointegration_johansen(xm: np.ndarray, lag: int = 2) -> dict[str, float]:
    """Johansen trace test (VECM with constant, K=lag). Returns the trace
    statistic and p-value for rank r=0 (H0: no cointegration) plus the
    estimated cointegration rank at 5%. Integer pairs at the default
    lag route through the SQL-mirrored exact kernel."""
    xm = np.asarray(xm, dtype=np.float64)
    xm = xm[~np.isnan(xm).any(axis=1)]
    n, p = xm.shape
    lag = max(2, int(lag))
    if n < lag + p + 10 or p < 2:
        return {"johansen_trace": math.nan, "johansen_pvalue": math.nan,
                "johansen_rank": math.nan}
    if (p == 2 and lag == 2 and _exact_int_ok(xm[:, 0])
            and _exact_int_ok(xm[:, 1])):
        return _johansen_exact_int(np.rint(xm[:, 0]).astype(np.int64),
                                   np.rint(xm[:, 1]).astype(np.int64))
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
