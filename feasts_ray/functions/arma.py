"""AR model data layers for the gg_arma / gg_irf plot surfaces.

The reference plots (inverse) characteristic roots of a fitted model
(`/root/reference/R/graphics.R` gg_arma) and its impulse responses
(gg_irf). This engine has no fable model objects, so the data layers
take the AR coefficients fitted HERE by Durbin-Levinson on the exact
integer-power-sum ACF — every float operation below is a fixed IEEE
expression tree mirrored token-for-token by the DuckDB oracle
(oracle/arma_sql.py), making both query surfaces bit-exact.

All inner sums are strictly sequential (left-to-right), matching the
SQL's left-associated `+` chains and recursive-CTE folds.
"""

from __future__ import annotations

import math

import numpy as np


def ar_coefs_seq(rho: np.ndarray, p: int) -> list[float]:
    """AR(p) coefficients phi[1..p] via Durbin-Levinson with strictly
    sequential inner sums (the same recursion/expression tree as
    acf.pacf_from_acf_seq, returning the final coefficient VECTOR
    instead of the partials). ``rho`` holds lags 0..p with rho[0]==1."""
    phi_prev = [0.0] * (p + 1)
    phi_prev[1] = float(rho[1])
    for k in range(2, p + 1):
        s_num = 0.0
        s_den = 0.0
        for j in range(1, k):
            s_num += phi_prev[j] * float(rho[k - j])
            s_den += phi_prev[j] * float(rho[j])
        pk = (float(rho[k]) - s_num) / (1.0 - s_den)
        phi = [0.0] * (p + 1)
        for j in range(1, k):
            phi[j] = phi_prev[j] - pk * phi_prev[k - j]
        phi[k] = pk
        phi_prev = phi
    return phi_prev[1:]


def ar2_inverse_roots(phi1: float, phi2: float) -> list[tuple[float, float]]:
    """Inverse characteristic roots of an AR(2): the roots of
    z^2 - phi1*z - phi2 (gg_arma plots these inside the unit circle for
    a stationary fit). Closed-form quadratic — exact IEEE tree, no
    iterative root finder. Returns [(re, im), (re, im)], '+' branch
    first (deterministic order)."""
    disc = phi1 * phi1 + 4.0 * phi2
    if disc >= 0.0:
        s = math.sqrt(disc)
        return [((phi1 + s) / 2.0, 0.0), ((phi1 - s) / 2.0, 0.0)]
    s = math.sqrt(-disc)
    re = phi1 / 2.0
    return [(re, s / 2.0), (re, -(s / 2.0))]


def ar_inverse_roots(phi: list[float]) -> list[tuple[float, float]]:
    """General-p inverse roots (numpy eigen root finder) — the flexible
    path for p != 2; p == 2 routes through the exact quadratic."""
    if len(phi) == 2:
        return ar2_inverse_roots(phi[0], phi[1])
    roots = np.roots([1.0] + [-c for c in phi])
    out = [(float(r.real), float(r.imag)) for r in roots]
    return sorted(out, key=lambda t: (-t[0], -t[1]))


def ar_psi_weights(phi: list[float], h_max: int) -> np.ndarray:
    """Impulse response (psi) weights of an AR(p), h = 0..h_max:
    psi_0 = 1, psi_h = sum_j phi_j * psi_{h-j}. The sum is the fixed
    left-associated three-term tree for p == 3 (zero-padded history), so
    adding a structurally-zero term keeps bit-identity with the SQL
    recursive CTE's literal `((a1*v) + (a2*v1)) + (a3*v2)` expression."""
    p = len(phi)
    psi = np.zeros(h_max + 1)
    psi[0] = 1.0
    hist = [1.0] + [0.0] * max(p - 1, 0)  # psi_{h-1}, psi_{h-2}, ...
    for h in range(1, h_max + 1):
        s = 0.0
        for j in range(p):
            s += phi[j] * hist[j]
        psi[h] = s
        hist = [s] + hist[:-1]
    return psi
