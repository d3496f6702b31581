"""Spectral entropy via Burg AR spectrum (reference feat_spectral,
/root/reference/R/features.R:528-545, which drives stats::spec.ar with
method='burg').

Reimplemented from the standard published pieces: Burg's recursion for AR
coefficients, AIC order selection (order minimizing n*log(var_pred) +
2*order over 0..min(n-1, floor(10*log10(n)))), AR spectral density
f(w) = var_pred / |1 - sum_j a_j e^{-2*pi*i*w*j}|^2 evaluated on
n_freq points in [0, 0.5]."""

from __future__ import annotations

import math

import numpy as np


def ar_burg(x: np.ndarray, order_max: int | None = None) -> tuple[np.ndarray, float, int]:
    """Burg AR fit with AIC order selection (demeaned, like ar.burg).

    Returns (coefs for selected order, var_pred, order)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    x = x - x.mean()
    if order_max is None:
        order_max = min(n - 1, int(10 * math.log10(n)))
    order_max = max(order_max, 0)
    f = x.copy()
    b = x.copy()
    var_pred = float(np.dot(x, x)) / n
    variances = [var_pred]
    coef_by_order: list[np.ndarray] = [np.array([])]
    prev = np.array([])
    for m in range(1, order_max + 1):
        fm = f[m:]  # forward errors at t = m..n-1
        bm = b[m - 1 : n - 1]  # backward errors at t-1
        denom = float(np.dot(fm, fm) + np.dot(bm, bm))
        if denom <= 0:
            break
        k = 2.0 * float(np.dot(fm, bm)) / denom
        cur = np.empty(m)
        cur[m - 1] = k
        if m > 1:
            cur[: m - 1] = prev - k * prev[::-1]
        f_new = fm - k * bm
        b_new = bm - k * fm  # b_m(t) for t = m..n-1
        f[m:] = f_new
        # position t holds b_m(t): stage m+1 then reads b[m:n-1] =
        # b_m(t-1) for t = m+1..n-1. (Storing b_new shifted one left —
        # the previous code — fed b_m(t) where b_m(t-1) was needed; the
        # recursion collapsed var_pred toward 0 and AIC kept selecting
        # explosive max-order fits. Caught by the WWWusage golden:
        # entropy 0.495 vs the reference's published 0.461.)
        b[m:n] = b_new
        var_pred *= 1.0 - k * k
        variances.append(var_pred)
        coef_by_order.append(cur)
        prev = cur
    orders = np.arange(len(variances))
    with np.errstate(divide="ignore"):
        aic = n * np.log(np.maximum(variances, 1e-300)) + 2.0 * orders
    best = int(np.argmin(aic))
    return coef_by_order[best], float(variances[best]), best


def ar_spectrum(coefs: np.ndarray, var_pred: float, n_freq: int, frequency: float = 1.0) -> np.ndarray:
    """AR spectral density on n_freq points in [0, 0.5] cycles/unit
    (stats::spec.ar formula; the constant `frequency` scaling cancels in
    normalized entropy)."""
    freqs = np.linspace(0.0, 0.5, n_freq)
    order = len(coefs)
    if order:
        e = np.exp(-2j * np.pi * np.outer(freqs, np.arange(1, order + 1)))
        denom = np.abs(1.0 - e @ coefs) ** 2
    else:
        denom = np.ones(n_freq)
    return var_pred / (frequency * denom)


def spectral_entropy(x: np.ndarray, period: int = 1) -> float:
    """Shannon entropy (base n) of the normalized mirrored AR spectrum with
    a 0.001 uniform prior mix, clamped to [.,1]; NA for constant series
    (reference feat_spectral semantics)."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) == 0 or np.all(x == x[0]):
        return math.nan
    from .stats_utils import na_contiguous

    n = len(x)  # reference normalizes by length of the ORIGINAL series
    xc = na_contiguous(x)
    try:
        coefs, var_pred, _ = ar_burg(xc)
        # reference feat_spectral overrides the spec.ar grid explicitly:
        # n.freq = ceiling(length(x)/2 + 1) on the ORIGINAL series length
        # (/root/reference/R/features.R:531-533)
        spec = ar_spectrum(
            coefs, var_pred, n_freq=math.ceil(n / 2 + 1), frequency=float(period)
        )
    except (ValueError, np.linalg.LinAlgError):
        return math.nan
    fx = np.concatenate([spec[:0:-1], spec]) / n
    total = fx.sum()
    if not np.isfinite(total) or total <= 0:
        return math.nan
    fx = fx / total
    prior = 1.0 / len(fx)
    fx = 0.999 * fx + 0.001 * prior
    entropy = -np.sum(fx * np.log(fx) / math.log(n))
    return float(min(1.0, entropy))
