"""ACF / PACF / CCF kernels matching R stats::acf semantics.

Reference behavior (reimplemented, not ported — /root/reference/R/acf.R
drives stats::acf's C internals):
- autocovariance at lag k: sum over complete pairs of centered products,
  divided by (n_pairs + k) — i.e. by n when there are no NAs (R's
  na.pass divisor convention); correlation = acov(k)/acov(0)
- demean uses the whole-series non-NA mean
- default lag_max = floor(10*log10(n)) capped at n-1 (univariate);
  CCF uses floor(10*log10(n/2))
- PACF via Durbin-Levinson recursion on the ACF (R's uni_pacf)
- tacf: McMurry-Politis banded/tapered acf + eigen shrinkage toward
  white noise (R/acf.R:252-300); O(n^2..3) — modest series only.

FFT is used for the products when the series is long (O(n log n)).
"""

from __future__ import annotations

import math

import numpy as np


def _lagged_products(x: np.ndarray, lag_max: int) -> tuple[np.ndarray, np.ndarray]:
    """sum_t x[t]*x[t+k] (NaN treated as 0) and complete-pair counts
    for k = 0..lag_max, via FFT autocorrelation."""
    n = len(x)
    ok = ~np.isnan(x)
    x0 = np.where(ok, x, 0.0)
    m = 1 << int(np.ceil(np.log2(2 * n)))
    fx = np.fft.rfft(x0, m)
    prods = np.fft.irfft(fx * np.conj(fx), m)[: lag_max + 1]
    fi = np.fft.rfft(ok.astype(np.float64), m)
    counts = np.rint(np.fft.irfft(fi * np.conj(fi), m)[: lag_max + 1]).astype(np.int64)
    return prods, counts


def acovf(x: np.ndarray, lag_max: int, demean: bool = True) -> np.ndarray:
    """Autocovariance 0..lag_max with R's na.pass divisor (n_pairs + k)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    lag_max = min(lag_max, n - 1)
    if demean:
        x = x - np.nanmean(x)
    if n < 500:
        ok = ~np.isnan(x)
        x0 = np.where(ok, x, 0.0)
        out = np.empty(lag_max + 1)
        for k in range(lag_max + 1):
            pair = ok[: n - k] & ok[k:]
            npairs = int(pair.sum())
            s = float((x0[: n - k] * x0[k:])[pair].sum()) if npairs else math.nan
            out[k] = s / (npairs + k) if npairs else math.nan
        return out
    prods, counts = _lagged_products(x, lag_max)
    k = np.arange(lag_max + 1)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.where(counts > 0, prods / (counts + k), np.nan)
    return out


def acf(
    x: np.ndarray,
    lag_max: int | None = None,
    kind: str = "correlation",
    demean: bool = True,
) -> np.ndarray:
    """ACF values at lags 0..lag_max (index 0 is lag 0, == 1 for correlation)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if lag_max is None:
        lag_max = int(math.floor(10 * math.log10(n)))
    lag_max = max(1, min(lag_max, n - 1))
    acv = acovf(x, lag_max, demean=demean)
    if kind == "covariance":
        return acv
    with np.errstate(invalid="ignore", divide="ignore"):
        return acv / acv[0]


def pacf_from_acf(rho: np.ndarray, lag_max: int) -> np.ndarray:
    """Durbin-Levinson: partial autocorrelations at lags 1..lag_max from
    correlations rho[0..lag_max] (rho[0] == 1)."""
    p = np.zeros(lag_max)
    phi_prev = np.zeros(lag_max + 1)
    phi = np.zeros(lag_max + 1)
    p[0] = phi_prev[1] = rho[1]
    for k in range(2, lag_max + 1):
        num = rho[k] - np.dot(phi_prev[1:k], rho[k - 1 : 0 : -1])
        den = 1.0 - np.dot(phi_prev[1:k], rho[1:k])
        pk = num / den
        phi[1:k] = phi_prev[1:k] - pk * phi_prev[k - 1 : 0 : -1]
        phi[k] = pk
        phi_prev[: k + 1] = phi[: k + 1]
        p[k - 1] = pk
    return p


def pacf(x: np.ndarray, lag_max: int | None = None) -> np.ndarray:
    """Partial ACF at lags 1..lag_max (stats::pacf; NA-contiguous upstream)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if lag_max is None:
        lag_max = int(math.floor(10 * math.log10(n)))
    lag_max = max(1, min(lag_max, n - 1))
    rho = acf(x, lag_max)
    return pacf_from_acf(rho, lag_max)


def acf_exact_int(xi: np.ndarray, lag_max: int) -> np.ndarray:
    """ACF (lags 0..lag_max, rho[0] == 1) of an integer series from exact
    integer power sums, so the final doubles are a fixed IEEE expression
    over exact ints — bit-identical to a SQL oracle evaluating

      rho_k = ((Sxy_k - m*(H_k + T_k)) + ((n-k)*m)*m) / (SS - S*m),  m = S/n

    (same expression as pipelines/events._ExactACFKernel / the
    ``acf_1h_counts`` oracle; stats::acf semantics, R divisor n)."""
    xi = np.asarray(xi, dtype=np.int64)
    n = len(xi)
    lag_max = min(lag_max, n - 1)
    S = int(xi.sum())
    SS = int(np.dot(xi, xi))
    m = S / n
    den = SS - S * m
    out = np.empty(lag_max + 1)
    out[0] = 1.0
    for k in range(1, lag_max + 1):
        sxy = int(np.dot(xi[:-k], xi[k:]))
        h = int(xi[:-k].sum())
        t = int(xi[k:].sum())
        num = (sxy - m * (h + t)) + ((n - k) * m) * m
        out[k] = num / den if den != 0 else math.nan
    return out


def pacf_from_acf_seq(rho: np.ndarray, lag_max: int) -> np.ndarray:
    """Durbin-Levinson with strictly sequential (left-to-right) inner
    sums, mirroring a SQL recursive-CTE oracle whose list_sum accumulates
    sequentially — bit-identical given bit-identical rho. Same recursion
    as pacf_from_acf (which uses BLAS dot, order unspecified)."""
    p = np.zeros(lag_max)
    phi_prev = [0.0] * (lag_max + 1)
    p[0] = phi_prev[1] = float(rho[1])
    for k in range(2, lag_max + 1):
        s_num = 0.0
        s_den = 0.0
        for j in range(1, k):
            s_num += phi_prev[j] * rho[k - j]
            s_den += phi_prev[j] * rho[j]
        pk = (rho[k] - s_num) / (1.0 - s_den)
        phi = [0.0] * (lag_max + 1)
        for j in range(1, k):
            phi[j] = phi_prev[j] - pk * phi_prev[k - j]
        phi[k] = pk
        phi_prev = phi
        p[k - 1] = pk
    return p


def ccf(
    y: np.ndarray, x: np.ndarray, lag_max: int | None = None, kind: str = "correlation"
) -> tuple[np.ndarray, np.ndarray]:
    """Cross-correlation of y and x at lags -k..k (stats::ccf order:
    value at lag k is cor(y[t+k], x[t])). Returns (lags, values)."""
    y = np.asarray(y, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    n = min(len(y), len(x))
    y, x = y[:n], x[:n]
    if lag_max is None:
        lag_max = int(math.floor(10 * math.log10(n / 2)))
    lag_max = max(1, min(lag_max, n - 1))
    yc = y - np.nanmean(y)
    xc = x - np.nanmean(x)
    oky, okx = ~np.isnan(yc), ~np.isnan(xc)
    y0 = np.where(oky, yc, 0.0)
    x0 = np.where(okx, xc, 0.0)
    lags = np.arange(-lag_max, lag_max + 1)
    vals = np.empty(len(lags))
    for idx, k in enumerate(lags):
        if k >= 0:
            pair = okx[: n - k] & oky[k:]
            s = float((x0[: n - k] * y0[k:])[pair].sum())
        else:
            j = -k
            pair = oky[: n - j] & okx[j:]
            s = float((y0[: n - j] * x0[j:])[pair].sum())
        npairs = int(pair.sum())
        vals[idx] = s / (npairs + abs(k)) if npairs else math.nan
    if kind == "correlation":
        sy = math.sqrt(float((y0[oky] ** 2).sum()) / n)
        sx = math.sqrt(float((x0[okx] ** 2).sum()) / n)
        vals = vals / (sy * sx)
    return lags, vals


TACF_MAX_N = 4096  # above this the eigen shrink (n x n matrix) switches
                   # to the O(N log N) spectral-density floor


def _spectral_shrink(gamma: np.ndarray, n: int) -> np.ndarray:
    """O(N log N) surrogate for the n x n eigen shrink on long series:
    floor the SPECTRAL DENSITY of the tapered sequence at 20/n instead
    of the Toeplitz eigenvalues (Szegő: Toeplitz eigenvalues are
    asymptotically the spectral-density samples; the circulant embedding
    makes the correspondence exact). Identity when already PSD — same as
    the eigen path — and differs from it only by O(1/n) boundary terms
    when flooring engages (documented approximation for n > TACF_MAX_N).
    Normalization mirrors the eigen path's /mean(eigenvalues):
    mean of floored spectral samples == trace/N of the floored matrix."""
    m = len(gamma)
    N = 1 << max(12, (2 * m).bit_length())
    buf = np.zeros(N)
    buf[0] = gamma[0]
    buf[1:m] = gamma[1:]
    buf[N - m + 1:] = gamma[1:][::-1]
    f = np.fft.rfft(buf).real  # real symmetric sequence -> real spectrum
    f2 = np.maximum(f, 20.0 / n)
    corrected = np.fft.irfft(f2, n=N)[:m]
    # full-spectrum mean from the half-spectrum (rfft) samples
    wsum = 2.0 * f2[1:-1].sum() + f2[0] + (f2[-1] if N % 2 == 0 else 2.0 * f2[-1])
    return corrected / (wsum / N)


def tacf(x: np.ndarray) -> np.ndarray:
    """Banded/tapered autocorrelation with shrinkage toward white noise
    (McMurry & Politis 2010; reference R/acf.R:252-300 behavior).
    Series up to TACF_MAX_N use the reference's n x n eigen shrink;
    longer series switch to the O(N log N) spectral-density floor
    (_spectral_shrink) — same correction in the Szegő limit, no cap."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    ac = acf(x, lag_max=n - 1)
    s = np.arange(1, len(ac) + 1, dtype=np.float64)
    upper = 2 * math.sqrt(math.log10(n) / n)
    below = np.abs(ac) < upper
    l = 0
    for k in range(len(below) - 4):
        if below[k : k + 5].all():
            l = k + 1  # 1-based index like the reference
            break
    if l == 0:
        l = len(ac)  # no taper point found: keep everything
    sl = s / l
    taper = np.zeros(len(sl))
    taper[sl <= 1] = 1.0
    mid = (sl > 1) & (sl <= 2)
    taper[mid] = 2 - sl[mid]
    gamma = ac * taper
    m = len(gamma)
    if n > TACF_MAX_N:
        return _spectral_shrink(gamma, n)
    # shrinkage toward white noise via eigenvalue flooring
    idx = np.abs(np.subtract.outer(np.arange(m), np.arange(m)))
    G = gamma[idx]
    w, V = np.linalg.eigh(G)
    d = np.maximum(w, 20.0 / n)
    G2 = (V * d) @ V.T
    G2 = G2 / d.mean()
    out = gamma.copy()
    for i in range(1, m):
        out[i] = np.mean(np.diagonal(G2, offset=i))
    return out
