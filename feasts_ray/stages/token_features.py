"""Per-doc token-stream features: each doc's token stream IS a regular
time series (north star): lag-k ACF features, centered-MA trend strength
and period-60 seasonal strength (feasts semantics: strength =
max(0, 1 - var(remainder)/var(deseasonalized)), R/features.R:49-119;
acf sums-of-squares per R/features.R:616-653).

Implementation: the whole batch is processed as ONE padded (B, PAD_LEN)
float64 matrix — every reduction is a row-wise vectorized numpy op, no
per-doc Python in the hot path. Padding is always to the fixed PAD_LEN
(zeros after per-row demeaning), so each row's pairwise-summation tree is
independent of batch composition → results are bit-identical between the
Ray actor-pool kernel and the single-process oracle
(feasts_ray/oracle/token_features.py), any batch size, any parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

PAD_LEN = 512
N_LAGS = 10
SEASON_PERIOD = 60
TREND_WINDOW = 60

N_PACF = 5

FEATURE_COLS = (
    "n", "tok_mean", "tok_var",
    "acf1", "acf10_ss", "diff1_acf1", "diff1_acf10_ss",
    "pacf5_ss",
    "season_strength", "trend_strength",
)


def _pacf_ss_from_acfs(acfs: np.ndarray, b: int) -> np.ndarray:
    """Durbin-Levinson over the batch: sum of squares of the first N_PACF
    partial autocorrelations from acf lags 1..N_PACF (feasts feat_pacf
    semantics, R/features.R:669-695). All ops elementwise over (B,) so
    results are independent of batch composition."""
    with np.errstate(invalid="ignore", divide="ignore"):
        phi_prev = {1: acfs[0].copy()}
        ss = acfs[0] * acfs[0]
        for k in range(2, N_PACF + 1):
            num = acfs[k - 1].copy()
            den = np.ones(b)
            for j in range(1, k):
                num = num - phi_prev[j] * acfs[k - j - 1]
                den = den - phi_prev[j] * acfs[j - 1]
            phi_kk = np.where(den != 0, num / den, np.nan)
            phi_new = {k: phi_kk}
            for j in range(1, k):
                phi_new[j] = phi_prev[j] - phi_kk * phi_prev[k - j]
            phi_prev = phi_new
            ss = ss + phi_kk * phi_kk
    return ss


def pad_bucket(n: int, pad_len: int = PAD_LEN) -> int:
    """Pad width for a doc of length n: next power of two >= n (min 64,
    max PAD_LEN). Pure function of the doc — reduction trees therefore
    never depend on batch composition."""
    b = 64
    while b < n and b < pad_len:
        b <<= 1
    return min(b, pad_len)


def padded_matrix(tokens_col: pa.Array, pad_len: int = PAD_LEN):
    """list<int32> column -> (B, pad_len) float64 + lengths (zero-copy
    flat values; one reshape-free scatter).

    Docs longer than ``pad_len`` are CAPPED to their first ``pad_len``
    tokens, and the returned lengths are the capped lengths — every
    downstream mean/variance divides by the number of tokens actually
    in the matrix (consistent truncation, never a silent wrong divisor)."""
    if isinstance(tokens_col, pa.ChunkedArray):
        tokens_col = tokens_col.combine_chunks()
    offs = tokens_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = tokens_col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    n = np.minimum(offs[1:] - offs[:-1], pad_len)
    b = len(n)
    x = np.zeros((b, pad_len), dtype=np.float64)
    idx = np.arange(pad_len)[None, :]
    mask = idx < n[:, None]
    gather = offs[:-1][:, None] + idx
    if len(flat):
        x[mask] = flat[np.minimum(gather, len(flat) - 1)[mask]]
    return x, n, mask


def token_feature_block(x: np.ndarray, n: np.ndarray, mask: np.ndarray) -> dict[str, np.ndarray]:
    """(B, PAD_LEN) padded tokens -> feature arrays (B,). Pure function —
    the oracle calls this row-by-row (B=1) and gets identical bits."""
    b, L = x.shape
    nf = n.astype(np.float64)
    s = x.sum(axis=1)
    mean = s / nf
    a = np.where(mask, x - mean[:, None], 0.0)  # demeaned, zero pad
    # product-sums ride einsum('ij,ij->i', ...): one fused pass per
    # reduction, no (B, L) product temporary (~3.6x on the lag loop).
    # Bit-exactness across batch shapes holds because the accumulation
    # runs per ROW over j only — the same inner loop for B=1 and B=4096
    # (pinned by the oracle-vs-kernel and batch-size-equality tests).
    c0 = np.einsum("ij,ij->i", a, a)
    var = c0 / np.maximum(nf - 1.0, 1.0)

    # ACF lags 1..N_LAGS (R acf: denominator c0 over full series)
    acfs = np.empty((N_LAGS, b))
    for k in range(1, N_LAGS + 1):
        ck = np.einsum("ij,ij->i", a[:, :-k], a[:, k:])
        with np.errstate(invalid="ignore", divide="ignore"):
            acfs[k - 1] = np.where(c0 > 0, ck / c0, np.nan)
    acf1 = acfs[0]
    # explicit sequential accumulation: reduction order must not depend on
    # batch shape (sum(axis=0) uses a SIMD tree that differs B=1 vs B>1)
    acf10_ss = np.zeros(b)
    for k in range(N_LAGS):
        acf10_ss = acf10_ss + acfs[k] * acfs[k]
    pacf5_ss = _pacf_ss_from_acfs(acfs, b)

    # diff1 series: d_t = x_{t+1} - x_t for t < n-1 (zero elsewhere)
    # dmask[:, j] = j < n-1 = (j+1) < n = mask[:, 1:] — reuse, don't rebuild
    dmask = mask[:, 1:]
    d = np.where(dmask, x[:, 1:] - x[:, :-1], 0.0)
    dn = np.maximum(n - 1, 1).astype(np.float64)
    dmean = d.sum(axis=1) / dn
    da = np.where(dmask, d - dmean[:, None], 0.0)
    dc0 = np.einsum("ij,ij->i", da, da)
    dacfs = np.empty((N_LAGS, b))
    for k in range(1, N_LAGS + 1):
        ck = np.einsum("ij,ij->i", da[:, :-k], da[:, k:])
        with np.errstate(invalid="ignore", divide="ignore"):
            dacfs[k - 1] = np.where(dc0 > 0, ck / dc0, np.nan)
    diff1_acf1 = dacfs[0]
    diff1_acf10_ss = np.zeros(b)
    for k in range(N_LAGS):
        diff1_acf10_ss = diff1_acf10_ss + dacfs[k] * dacfs[k]

    # classical-style decomposition (feasts strength semantics,
    # R/features.R:113-118): trend = centered MA, seasonal = per-phase
    # means of the DETRENDED series, remainder = rest;
    # trend_strength  = max(0, 1 - var(rem)/var(deseasonalized))
    # season_strength = max(0, 1 - var(rem)/var(detrended))
    w = TREND_WINDOW
    h = w // 2
    # x is zero outside the mask by the padded_matrix contract, so the
    # cumsum needs no masking pass
    cs = np.empty((b, L + 1))
    cs[:, 0] = 0.0
    np.cumsum(x, axis=1, out=cs[:, 1:])
    lo = np.maximum(np.arange(L) - h, 0)
    hi = np.minimum(np.arange(L) + h + 1, L)
    # win_sum[:, t] = cs[:, hi[t]] - cs[:, lo[t]]; hi/lo are clipped
    # shifts, so the gathers are plain slices (bit-identical values,
    # no (b, L) fancy-index pass): hi[t] = t+h+1 for t < L-h else L;
    # lo[t] = t-h for t >= h else 0 (cs[:, 0] == 0 -> no subtraction)
    win_sum = np.empty((b, L))
    win_sum[:, :L - h] = cs[:, h + 1:]
    win_sum[:, L - h:] = cs[:, L:L + 1]
    win_sum[:, h:] -= cs[:, :L - h]
    # prefix mask => cumulative count at t is min(t, n): the window count
    # is analytic (no mask cumsum / gather), same exact integers
    win_cnt = (np.minimum(hi[None, :], n[:, None])
               - np.minimum(lo[None, :], n[:, None])).astype(np.float64)
    trend = np.zeros((b, L))
    np.divide(win_sum, win_cnt, out=trend, where=win_cnt > 0.0)

    detr = np.where(mask, x - trend, 0.0)
    detr_mean = detr.sum(axis=1) / nf
    detr_c = np.where(mask, detr - detr_mean[:, None], 0.0)
    v_detr = np.einsum("ij,ij->i", detr_c, detr_c)

    # seasonal component: per-phase means of the detrended series
    p = SEASON_PERIOD
    ncyc = L // p
    dc = detr_c[:, : ncyc * p].reshape(b, ncyc, p)
    mc = mask[:, : ncyc * p].reshape(b, ncyc, p)
    cyc_cnt = mc.sum(axis=1).astype(np.float64)            # (b, p)
    # detr_c is exactly 0.0 wherever mc is False (np.where above), so
    # (dc * mc) == dc element-for-element — skip the (b, ncyc, p) product
    with np.errstate(invalid="ignore", divide="ignore"):
        phase_mean = np.where(cyc_cnt > 0, dc.sum(axis=1) / cyc_cnt, 0.0)
    seas_full = np.zeros((b, L))
    seas_full[:, : ncyc * p] = np.tile(phase_mean, (1, ncyc))
    seas_c = np.where(mask, seas_full, 0.0)

    rem = detr_c - seas_c
    v_rem = np.einsum("ij,ij->i", rem, rem)
    deseason = a - seas_c
    v_deseason = np.einsum("ij,ij->i", deseason, deseason)
    with np.errstate(invalid="ignore", divide="ignore"):
        season_strength = np.where(
            v_detr > 0, np.maximum(0.0, 1.0 - v_rem / v_detr), np.nan)
        trend_strength = np.where(
            v_deseason > 0, np.maximum(0.0, 1.0 - v_rem / v_deseason), np.nan)

    return {
        "n": nf, "tok_mean": mean, "tok_var": var,
        "acf1": acf1, "acf10_ss": acf10_ss,
        "diff1_acf1": diff1_acf1, "diff1_acf10_ss": diff1_acf10_ss,
        "pacf5_ss": pacf5_ss,
        "season_strength": season_strength, "trend_strength": trend_strength,
    }


def token_feature_batch(batch: pa.Table, tokens_col: str = "tokens",
                        id_cols: tuple[str, ...] = ("doc_id", "source"),
                        tile_elems: int = 64 * 1024) -> pa.Table:
    """map_batches kernel: tokens list column -> per-doc feature rows.

    A plain function (task pool), not an actor class: there is no per-actor
    state to set up, and tasks scale elastically with available CPUs
    instead of being capped by an actor-pool size.

    Docs are grouped by pad bucket (next power of two of their length) so
    short docs don't pay PAD_LEN-wide memory traffic (~3x bandwidth saved
    at the synth length distribution); results stay bit-identical to the
    oracle because the bucket — and so each row's reduction tree — is a
    pure function of the doc length.

    Within a bucket, rows are processed in TILES of ~``tile_elems``
    matrix elements (default 64K ≈ 512 KB of float64): the kernel makes
    ~20 passes over its (B, L) temporaries, so keeping the tile
    L2-resident cuts memory traffic several-fold. Tiling is a pure perf
    knob — every feature is computed per row, so any row partitioning
    gives identical bits (pinned by the batch-size-equality tests)."""
    toks = batch[tokens_col]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values.to_numpy(zero_copy_only=False).astype(np.float64)
    # docs longer than PAD_LEN are capped to their first PAD_LEN tokens;
    # the capped length is the divisor everywhere (consistent truncation)
    n_all = np.minimum(offs[1:] - offs[:-1], PAD_LEN)
    nb = len(n_all)
    buckets = np.minimum(
        np.maximum(64, 2 ** np.ceil(np.log2(np.maximum(n_all, 1))).astype(np.int64)),
        PAD_LEN)
    out_feats = {name: np.empty(nb) for name in FEATURE_COLS}
    for L in np.unique(buckets):
        rows_all = np.flatnonzero(buckets == L)
        Li = int(L)
        step = max(1, tile_elems // Li)
        for s in range(0, len(rows_all), step):
            rows = rows_all[s:s + step]
            n = n_all[rows]
            b = len(rows)
            x = np.zeros((b, Li), dtype=np.float64)
            mask = np.arange(Li)[None, :] < n[:, None]
            starts = offs[rows]
            gather = starts[:, None] + np.arange(Li)[None, :]
            x[mask] = flat[np.minimum(gather, len(flat) - 1)[mask]]
            feats = token_feature_block(x, n, mask)
            for name in FEATURE_COLS:
                out_feats[name][rows] = feats[name]
    cols = {c: batch[c] for c in id_cols}
    for name in FEATURE_COLS:
        cols[name] = pa.array(out_feats[name], type=pa.float64())
    return pa.table(cols)


def token_feature_table(
    ds: "ray.data.Dataset",
    tokens_col: str = "tokens",
    id_cols: tuple[str, ...] = ("doc_id", "source"),
    batch_size: int = 2048,
) -> "ray.data.Dataset":
    """Zero-shuffle per-doc feature extraction over the token column.

    batch_size swept at 32-way concurrency on 12M docs (results are
    batch-shape independent, so this is purely a perf knob): 512/1024
    ~20.3 s, 2048 18.0 s, 4096 18.1 s — 2048 adopted.

    tile_elems swept the same way (interleaved, 12M docs, 32-way):
    untiled 17.1-46.8 s vs 64K 14.1-26.2 s across phases — 64K (512 KB
    float64, L2-resident across the kernel's ~20 passes) beat untiled
    in every interleaved pair and matched 32K; 1.38x single-core."""
    return ds.map_batches(
        token_feature_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        fn_kwargs={"tokens_col": tokens_col, "id_cols": tuple(id_cols)},
    )
