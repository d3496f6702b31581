"""Oracle for the rollup/retention pipeline: sequential numpy groupby.

Computes, for every retention tier, the per-(source, bucket) aggregates
count/sum/min/max/mean of n_tok — including gap-filled buckets — from
first principles (no Ray). Sums are exact int64 so means are bit-exact
deterministic float64 (sum / count), matching the engine's fixed
reduction tree (SURVEY.md §7.3 bit-exactness note).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import TIERS, Tier
from ..synth import doc_lengths
from ..timebase import SOURCES, derive_ts_seconds, floor_bucket, source_index_for_doc


def doc_frame(n_docs: int, max_len: int = 512) -> pd.DataFrame:
    """The synthetic doc table as (i, source_idx, ts_s, n_tok) — no tokens."""
    i = np.arange(n_docs, dtype=np.int64)
    src = source_index_for_doc(i)
    ts = derive_ts_seconds(i, src)
    n_tok = doc_lengths(i, max_len).astype(np.int64)
    return pd.DataFrame({"i": i, "source_idx": src, "ts_s": ts, "n_tok": n_tok})


def rollup_tier(
    df: pd.DataFrame, unit_s: int, gap_fill: bool = True
) -> pd.DataFrame:
    """Aggregate (source, bucket) -> count/sum/min/max/mean, dense buckets."""
    bucket = floor_bucket(df["ts_s"].to_numpy(), unit_s)
    g = pd.DataFrame(
        {"source_idx": df["source_idx"].to_numpy(), "bucket": bucket, "v": df["n_tok"].to_numpy()}
    ).groupby(["source_idx", "bucket"], sort=True)
    agg = g["v"].agg(count="count", sum="sum", min="min", max="max").reset_index()
    if gap_fill:
        parts = []
        for s, sub in agg.groupby("source_idx", sort=True):
            lo, hi = sub["bucket"].min(), sub["bucket"].max()
            dense = np.arange(lo, hi + 1, unit_s, dtype=np.int64)
            d = pd.DataFrame({"bucket": dense})
            d["source_idx"] = s
            m = d.merge(sub, on=["source_idx", "bucket"], how="left")
            parts.append(m)
        agg = pd.concat(parts, ignore_index=True)
        agg["count"] = agg["count"].fillna(0).astype(np.int64)
        agg["sum"] = agg["sum"].fillna(0).astype(np.int64)
    else:
        agg["count"] = agg["count"].astype(np.int64)
        agg["sum"] = agg["sum"].astype(np.int64)
    cnt = agg["count"].to_numpy(dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = np.where(cnt > 0, agg["sum"].to_numpy(dtype=np.float64) / cnt, np.nan)
    agg["mean"] = mean
    agg["source"] = np.asarray(SOURCES)[agg["source_idx"].to_numpy()]
    out = agg[["source", "bucket", "count", "sum", "min", "max", "mean"]].copy()
    return out.sort_values(["source", "bucket"], ignore_index=True)


def rollup_all_tiers(
    n_docs: int, max_len: int = 512, tiers: tuple[Tier, ...] = TIERS, gap_fill: bool = True
) -> dict[str, pd.DataFrame]:
    df = doc_frame(n_docs, max_len)
    return {t.name: rollup_tier(df, t.unit_s, gap_fill and t.gap_fill)
            for t in tiers}
