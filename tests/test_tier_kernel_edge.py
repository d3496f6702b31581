"""Tier kernel edge cases: pathological skew, single-point sources,
all-gap segments, segment-boundary buckets — vs a pandas oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from feasts_ray.stages.tier_kernel import run_tier, spans_from_partials


def _partials_ds(df: pd.DataFrame, nblocks: int = 4):
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)
                               ).repartition(nblocks)


def _oracle(df: pd.DataFrame, unit_s: int, gap_fill: bool) -> pd.DataFrame:
    g = df.groupby(["source", "bucket"], sort=True).agg(
        count=("count", "sum"), sum=("sum", "sum"),
        min=("min", "min"), max=("max", "max")).reset_index()
    if gap_fill:
        out = []
        for src, sub in g.groupby("source"):
            lo = (sub["bucket"].min() // unit_s) * unit_s
            dense = np.arange(lo, sub["bucket"].max() + 1, unit_s)
            sub = sub.set_index("bucket").reindex(dense)
            sub["source"] = src
            sub["count"] = sub["count"].fillna(0).astype(np.int64)
            sub["sum"] = sub["sum"].fillna(0).astype(np.int64)
            out.append(sub.reset_index(names="bucket"))
        g = pd.concat(out, ignore_index=True)[["source", "bucket", "count",
                                               "sum", "min", "max"]]
    cnt = g["count"].to_numpy(np.int64)
    s = g["sum"].to_numpy(np.int64)
    with np.errstate(invalid="ignore", divide="ignore"):
        g["mean"] = np.where(cnt > 0, s / cnt.astype(np.float64), np.nan)
    return g.sort_values(["source", "bucket"], ignore_index=True)


def _run(df, unit_s, gap_fill, segment_points=64):
    ds = _partials_ds(df)
    spans = spans_from_partials(ds, key_col="source") if gap_fill else {}
    got = run_tier(ds, "t", unit_s, segment_points, spans, gap_fill=gap_fill,
                   blobs_dir=None, key_col="source").to_pandas()
    return got.sort_values(["source", "bucket"], ignore_index=True)


def _compare(got, exp):
    assert len(got) == len(exp)
    for c in ("source", "bucket", "count", "sum"):
        np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy())
    for c in ("min", "max", "mean"):
        a = got[c].to_numpy(dtype=np.float64, na_value=np.nan)
        b = exp[c].to_numpy(dtype=np.float64, na_value=np.nan)
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
        np.testing.assert_array_equal(a[~np.isnan(a)], b[~np.isnan(b)])


def test_zipf_skew_bounded_groups(ray_session):
    """One source holds ~95% of rows; segment grouping bounds the hot key."""
    rng = np.random.default_rng(0)
    n_hot, n_cold = 20000, 500
    df = pd.DataFrame({
        "source": ["hot"] * n_hot + ["cold"] * n_cold,
        "bucket": np.concatenate([rng.integers(0, 5000, n_hot),
                                  rng.integers(0, 300, n_cold)]),
        "count": 1,
        "sum": np.concatenate([rng.integers(1, 100, n_hot),
                               rng.integers(1, 100, n_cold)]),
    })
    df["min"] = df["sum"]
    df["max"] = df["sum"]
    _compare(_run(df, 1, gap_fill=True), _oracle(df, 1, gap_fill=True))


def test_single_point_source(ray_session):
    df = pd.DataFrame({"source": ["a", "b", "b"], "bucket": [7, 0, 120],
                       "count": [1, 1, 1], "sum": [10, 5, 6],
                       "min": [10, 5, 6], "max": [10, 5, 6]})
    got = _run(df, 60, gap_fill=True)
    exp = _oracle(df, 60, gap_fill=True)
    _compare(got, exp)
    # source b spans [0,120] at 1m -> buckets 0,60,120 with a gap at 60
    b = got[got["source"] == "b"]
    assert list(b["bucket"]) == [0, 60, 120]
    assert list(b["count"]) == [1, 0, 1]


def test_all_gap_middle_segment(ray_session):
    """A fully-empty segment inside the span must still emit gap rows
    (skeleton seeding)."""
    seg_pts = 16
    df = pd.DataFrame({"source": ["s", "s"], "bucket": [0, 100],
                       "count": [1, 1], "sum": [2, 3],
                       "min": [2, 3], "max": [2, 3]})
    got = _run(df, 1, gap_fill=True, segment_points=seg_pts)
    assert list(got["bucket"]) == list(range(101))
    assert got["count"].sum() == 2
    assert (got["count"] == 0).sum() == 99


def test_boundary_buckets_not_duplicated(ray_session):
    """Buckets exactly on segment boundaries land in exactly one group."""
    seg_pts = 8
    buckets = np.array([0, 7, 8, 15, 16, 16, 24])
    df = pd.DataFrame({"source": "s", "bucket": buckets, "count": 1,
                       "sum": buckets, "min": buckets, "max": buckets})
    got = _run(df, 1, gap_fill=False, segment_points=seg_pts)
    exp = _oracle(df, 1, gap_fill=False)
    _compare(got, exp)


def test_no_gap_fill_passthrough(ray_session):
    rng = np.random.default_rng(1)
    df = pd.DataFrame({
        "source": rng.choice(["x", "y"], 5000),
        "bucket": rng.integers(0, 1000, 5000) * 60,
        "count": 1, "sum": rng.integers(1, 50, 5000),
    })
    df["min"] = df["sum"]
    df["max"] = df["sum"]
    _compare(_run(df, 60, gap_fill=False), _oracle(df, 60, gap_fill=False))


def test_spans_broadcast_not_in_closure(ray_session):
    """With 10^5 sources the kernel submitted per task must stay tiny:
    the span table ships via ray.put (per-process cached resolve), so the
    pickled kernel is O(1), and the tier output over a 2-source subset is
    still correct against the oracle."""
    import pickle

    from feasts_ray.stages.tier_kernel import TierSegmentKernel, _put_once

    big_spans = {f"src{i:06d}": (0, 3600) for i in range(100_000)}
    kernel = TierSegmentKernel("t", 60, 60 * 64, _put_once(big_spans),
                               True, None, "source")
    assert len(pickle.dumps(kernel)) < 10_000  # ref, not the dict
    # resolves back to the real table inside a worker-like context
    assert kernel.spans["src000000"] == (0, 3600)
    # end-to-end correctness unaffected by the broadcast path
    df = pd.DataFrame({
        "source": ["a"] * 3 + ["b"] * 2,
        "bucket": [0, 120, 240, 60, 180],
        "count": 1, "sum": [5, 6, 7, 8, 9],
    })
    df["min"] = df["sum"]
    df["max"] = df["sum"]
    _compare(_run(df, 60, gap_fill=True), _oracle(df, 60, gap_fill=True))


def test_broadcast_cache_bounded(ray_session):
    """The per-process broadcast cache is a tiny LRU: long-lived Ray
    workers must not accumulate one spans dict per pipeline run."""
    import ray as _ray

    from feasts_ray.state import broadcast as bc

    refs = [_ray.put({"k": i}) for i in range(bc._BROADCAST_CACHE_MAX + 3)]
    for r in refs:
        assert bc.resolve_broadcast(r)["k"] is not None
    assert len(bc._BROADCAST_CACHE) <= bc._BROADCAST_CACHE_MAX
    # most-recent entry survives and still resolves from cache
    assert bc.resolve_broadcast(refs[-1])["k"] == len(refs) - 1


def test_single_block_path_matches_distributed(ray_session):
    """run_tier(single_block=True) — the tiny-tier zero-shuffle fast
    path — produces the IDENTICAL point set as the distributed groupby
    path, gap-filled and not, including blob-free float semantics."""
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "source": rng.choice(["p", "q", "r"], 4000),
        "bucket": rng.integers(0, 2000, 4000) * 60,
        "count": 1, "sum": rng.integers(1, 90, 4000),
    })
    df["min"] = df["sum"]
    df["max"] = df["sum"]
    for gap_fill in (False, True):
        ds = _partials_ds(df)
        spans = spans_from_partials(ds, key_col="source") if gap_fill else {}
        dist = run_tier(ds, "t", 60, 64, spans, gap_fill=gap_fill,
                        blobs_dir=None, key_col="source"
                        ).to_pandas().sort_values(
            ["source", "bucket"], ignore_index=True)
        single = run_tier(_partials_ds(df), "t", 60, 64, spans,
                          gap_fill=gap_fill, blobs_dir=None,
                          key_col="source", single_block=True
                          ).to_pandas().sort_values(
            ["source", "bucket"], ignore_index=True)
        _compare(single, dist)
