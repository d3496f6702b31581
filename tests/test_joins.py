"""As-of join (both physical plans) and sessionization.

The reference gets joins/windows for free from single-process R data
frames; these are the distributed counterparts (SQL oracles for the
driver live in __ray_entry__.oracle_sql["asof_join_1h"/"sessionize"]).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from feasts_ray.stages.joins import asof_join_broadcast, asof_join_grouped
from feasts_ray.stages.sessions import sessionize


@pytest.fixture()
def sides():
    rng = np.random.default_rng(7)
    n_left = 5000
    keys = rng.choice(["a", "b", "c"], size=n_left)
    ts = rng.integers(0, 100_000, size=n_left)
    left = pd.DataFrame({"key": keys, "t": ts,
                         "row_id": np.arange(n_left, dtype=np.int64)})
    right = pd.DataFrame({
        "key": np.repeat(["a", "b", "c"], 40),
        "t": np.tile(rng.integers(0, 100_000, size=40), 3),
        "val": np.arange(120, dtype=np.int64),
    })
    return left, right


def _pd_asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    out = []
    for _, row in left.iterrows():
        r = right[(right["key"] == row["key"]) & (right["t"] <= row["t"])]
        if len(r):
            best = r.loc[r["t"].idxmax()]
            out.append((row["key"], row["t"], row["row_id"],
                        best["t"], best["val"]))
    return pd.DataFrame(out, columns=["key", "t", "row_id",
                                      "asof_t", "asof_val"])


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), ignore_index=True)


def test_asof_broadcast_matches_naive_and_grouped(ray_session, sides):
    left_pd, right_pd = sides
    left = ray.data.from_pandas(left_pd).repartition(4)
    payload = {"t": "asof_t", "val": "asof_val"}
    got_b = asof_join_broadcast(
        left, right_pd, key_col="key", left_time_col="t",
        right_time_col="t", payload=payload).to_pandas()
    got_g = asof_join_grouped(
        left, ray.data.from_pandas(right_pd).repartition(3),
        key_col="key", left_time_col="t", right_time_col="t",
        payload=payload).to_pandas()
    want = _pd_asof(left_pd.head(300), right_pd)
    head = got_b[got_b["row_id"] < 300]
    pd.testing.assert_frame_equal(
        _canon(head), _canon(want), check_dtype=False)
    pd.testing.assert_frame_equal(_canon(got_b), _canon(got_g),
                                  check_dtype=False)


def test_asof_nonint_payload_and_unmatched_partition(ray_session):
    """Typed payloads survive both plans (float64 + string), including
    blocks where NO key matches the broadcast index (the empty-fallback
    column must carry the payload's real type, not int64)."""
    left_pd = pd.DataFrame({
        "key": ["a", "a", "zz", "zz"], "t": [5, 50, 7, 8],
        "row_id": np.arange(4, dtype=np.int64)})
    right_pd = pd.DataFrame({
        "key": ["a", "a"], "t": [4, 40],
        "score": [0.25, 0.75], "tag": ["lo", "hi"]})
    payload = {"t": "asof_t", "score": "asof_score", "tag": "asof_tag"}
    # repartition(4) gives single-row blocks -> the zz-only blocks hit
    # the no-match fallback path
    left = ray.data.from_pandas(left_pd).repartition(4)
    got_b = asof_join_broadcast(
        left, right_pd, key_col="key", left_time_col="t",
        right_time_col="t", payload=payload).to_pandas()
    got_g = asof_join_grouped(
        left, ray.data.from_pandas(right_pd).repartition(2),
        key_col="key", left_time_col="t", right_time_col="t",
        payload=payload).to_pandas()
    for got in (got_b, got_g):
        got = got.sort_values("t", ignore_index=True)
        assert got["t"].tolist() == [5, 50]
        assert got["asof_score"].tolist() == [0.25, 0.75]
        assert got["asof_tag"].tolist() == ["lo", "hi"]
        assert got["asof_score"].dtype == np.float64
        assert got["asof_t"].dtype == np.int64


def test_asof_grouped_keeps_int64_precision(ray_session):
    """Values beyond 2^53 must survive the grouped plan's null-padded
    union (pandas group blocks would coerce them through float64)."""
    big = (1 << 60) + 12345
    left = ray.data.from_pandas(pd.DataFrame(
        {"key": ["a"], "t": [100]}))
    right = ray.data.from_pandas(pd.DataFrame(
        {"key": ["a"], "t": [90], "val": np.array([big], dtype=np.int64)}))
    got = asof_join_grouped(
        left, right, key_col="key", left_time_col="t",
        right_time_col="t", payload={"val": "asof_val"}).to_pandas()
    assert got["asof_val"].tolist() == [big]


def test_asof_rejects_duplicate_right_times(ray_session):
    left = ray.data.from_pandas(pd.DataFrame({"key": ["a"], "t": [10]}))
    dup = pd.DataFrame({"key": ["a", "a"], "t": [5, 5], "val": [1, 2]})
    with pytest.raises(ValueError, match="unique"):
        asof_join_broadcast(left, dup, key_col="key", left_time_col="t",
                            right_time_col="t", payload={"val": "v"})


def test_asof_inner_drops_preindex_rows(ray_session):
    left = ray.data.from_pandas(pd.DataFrame(
        {"key": ["a", "a", "zz"], "t": [5, 50, 10]}))
    right = pd.DataFrame({"key": ["a"], "t": [10], "val": [1]})
    got = asof_join_broadcast(
        left, right, key_col="key", left_time_col="t",
        right_time_col="t", payload={"val": "asof_val"}).to_pandas()
    # t=5 precedes the first right row; key "zz" has no right rows
    assert got["t"].tolist() == [50]
    # ties match: t == right t
    got2 = asof_join_broadcast(
        ray.data.from_pandas(pd.DataFrame({"key": ["a"], "t": [10]})),
        right, key_col="key", left_time_col="t", right_time_col="t",
        payload={"val": "asof_val"}).to_pandas()
    assert got2["asof_val"].tolist() == [1]


def test_interval_join_halfopen_contiguous_overlap(ray_session):
    from feasts_ray.stages.joins import interval_join_broadcast

    left = ray.data.from_pandas(pd.DataFrame({
        "key": ["a"] * 6 + ["b"],
        "t": [4, 5, 9, 10, 14, 15, 5],
    }))
    # contiguous half-open windows [5,10) and [10,15): t=4,15 drop,
    # t=9 -> first, t=10 -> second; key "b" has no intervals
    iv = pd.DataFrame({"key": ["a", "a"], "s": [5, 10], "e": [10, 15]})
    got = interval_join_broadcast(
        left, iv, key_col="key", time_col="t",
        start_col="s", end_col="e").to_pandas()
    got = got.sort_values("t", ignore_index=True)
    assert got["t"].tolist() == [5, 9, 10, 14]
    assert got["win_start"].tolist() == [5, 5, 10, 10]
    assert got["win_end"].tolist() == [10, 10, 15, 15]
    with pytest.raises(ValueError, match="overlapping"):
        interval_join_broadcast(
            left, pd.DataFrame({"key": ["a", "a"], "s": [5, 8],
                                "e": [10, 12]}),
            key_col="key", time_col="t", start_col="s", end_col="e")


def test_interval_grouped_matches_broadcast(ray_session):
    """The shuffle plan for big interval sides (VERDICT r04 missing #1)
    must produce the identical row set as the broadcast plan, across
    randomized non-overlapping windows, keys with no intervals, and
    intervals with no left rows."""
    from feasts_ray.stages.joins import (interval_join_broadcast,
                                         interval_join_grouped)

    rng = np.random.default_rng(11)
    n_left = 4000
    left_pd = pd.DataFrame({
        "key": rng.choice(["a", "b", "c", "noiv"], size=n_left),
        "t": rng.integers(0, 100_000, size=n_left),
        "row_id": np.arange(n_left, dtype=np.int64),
    })
    ivs = []
    for key in ["a", "b", "c", "leftless"]:
        # random non-overlapping half-open windows from sorted cuts
        cuts = np.sort(rng.choice(100_000, size=40, replace=False))
        for s, e in zip(cuts[::2], cuts[1::2]):
            ivs.append((key, int(s), int(e), f"{key}:{s}"))
    iv_pd = pd.DataFrame(ivs, columns=["key", "s", "e", "label"])
    left = ray.data.from_pandas(left_pd).repartition(5)
    kw = dict(key_col="key", time_col="t", start_col="s", end_col="e",
              payload={"label": "win_label"})
    got_b = interval_join_broadcast(left, iv_pd, **kw).to_pandas()
    got_g = interval_join_grouped(
        left, ray.data.from_pandas(iv_pd).repartition(3), **kw).to_pandas()
    assert len(got_b) > 0
    pd.testing.assert_frame_equal(_canon(got_b), _canon(got_g),
                                  check_dtype=False)
    # int64 precision through the null-padded union (like the as-of pin)
    assert got_g["win_start"].dtype == np.int64
    # the grouped plan rejects overlap too
    bad = pd.DataFrame({"key": ["a", "a"], "s": [5, 8], "e": [10, 12]})
    with pytest.raises(Exception, match="overlapping"):
        interval_join_grouped(
            left, ray.data.from_pandas(bad), key_col="key", time_col="t",
            start_col="s", end_col="e").to_pandas()


def test_sessionize_gaps_and_ties(ray_session):
    # user 1: gaps 10,200,10 with gap=100 -> sessions {0,1},{2,3};
    # user 2: single event; user 3: tie timestamps stay one session
    df = pd.DataFrame({
        "u": [1, 1, 1, 1, 2, 3, 3],
        "t": [0, 10, 210, 220, 5, 7, 7],
        "v": [1, 2, 3, 4, 5, 6, 7],
    })
    got = sessionize(ray.data.from_pandas(df).repartition(3),
                     key_col="u", time_col="t", gap=100,
                     sum_col="v").to_pandas()
    got = got.sort_values(["u", "session_id"], ignore_index=True)
    assert got["u"].tolist() == [1, 1, 2, 3]
    assert got["session_id"].tolist() == [0, 1, 0, 0]
    assert got["session_start"].tolist() == [0, 210, 5, 7]
    assert got["session_end"].tolist() == [10, 220, 5, 7]
    assert got["n_events"].tolist() == [2, 2, 1, 2]
    assert got["sum_v"].tolist() == [3, 7, 5, 13]


def test_new_ops_driver_bit_exact(ray_session):
    """The full driver-contract compare for the session's new queries
    (kept out of FAST_ORACLE_QUERIES to keep that param list stable)."""
    import sys
    from pathlib import Path

    import duckdb

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    for name in ("asof_join_1h", "sessionize", "range_join_anomalies",
                 "ewm_1h", "value_quantiles"):
        ours = e.queries()[name](sf)
        if isinstance(ours, ray.data.Dataset):
            ours = ours.to_pandas()
        theirs = con.sql(e.oracle_sql()[name]).df()
        a, b = _canon(ours), _canon(theirs)
        assert list(a.columns) == list(b.columns)
        assert len(a) == len(b) and len(a) > 0
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            assert av.dtype == bv.dtype, (name, c, av.dtype, bv.dtype)
            np.testing.assert_array_equal(av, bv, err_msg=f"{name}.{c}")
