"""Ray stage wrappers vs direct kernel calls: features (grouped + token
list-column), ACF/PACF/CCF tables, STL/classical decompositions, checks."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from feasts_ray.functions.acf import acf as acf_kernel, ccf as ccf_kernel, pacf as pacf_kernel
from feasts_ray.functions.features import feat_acf, feat_stl
from feasts_ray.functions.stl import classical_decompose, estimate_stl
from feasts_ray.stages.cf import ACF, CCF, PACF
from feasts_ray.stages.checks import GapCheckError, check_gaps, check_regular
from feasts_ray.stages.decompose import classical_decomposition, generate_mbb, stl_decomposition
from feasts_ray.stages.features import extract_features, extract_features_tokens


def _two_series():
    rng = np.random.default_rng(10)
    t = np.arange(144)
    rows = []
    for key, phase in (("a", 0.0), ("b", 2.0)):
        y = 20 + 5 * np.sin(2 * np.pi * (t / 12) + phase) + rng.normal(0, 1, len(t))
        for i, v in zip(t, y):
            rows.append({"key": key, "t": int(i), "value": float(v)})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def keyed_df():
    return _two_series()


@pytest.fixture(scope="module")
def keyed_ds(keyed_df):
    # shuffle row order to prove kernels sort within group
    return ray.data.from_pandas(keyed_df.sample(frac=1.0, random_state=3))


def _series(df, key):
    sub = df[df["key"] == key].sort_values("t")
    return sub["value"].to_numpy()


def test_extract_features_matches_kernel(keyed_ds, keyed_df):
    out = (
        extract_features(keyed_ds, "value", ["key"], period=12,
                         names=["feat_acf", "feat_stl", "n_crossing_points"], time_col="t")
        .to_pandas()
        .sort_values("key", ignore_index=True)
    )
    assert len(out) == 2  # one row per series (reference features() contract)
    for key in ("a", "b"):
        x = _series(keyed_df, key)
        exp = {**feat_acf(x, 12), **feat_stl(x, 12)}
        row = out[out["key"] == key].iloc[0]
        for k, v in exp.items():
            assert row[k] == pytest.approx(v, rel=1e-9), (key, k)


def test_acf_table_matches_kernel(keyed_ds, keyed_df):
    out = ACF(keyed_ds, "value", ["key"], time_col="t").to_pandas()
    for key in ("a", "b"):
        x = _series(keyed_df, key)
        exp = acf_kernel(x)[1:]
        got = out[out["key"] == key].sort_values("lag")
        np.testing.assert_allclose(got["acf"].to_numpy(), exp, atol=1e-12)
        np.testing.assert_array_equal(got["lag"].to_numpy(), np.arange(1, len(exp) + 1))
        assert (got["num_obs"] == len(x)).all()


def test_pacf_table_matches_kernel(keyed_ds, keyed_df):
    out = PACF(keyed_ds, "value", ["key"], time_col="t").to_pandas()
    x = _series(keyed_df, "a")
    exp = pacf_kernel(x)
    got = out[out["key"] == "a"].sort_values("lag")["pacf"].to_numpy()
    np.testing.assert_allclose(got, exp, atol=1e-12)


def test_ccf_table(keyed_df):
    df = keyed_df[keyed_df["key"] == "a"].copy()
    df["value2"] = df["value"].shift(3).fillna(0.0)
    ds = ray.data.from_pandas(df)
    out = CCF(ds, "value", "value2", ["key"], time_col="t").to_pandas().sort_values("lag")
    lags, exp = ccf_kernel(df.sort_values("t")["value"].to_numpy(),
                           df.sort_values("t")["value2"].to_numpy())
    np.testing.assert_allclose(out["ccf"].to_numpy(), exp, atol=1e-12)
    np.testing.assert_array_equal(out["lag"].to_numpy(), lags)


def test_stl_decomposition_stage(keyed_ds, keyed_df):
    dcmp = stl_decomposition(keyed_ds, "value", ["key"], periods=[12], time_col="t")
    out = dcmp.components().to_pandas()
    for key in ("a", "b"):
        x = _series(keyed_df, key)
        exp = estimate_stl(x, season_args={"12": {"period": 12}})
        got = out[out["key"] == key].sort_values("t")
        np.testing.assert_allclose(got["trend"].to_numpy(), exp["trend"], atol=1e-10)
        np.testing.assert_allclose(got["season_12"].to_numpy(), exp["season_12"], atol=1e-10)
        # reconstruction alias: value = trend + season + remainder
        np.testing.assert_allclose(
            got["value"].to_numpy(),
            got["trend"].to_numpy() + got["season_12"].to_numpy() + got["remainder"].to_numpy(),
            atol=1e-10,
        )
    fit = dcmp.fitted().to_pandas()
    np.testing.assert_allclose(
        fit[".fitted"].to_numpy(), (fit["value"] - fit["remainder"]).to_numpy(), atol=1e-12
    )


def test_classical_decomposition_stage(keyed_ds, keyed_df):
    out = (
        classical_decomposition(keyed_ds, "value", ["key"], period=12, time_col="t")
        .components()
        .to_pandas()
    )
    x = _series(keyed_df, "a")
    exp = classical_decompose(x, 12)
    got = out[out["key"] == "a"].sort_values("t")
    np.testing.assert_allclose(got["seasonal"].to_numpy(), exp["seasonal"], atol=1e-10)
    np.testing.assert_allclose(got["trend"].to_numpy(), exp["trend"], atol=1e-10)


def test_generate_mbb_deterministic(keyed_ds):
    dcmp = stl_decomposition(keyed_ds, "value", ["key"], periods=[12], time_col="t")
    comp = dcmp.components()
    sims1 = generate_mbb(comp, "value", ["key"], period=12, times=2, time_col="t").to_pandas()
    sims2 = generate_mbb(comp, "value", ["key"], period=12, times=2, time_col="t").to_pandas()
    s1 = sims1.sort_values(["key", ".rep", "t"], ignore_index=True)
    s2 = sims2.sort_values(["key", ".rep", "t"], ignore_index=True)
    np.testing.assert_allclose(s1[".sim"].to_numpy(), s2[".sim"].to_numpy())  # seeded per key
    assert set(s1[".rep"]) == {0, 1}


def test_token_feature_stage():
    from feasts_ray.synth import ensure_token_table

    path = ensure_token_table(300)
    ds = ray.data.read_parquet(path)
    out = extract_features_tokens(
        ds, period=60, names=["feat_acf", "n_crossing_points"]
    ).to_pandas()
    assert len(out) == 300
    assert {"doc_id", "source", "acf1", "season_acf1", "n_crossing_points"} <= set(out.columns)
    # spot-check one doc against the direct kernel
    row = out[out["doc_id"] == "doc-00000007"].iloc[0]
    import pyarrow.dataset as pads

    tok = (
        pads.dataset(path).to_table(columns=["doc_id", "tokens"]).to_pandas()
    )
    x = np.asarray(tok[tok["doc_id"] == "doc-00000007"]["tokens"].iloc[0], dtype=np.float64)
    exp = feat_acf(x, 60)
    assert row["acf1"] == pytest.approx(exp["acf1"], rel=1e-9)


def test_checks(keyed_ds):
    df = pd.DataFrame({"key": ["k"] * 5, "bucket": [0, 60, 120, 240, 300], "v": 1.0})
    ds = ray.data.from_pandas(df)
    with pytest.raises(GapCheckError):
        check_gaps(ds, "key", "bucket", 60)
    rep = check_gaps(ds, "key", "bucket", 60, strict=False)
    assert rep["has_gaps"].iloc[0]
    ok = ray.data.from_pandas(pd.DataFrame({"key": ["k"] * 4, "bucket": [0, 60, 120, 180]}))
    assert not check_gaps(ok, "key", "bucket", 60)["has_gaps"].any()
    assert check_regular(ok, "key", "bucket")["regular"].all()


def test_seasonal_subseries_and_lag_pairs(keyed_ds, keyed_df):
    from feasts_ray.stages.seasonal import lag_pairs, seasonal_subseries

    sub = seasonal_subseries(keyed_ds, value_col="value", key_col="key",
                             bucket_col="t", interval_s=1, period="minute"
                             ).to_pandas()
    # phases 0..59, every key present
    assert set(sub["key"]) == set(keyed_df["key"])
    assert sub["phase"].between(0, 59).all()
    for (k, p), grp in keyed_df.assign(phase=keyed_df["t"] % 60).groupby(["key", "phase"]):
        row = sub[(sub["key"] == k) & (sub["phase"] == p)].iloc[0]
        assert row["n"] == len(grp)
        np.testing.assert_allclose(row["mean_value"], grp["value"].mean())

    lp = lag_pairs(keyed_ds, value_col="value", key_col="key", time_col="t",
                   lags=(1, 3)).to_pandas()
    for k, grp in keyed_df.groupby("key"):
        g = grp.sort_values("t")
        y = g["value"].to_numpy()
        one = lp[(lp["key"] == k) & (lp["lag"] == 1)].sort_values("t")
        np.testing.assert_allclose(one["y"].to_numpy(), y[1:])
        np.testing.assert_allclose(one["y_lagged"].to_numpy(), y[:-1])


def test_rolling_matches_pandas(keyed_ds, keyed_df):
    from feasts_ray.stages.rolling import rolling

    out = rolling(keyed_ds, value_col="value", key_col="key", time_col="t",
                  size=7, stats=("mean", "var", "count")).to_pandas()
    for k, grp in keyed_df.groupby("key"):
        g = grp.sort_values("t")
        r = g["value"].rolling(7, min_periods=1)
        got = out[out["key"] == k].sort_values("t")
        np.testing.assert_allclose(got["roll_mean"].to_numpy(),
                                   r.mean().to_numpy())
        np.testing.assert_allclose(got["roll_var"].to_numpy(),
                                   r.var().to_numpy(), equal_nan=True)
        np.testing.assert_array_equal(got["roll_count"].to_numpy(),
                                      r.count().to_numpy())


def test_x11_decomposition_stage(ray_session):
    """X11-style additive adjustment recovers a planted seasonal pattern
    and satisfies the reconstruction identity."""
    from feasts_ray.stages.decompose import x11_decomposition

    n, p = 240, 12
    t = np.arange(n, dtype=float)
    seasonal = np.tile(np.sin(2 * np.pi * np.arange(p) / p) * 5, n // p)
    rng = np.random.default_rng(1)
    rows = []
    for key in ("a", "b"):
        y = 0.1 * t + seasonal + rng.normal(0, 0.3, n)
        rows.append(pd.DataFrame({"key": key, "t": t, "value": y}))
    ds = ray.data.from_pandas(pd.concat(rows, ignore_index=True))
    out = x11_decomposition(ds, "value", ["key"], period=p,
                            time_col="t").components().to_pandas()
    assert len(out) == 2 * n
    for key, g in out.groupby("key"):
        g = g.sort_values("t")
        np.testing.assert_allclose(
            g["trend"] + g["seasonal"] + g["remainder"], g["value"], atol=1e-9)
        sl = slice(3 * p, n - 3 * p)
        assert np.abs(g["seasonal"].to_numpy()[sl] - seasonal[sl]).mean() < 0.4
