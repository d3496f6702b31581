"""The SQL-mirrored exact STL path: float-path parity and the bitwise
DuckDB mirror (the stl_1h driver-oracle device, oracle/stl_sql.py)."""

import duckdb
import numpy as np
import pandas as pd

from feasts_ray.functions.stl import (
    estimate_stl,
    stl_decompose,
    stl_decompose_exact,
    stl_exact_applicable,
    stl_exact_config,
)
from feasts_ray.oracle.stl_sql import stl_sql


def _series(n: int, seed: int) -> np.ndarray:
    r = np.random.default_rng(seed)
    t = np.arange(n)
    return np.rint(40 + 12 * np.sin(2 * np.pi * t / 24) + 0.02 * t
                   + r.poisson(6, n)).astype(np.float64)


class TestStlExactPath:
    def test_matches_float_path(self):
        """Same algorithm, different summation order: components agree
        to float-noise tolerance and reconstruct exactly."""
        y = _series(715, 1)
        cfg = stl_exact_config(24, 11)
        assert cfg["t_window"] == 43 and cfg["l_window"] == 25
        assert stl_exact_applicable(y, cfg)
        fe = stl_decompose_exact(y, cfg)
        ff = stl_decompose(y, 24, s_window=11)
        for k in ("seasonal", "trend", "remainder"):
            assert np.max(np.abs(fe[k] - ff[k])) < 1e-9
        est = estimate_stl(y, season_args={"24": {"period": 24}})
        assert np.array_equal(est["trend"], fe["trend"])
        recon = y - est["season_24"] - est["trend"] - est["remainder"]
        assert np.max(np.abs(recon)) == 0.0

    def test_short_series_falls_back(self):
        """Series below the regime (per-phase length < s_window + 2) use
        the float path — estimate_stl still returns valid components."""
        y = _series(143, 2)
        cfg = stl_exact_config(24, 11)
        assert not stl_exact_applicable(y, cfg)
        est = estimate_stl(y, season_args={"24": {"period": 24}})
        assert np.isfinite(est["trend"]).all()

    def test_feat_stl_exact_matches_float(self):
        """The exact feat_stl path agrees with the float path to
        summation-order noise on every feature."""
        from feasts_ray.functions import features as F

        y = _series(715, 5)
        ex = F.feat_stl(y, period=24)
        fl = F.feat_stl(y, period=24, robust=False)  # kwargs -> float path
        assert set(ex) == set(fl)
        for k in ex:
            assert abs(ex[k] - fl[k]) <= 1e-9 * max(1.0, abs(fl[k])), k

    def test_feat_stl_sql_mirror_bit_exact(self):
        """feat_stl_sql reproduces _feat_stl_exact bit-for-bit."""
        from feasts_ray.functions import features as F
        from feasts_ray.oracle.stl_sql import feat_stl_sql

        rows = []
        for et, (n, seed) in {"A": (715, 1), "B": (720, 2)}.items():
            y = _series(n, seed)
            for i in range(n):
                rows.append((et, 1000 + i * 3600, int(y[i])))
        df = pd.DataFrame(rows, columns=["event_type", "bucket", "x"])
        con = duckdb.connect()
        con.register("series_src", df)
        sql = feat_stl_sql("series AS (SELECT * FROM series_src)",
                           period=24, s_window=11)
        odf = con.execute(sql).fetchdf().set_index("event_type")
        for et, g in df.groupby("event_type"):
            y = g.sort_values("bucket")["x"].to_numpy(dtype=np.float64)
            feats = F.feat_stl(y, period=24)
            for k, v in feats.items():
                sv = float(odf.loc[et, k])
                assert np.array(v).view(np.int64) == np.array(sv).view(np.int64), (et, k)

    def test_nsdiffs_sql_mirror_both_branches(self):
        """nsdiffs_sql agrees with unitroot_nsdiffs bit-for-bit on a
        strongly seasonal series (D=1 branch) and a weak one (D=0) —
        the driver data sits at D=0, so the suite pins the other side."""
        from feasts_ray.functions.features import unitroot_nsdiffs
        from feasts_ray.oracle.stl_sql import nsdiffs_sql

        r = np.random.default_rng(9)
        t = np.arange(715)
        strong = np.rint(40 + 60 * np.sin(2 * np.pi * t / 24)
                         + r.poisson(3, 715)).astype(np.float64)
        weak = _series(715, 4)
        rows = []
        for et, y in (("S", strong), ("W", weak)):
            for i in range(len(y)):
                rows.append((et, 1000 + i * 3600, int(y[i])))
        df = pd.DataFrame(rows, columns=["event_type", "bucket", "x"])
        con = duckdb.connect()
        con.register("series_src", df)
        sql = nsdiffs_sql("series AS (SELECT * FROM series_src)",
                          period=24, s_window=11)
        odf = con.execute(sql).fetchdf().set_index("event_type")
        got_s = unitroot_nsdiffs(strong, period=24)["nsdiffs"]
        got_w = unitroot_nsdiffs(weak, period=24)["nsdiffs"]
        assert got_s == 1.0  # the strong-seasonality branch fires
        assert float(odf.loc["S", "nsdiffs"]) == got_s
        assert float(odf.loc["W", "nsdiffs"]) == got_w

    def test_sql_mirror_bit_exact(self):
        """The generated DuckDB SQL reproduces stl_decompose_exact
        bit-for-bit across series lengths (incl. an exact multiple of
        the period, where per-phase lengths are equal)."""
        rows = []
        for et, (n, seed) in {"A": (715, 1), "B": (720, 2),
                              "C": (349, 3)}.items():
            y = _series(n, seed)
            for i in range(n):
                rows.append((et, 1000 + i * 3600, int(y[i])))
        df = pd.DataFrame(rows, columns=["event_type", "bucket", "x"])
        con = duckdb.connect()
        con.register("series_src", df)
        sql = stl_sql("series AS (SELECT * FROM series_src)",
                      period=24, s_window=11)
        odf = (con.execute(sql).fetchdf()
               .sort_values(["event_type", "bucket"]).reset_index(drop=True))
        cfg = stl_exact_config(24, 11)
        for et, g in df.groupby("event_type"):
            y = g.sort_values("bucket")["x"].to_numpy(dtype=np.float64)
            assert stl_exact_applicable(y, cfg)
            fit = stl_decompose_exact(y, cfg)
            o = odf[odf.event_type == et].sort_values("bucket")
            for k, col in (("trend", "trend"), ("seasonal", "season_24"),
                           ("remainder", "remainder")):
                a, b = fit[k], o[col].to_numpy()
                assert (a.view(np.int64) == b.view(np.int64)).all(), (et, k)
            sa = y - fit["seasonal"]
            b = o["season_adjust"].to_numpy()
            assert (sa.view(np.int64) == b.view(np.int64)).all()
