"""gg_arma / gg_irf data layers: known-root and psi-weight pins plus
the SQL-mirror bit-identity (reference surfaces R/graphics.R gg_arma,
gg_irf; coefficients fitted here by DL on the exact ACF)."""

import duckdb
import numpy as np
import pandas as pd

from feasts_ray.functions.acf import acf_exact_int
from feasts_ray.functions.arma import (
    ar2_inverse_roots,
    ar_coefs_seq,
    ar_inverse_roots,
    ar_psi_weights,
)


class TestArmaRoots:
    def test_known_real_roots(self):
        # z^2 - 1.1 z + 0.28 = (z - 0.7)(z - 0.4): phi1=1.1, phi2=-0.28
        r = ar2_inverse_roots(1.1, -0.28)
        np.testing.assert_allclose([r[0][0], r[1][0]], [0.7, 0.4], atol=1e-12)
        assert r[0][1] == 0.0 and r[1][1] == 0.0

    def test_known_complex_roots(self):
        # phi1=1.0, phi2=-0.5 -> roots 0.5 +- 0.5i (modulus sqrt(0.5))
        r = ar2_inverse_roots(1.0, -0.5)
        np.testing.assert_allclose(r[0], (0.5, 0.5), atol=1e-12)
        np.testing.assert_allclose(r[1], (0.5, -0.5), atol=1e-12)

    def test_general_p_matches_quadratic(self):
        got = ar_inverse_roots([1.1, -0.28])
        np.testing.assert_allclose(got, [(0.7, 0.0), (0.4, 0.0)], atol=1e-12)
        # p=3 via numpy.roots: (z-0.5)(z-0.3)(z+0.2)
        # = z^3 - 0.6 z^2 - 0.01 z + 0.03
        got3 = ar_inverse_roots([0.6, 0.01, -0.03])
        mods = sorted(abs(complex(a, b)) for a, b in got3)
        np.testing.assert_allclose(mods, [0.2, 0.3, 0.5], atol=1e-10)


class TestPsiWeights:
    def test_ar1_geometric(self):
        psi = ar_psi_weights([0.5], 10)
        np.testing.assert_allclose(psi, 0.5 ** np.arange(11), rtol=1e-15)

    def test_ar3_recursion(self):
        phi = [0.4, 0.2, -0.1]
        psi = ar_psi_weights(phi, 20)
        assert psi[0] == 1.0
        for h in range(1, 21):
            want = sum(phi[j] * (psi[h - 1 - j] if h - 1 - j >= 0 else 0.0)
                       for j in range(3))
            np.testing.assert_allclose(psi[h], want, rtol=1e-15)


class TestSqlMirror:
    def _series(self, n=400, seed=2):
        rng = np.random.default_rng(seed)
        t = np.arange(n)
        return np.rint(20 + 8 * np.sin(2 * np.pi * t / 24)
                       + rng.poisson(4, n)).astype(np.int64)

    def _frame(self):
        rows = []
        for et, seed in (("A", 2), ("B", 9)):
            y = self._series(seed=seed)
            for i, v in enumerate(y):
                rows.append((et, 1000 + i * 3600, int(v)))
        return pd.DataFrame(rows, columns=["event_type", "bucket", "x"])

    def test_roots_and_irf_bit_exact(self):
        from feasts_ray.oracle.arma_sql import arma_roots_sql, irf_sql

        df = self._frame()
        con = duckdb.connect()
        con.register("series_src", df)
        cte = "series AS (SELECT * FROM series_src)"
        roots_sql = con.execute(arma_roots_sql(cte)).fetchdf()
        irf_sql_df = con.execute(irf_sql(cte, h_max=24)).fetchdf()
        for et in ("A", "B"):
            x = df[df.event_type == et].sort_values("bucket")["x"].to_numpy()
            rho = acf_exact_int(x, 3)
            phi2 = ar_coefs_seq(rho, 2)
            roots = ar2_inverse_roots(phi2[0], phi2[1])
            sq = roots_sql[roots_sql.event_type == et].sort_values("root")
            for i, (re, im) in enumerate(roots):
                assert np.float64(re).view(np.int64) == \
                    np.float64(sq["re"].iloc[i]).view(np.int64)
                assert np.float64(im).view(np.int64) == \
                    np.float64(sq["im"].iloc[i]).view(np.int64)
            # stationary fit: inverse roots inside the unit circle
            assert all(abs(complex(a, b)) < 1.0 for a, b in roots)
            phi3 = ar_coefs_seq(rho, 3)
            psi = ar_psi_weights(phi3, 24)
            sq2 = irf_sql_df[irf_sql_df.event_type == et].sort_values("h")
            got = sq2["irf"].to_numpy(np.float64)
            assert (psi.view(np.int64) == got.view(np.int64)).all()
