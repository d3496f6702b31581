"""DuckDB oracles for the gg_arma / gg_irf data layers.

Both ride the exact integer-power-sum ACF block (oracle/acf_feat_sql.py
— the expression proven bit-exact by acf_1h_counts / feat_acf_1h) and
then mirror functions/arma.py token-for-token:

  Durbin-Levinson order 2/3 with left-associated inner sums,
  AR(2) inverse roots by the quadratic formula (CASE on the
  discriminant sign), and the psi-weight recursion as a recursive CTE
  whose step expression `((a1*v) + (a2*v1)) + (a3*v2)` is the kernel's
  exact three-term tree (zero-padded history).

All float literals use e-notation (``2.0e0``): a bare ``2.0`` is
DECIMAL in DuckDB and would change the expression's types.
"""

from __future__ import annotations

from .acf_feat_sql import _acf_block

# Durbin-Levinson order-2 coefficients from r1, r2 (mirrors
# functions/arma.ar_coefs_seq at p=2)
_PHI2 = """
coef AS (
  SELECT event_type,
    r1 - ((r2 - r1 * r1) / (1.0e0 - r1 * r1)) * r1 AS phi1,
    (r2 - r1 * r1) / (1.0e0 - r1 * r1) AS phi2,
    r1, r2, r3
  FROM far)"""

# order-3 step on top of (phi1, phi2): s_num = (phi1*r2) + (phi2*r1),
# s_den = (phi1*r1) + (phi2*r2), pk3 = (r3 - s_num) / (1 - s_den)
_PHI3 = """
coef3 AS (
  SELECT event_type,
    phi1 - ((r3 - ((phi1 * r2) + (phi2 * r1)))
            / (1.0e0 - ((phi1 * r1) + (phi2 * r2)))) * phi2 AS a1,
    phi2 - ((r3 - ((phi1 * r2) + (phi2 * r1)))
            / (1.0e0 - ((phi1 * r1) + (phi2 * r2)))) * phi1 AS a2,
    (r3 - ((phi1 * r2) + (phi2 * r1)))
      / (1.0e0 - ((phi1 * r1) + (phi2 * r2))) AS a3
  FROM coef)"""


def arma_roots_sql(series_cte: str) -> str:
    """Inverse AR(2) characteristic roots per key: (event_type, root,
    re, im), root 1 = '+' branch. Mirrors arma.ar2_inverse_roots."""
    return f"""
WITH {series_cte},
{_acf_block('series', 'fa', 3)},
{_PHI2},
d AS (SELECT event_type, phi1, phi2,
        phi1 * phi1 + 4.0e0 * phi2 AS disc FROM coef)
SELECT event_type, root,
  CASE WHEN disc >= 0.0e0 THEN
    CASE WHEN root = 1 THEN (phi1 + sqrt(disc)) / 2.0e0
         ELSE (phi1 - sqrt(disc)) / 2.0e0 END
  ELSE phi1 / 2.0e0 END AS re,
  CASE WHEN disc >= 0.0e0 THEN 0.0e0
  ELSE CASE WHEN root = 1 THEN sqrt(-disc) / 2.0e0
            ELSE -(sqrt(-disc) / 2.0e0) END END AS im
FROM d JOIN (SELECT CAST(1 AS BIGINT) AS root
             UNION ALL SELECT CAST(2 AS BIGINT)) r ON TRUE
"""


def tsresiduals_sql(series_cte: str) -> str:
    """AR(3) innovation residuals per key (gg_tsresiduals data layer):
    resid_t = ((xc_t - a1*xc_{t-1}) - a2*xc_{t-2}) - a3*xc_{t-3} over the
    demeaned series xc = x - S/n, t >= 4. Mirrors q_tsresiduals_1h's
    numpy expression tree exactly."""
    return f"""
WITH {series_cte},
{_acf_block('series', 'fa', 3)},
{_PHI2},
{_PHI3},
mn AS (SELECT event_type, CAST(SUM(x) AS DOUBLE) / COUNT(*) AS m
       FROM series GROUP BY event_type),
xc AS (
  SELECT s.event_type, s.bucket, s.x - mn.m AS v,
    lag(s.x, 1) OVER w - mn.m AS v1,
    lag(s.x, 2) OVER w - mn.m AS v2,
    lag(s.x, 3) OVER w - mn.m AS v3
  FROM series s JOIN mn ON mn.event_type = s.event_type
  WINDOW w AS (PARTITION BY s.event_type ORDER BY s.bucket))
SELECT x.event_type, x.bucket,
  ((x.v - c.a1 * x.v1) - c.a2 * x.v2) - c.a3 * x.v3 AS resid
FROM xc x JOIN coef3 c ON c.event_type = x.event_type
WHERE x.v3 IS NOT NULL
"""


def irf_sql(series_cte: str, h_max: int = 24) -> str:
    """AR(3) impulse responses per key, h = 0..h_max: (event_type, h,
    irf). Mirrors arma.ar_coefs_seq(p=3) + ar_psi_weights."""
    return f"""
WITH RECURSIVE {series_cte},
{_acf_block('series', 'fa', 3)},
{_PHI2},
{_PHI3},
psi AS (
  SELECT event_type, CAST(0 AS BIGINT) AS h,
    1.0e0 AS v, 0.0e0 AS v1, 0.0e0 AS v2, a1, a2, a3
  FROM coef3
  UNION ALL
  SELECT event_type, h + 1,
    ((a1 * v) + (a2 * v1)) + (a3 * v2), v, v1, a1, a2, a3
  FROM psi WHERE h < {h_max})
SELECT event_type, h, v AS irf FROM psi
"""
