"""DuckDB oracle generator for the Phillips-Perron Z-tau test (constant
model) over integer series.

Mirrors functions/unitroot._pp_ztau_exact_int term-for-term: the 2x2 OLS
is closed-form over exact integer power sums (det and the b1 numerator
are BIGINTs; b1 is a single division), residuals are per-row fixed
expressions, all residual dot products fold sequentially via list_sum
over ORDERED lists (NULL lag products are skipped, matching the
kernel's pair range), and the two-stage p-value interpolation (Fuller
tau_mu critical values over sample size, then stat over the interpolated
row) is a CASE whose slope literals are the same doubles np.interp
derives. Reference drives this via urca: /root/reference/R/features.R:152-159.
"""

from __future__ import annotations

from ..functions.unitroot import _DF_PCT, _DF_TAU_MU, _DF_TAU_MU_N
from .x11_sql import _lit

_L_MAX = 12


def _cval_case(j: int, n0: str = "n0") -> str:
    """np.interp(n0, _DF_TAU_MU_N, _DF_TAU_MU[:, j]) with rule=2 clamps."""
    xs = _DF_TAU_MU_N
    ys = _DF_TAU_MU[:, j]
    parts = [f"WHEN {n0} <= {_lit(xs[0])} THEN {_lit(ys[0])}",
             f"WHEN {n0} >= {_lit(xs[-1])} THEN {_lit(ys[-1])}"]
    for i in range(len(xs) - 1):
        slope = (float(ys[i + 1]) - float(ys[i])) / (float(xs[i + 1]) - float(xs[i]))
        seg = f"({_lit(slope)} * ({n0} - {_lit(xs[i])}) + {_lit(ys[i])})"
        if i < len(xs) - 2:
            parts.append(f"WHEN {n0} < {_lit(xs[i + 1])} THEN {seg}")
        else:
            parts.append(f"ELSE {seg}")
    return "CASE " + " ".join(parts) + " END"


def pp_ztau_sql(series_cte: str) -> str:
    y0, y1, y2 = (_lit(v) for v in _DF_PCT)  # 0.01, 0.05, 0.10
    lags = ", ".join(f"lag(e, {l}) OVER w AS e{l}" for l in range(1, _L_MAX + 1))
    dots = ", ".join(
        f"list_sum(list(e * e{l} ORDER BY bucket)) AS d{l}"
        for l in range(1, _L_MAX + 1))
    lam2 = "gamma0"
    for l in range(1, _L_MAX + 1):
        w = f"(1.0e0 - {l} / (L + 1.0e0))"
        lam2 = (f"({lam2} + CASE WHEN {l} <= L THEN "
                f"((2.0e0 / n) * {w}) * d{l} ELSE 0.0e0 END)")
    # runtime slopes of the second interpolation stage: the fp diffs are
    # the same compile-order subtractions np.interp performs
    seg01 = f"((({y1} - {y0}) / (c1 - c0)) * (stat - c0) + {y0})"
    seg12 = f"((({y2} - {y1}) / (c2 - c1)) * (stat - c1) + {y1})"
    return f"""
WITH {series_cte},
ui AS (
  SELECT event_type, bucket, x,
    lag(x) OVER w AS xl,
    COUNT(*) OVER (PARTITION BY event_type) AS n0
  FROM series WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
ur AS (SELECT * FROM ui WHERE xl IS NOT NULL),
ug AS (
  SELECT event_type, ANY_VALUE(n0) AS n0, COUNT(*) AS n,
    SUM(x) AS sy, SUM(xl) AS sl, SUM(xl*xl) AS sll, SUM(x*xl) AS syl
  FROM ur GROUP BY event_type),
ub AS (
  SELECT *, (Sy_b1 - Sl_b1) / det AS b1 FROM (
    SELECT *, n*sll - sl*sl AS det, n*syl AS Sy_b1, sl*sy AS Sl_b1 FROM ug)),
ub2 AS (SELECT *, (sy - b1*sl) / n AS b0 FROM ub),
ue AS (
  SELECT r.event_type, r.bucket, (r.x - g.b0) - g.b1 * r.xl AS e
  FROM ur r JOIN ub2 g USING (event_type)),
uel AS (
  SELECT event_type, bucket, e, {lags}
  FROM ue WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
uf AS (
  SELECT event_type, list_sum(list(e*e ORDER BY bucket)) AS ss_e, {dots}
  FROM uel GROUP BY event_type),
um AS (
  SELECT g.*, f.*,
    CAST(trunc(4.0e0 * power(g.n / 100.0e0, 0.25e0)) AS BIGINT) AS L,
    f.ss_e / (g.n - 2) AS s2,
    f.ss_e / g.n AS gamma0,
    sqrt((f.ss_e / (g.n - 2)) * (g.n / g.det)) AS se_rho
  FROM ub2 g JOIN uf f USING (event_type)),
us AS (
  SELECT *, (b1 - 1.0e0) / se_rho AS t_stat, {lam2} AS lam2 FROM um),
uz AS (
  SELECT event_type, n0,
    sqrt(gamma0 / lam2) * t_stat
      - (((lam2 - gamma0) * n) * se_rho)
        / ((2.0e0 * sqrt(lam2)) * sqrt(s2)) AS stat
  FROM us),
uc AS (
  SELECT *, {_cval_case(0)} AS c0, {_cval_case(1)} AS c1, {_cval_case(2)} AS c2
  FROM uz)
SELECT event_type, stat AS pp_stat,
  CASE WHEN stat <= c0 THEN {y0}
       WHEN stat >= c2 THEN {y2}
       WHEN stat < c1 THEN {seg01}
       ELSE {seg12} END AS pp_pvalue
FROM uc
"""
