"""DuckDB oracle generator for the cointegration pair tests
(Phillips-Ouliaris residual test + Johansen trace test, p=2, lag=2).

Mirrors functions/cointegration._po_exact_int and _johansen_exact_int
term-for-term:

- pair series = the union of every type's gap-filled hourly buckets
  with COALESCE 0 (the pivot+fillna(0) the Ray query performs);
- P-O: closed-form 2x2 OLS over exact integer power sums, per-row
  residuals as fixed expressions, ascending ordered list_sum folds for
  every float dot product, the Bartlett long-run variance as the same
  guarded CASE chain as the PP oracle, and the np.interp p-value CASE;
- Johansen: the QR projection is replaced (on BOTH sides) by OLS
  residuals from the exact-integer 3x3 normal equations solved by a
  fully unrolled Cholesky (one CTE stage per column — same binder
  blowup avoidance as oracle/archlm_sql.py), residual cross-moments
  S00/S01/S11 as ordered folds, the 2x2 eigenproblem in closed form
  (quadratic formula, guarded sqrt), libm logs (DuckDB ln == math.log
  on this host), Osterwald-Lenum p-value interpolation and the 5%
  rank decision as CASEs.

Reference drives these through urca:
/root/reference/R/features.R:249-261, :330-335.
"""

from __future__ import annotations

from ..functions.cointegration import _CLIP_HI, _JO_TRACE_CVAL, _PO_CVAL
from .x11_sql import _lit

_L_MAX = 12  # Bartlett lag cap: L = trunc(4*(nn/100)^0.25) <= 12 for nn <~ 65k


def _interp3_case(xs, ys, v: str) -> str:
    """np.interp over a 3-knot ascending constant table, rule-2 clamps —
    the same branch structure and formula shape as _interp3."""
    s01 = (float(ys[1]) - float(ys[0])) / (float(xs[1]) - float(xs[0]))
    s12 = (float(ys[2]) - float(ys[1])) / (float(xs[2]) - float(xs[1]))
    return (f"CASE WHEN {v} <= {_lit(xs[0])} THEN {_lit(ys[0])} "
            f"WHEN {v} >= {_lit(xs[2])} THEN {_lit(ys[2])} "
            f"WHEN {v} < {_lit(xs[1])} THEN "
            f"{_lit(s01)} * ({v} - {_lit(xs[0])}) + {_lit(ys[0])} "
            f"ELSE {_lit(s12)} * ({v} - {_lit(xs[1])}) + {_lit(ys[1])} END")


def cointegration_pairs_sql(sec_cte: str) -> str:
    """``sec_cte``: a CTE body named sec with (event_type, bucket) rows
    at hourly buckets (the shared _EV_SEC body)."""
    # ---- P-O: Bartlett chain (same shape as pp_sql's lam2) -----------
    elags = ", ".join(f"lag(e, {l}) OVER w AS el{l}"
                      for l in range(1, _L_MAX + 1))
    edots = ",\n    ".join(
        f"list_sum(list(e * el{l} ORDER BY bucket)) AS d{l}"
        for l in range(1, _L_MAX + 1))
    lam2 = "(ss_e / nn)"
    for l in range(1, _L_MAX + 1):
        w = f"(1.0e0 - {l} / (L + 1.0e0))"
        lam2 = (f"({lam2} + CASE WHEN {l} <= L THEN "
                f"((2.0e0 / nn) * {w}) * d{l} ELSE 0.0e0 END)")
    cv = _PO_CVAL[1]
    po_pval = _interp3_case([cv[2], cv[1], cv[0]], [0.01, 0.05, 0.10],
                            "z_alpha")
    cv0 = _JO_TRACE_CVAL[2]
    jo_pval = _interp3_case([cv0[0], cv0[1], cv0[2]], [0.10, 0.05, 0.01],
                            "trace0")

    # ---- Johansen: 4 targets, unrolled 3x3 Cholesky solves -----------
    tgts = ("d0a", "d0b", "l1a", "l1b")
    csums = ",\n    ".join(
        f"CAST(SUM({k}) AS BIGINT) AS c_{k}_0, "
        f"CAST(SUM(za * {k}) AS BIGINT) AS c_{k}_1, "
        f"CAST(SUM(zb * {k}) AS BIGINT) AS c_{k}_2" for k in tgts)
    solves = []
    for k in tgts:
        solves += [
            f"CAST(c_{k}_0 AS DOUBLE) / l_0_0 AS w_{k}_0",
            f"(CAST(c_{k}_1 AS DOUBLE) - l_1_0 * w_{k}_0) / l_1_1 AS w_{k}_1",
            f"((CAST(c_{k}_2 AS DOUBLE) - l_2_0 * w_{k}_0) - l_2_1 * w_{k}_1)"
            f" / l_2_2 AS w_{k}_2",
            f"w_{k}_2 / l_2_2 AS beta_{k}_2",
            f"(w_{k}_1 - l_2_1 * beta_{k}_2) / l_1_1 AS beta_{k}_1",
            f"((w_{k}_0 - l_1_0 * beta_{k}_1) - l_2_0 * beta_{k}_2) / l_0_0"
            f" AS beta_{k}_0",
        ]
    solve_cols = ",\n    ".join(solves)
    resid = ",\n    ".join(
        f"(CAST(r.{k} AS DOUBLE) - ((b.beta_{k}_0 + b.beta_{k}_1 * r.za)"
        f" + b.beta_{k}_2 * r.zb)) AS r_{k}" for k in tgts)
    folds = ",\n    ".join(
        f"list_sum(list(r_{p} * r_{q} ORDER BY bucket)) AS f_{p}_{q}"
        for p, q in (("d0a", "d0a"), ("d0a", "d0b"), ("d0b", "d0b"),
                     ("l1a", "l1a"), ("l1a", "l1b"), ("l1b", "l1b"),
                     ("d0a", "l1a"), ("d0a", "l1b"),
                     ("d0b", "l1a"), ("d0b", "l1b")))

    hi = _lit(_CLIP_HI)
    return f"""
WITH {sec_cte},
agg AS (SELECT event_type, bucket, COUNT(*) AS x FROM sec GROUP BY event_type, bucket),
span AS (SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg GROUP BY event_type),
dense AS (SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS bucket FROM span),
du AS (SELECT DISTINCT bucket FROM dense),
tys AS (SELECT DISTINCT event_type FROM agg),
val AS (
  SELECT t.event_type, d.bucket, COALESCE(a.x, 0) AS x
  FROM du d CROSS JOIN tys t
  LEFT JOIN agg a ON a.event_type = t.event_type AND a.bucket = d.bucket),
prs AS (SELECT a.event_type AS ta, b.event_type AS tb
        FROM tys a JOIN tys b ON a.event_type < b.event_type),
pr AS (
  SELECT p.ta || '|' || p.tb AS pair, va.bucket, va.x AS xa, vb.x AS xb
  FROM prs p
  JOIN val va ON va.event_type = p.ta
  JOIN val vb ON vb.event_type = p.tb AND vb.bucket = va.bucket),
prw AS (
  SELECT pair, bucket, xa, xb,
    ROW_NUMBER() OVER w AS rn,
    COUNT(*) OVER (PARTITION BY pair) AS n,
    lead(xa, 1) OVER w AS xa1, lead(xa, 2) OVER w AS xa2,
    lead(xb, 1) OVER w AS xb1, lead(xb, 2) OVER w AS xb2
  FROM pr WINDOW w AS (PARTITION BY pair ORDER BY bucket)),
pog AS (
  SELECT pair, ANY_VALUE(n) AS n,
    CAST(SUM(xa) AS BIGINT) AS sy, CAST(SUM(xb) AS BIGINT) AS sx,
    CAST(SUM(xb*xb) AS BIGINT) AS sxx, CAST(SUM(xa*xb) AS BIGINT) AS sxy
  FROM prw GROUP BY pair),
pob AS (
  SELECT *, CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS b1
  FROM pog),
pob2 AS (SELECT *, (CAST(sy AS DOUBLE) - b1 * CAST(sx AS DOUBLE)) / n AS b0 FROM pob),
pou AS (
  SELECT r.pair, r.bucket, r.rn, r.n,
    (CAST(r.xa AS DOUBLE) - g.b0) - g.b1 * CAST(r.xb AS DOUBLE) AS u
  FROM prw r JOIN pob2 g USING (pair)),
poul AS (
  SELECT pair, bucket, rn, n, u,
    lead(u, 1) OVER (PARTITION BY pair ORDER BY bucket) AS un
  FROM pou),
pou2 AS (SELECT * FROM poul WHERE rn <= n - 1),
pof AS (
  SELECT pair, COUNT(*) AS nn,
    list_sum(list(u*u ORDER BY bucket)) AS denom,
    list_sum(list(u*un ORDER BY bucket)) AS num
  FROM pou2 GROUP BY pair),
por AS (SELECT *, num / denom AS rho,
        CAST(trunc(4.0e0 * power(nn / 100.0e0, 0.25e0)) AS BIGINT) AS L
        FROM pof),
poe AS (
  SELECT r.pair, r.bucket, (r.un - g.rho * r.u) AS e
  FROM pou2 r JOIN por g USING (pair)),
poel AS (
  SELECT pair, bucket, e, {elags}
  FROM poe WINDOW w AS (PARTITION BY pair ORDER BY bucket)),
pod AS (
  SELECT pair, list_sum(list(e*e ORDER BY bucket)) AS ss_e,
    {edots}
  FROM poel GROUP BY pair),
poz AS (
  SELECT pair, nn, rho, denom, L, ss_e,
    (ss_e / nn) AS gamma0, {lam2} AS lam2
  FROM por JOIN pod USING (pair)),
postat AS (
  SELECT pair,
    nn * (rho - 1.0e0) - ((((lam2 - gamma0) / 2.0e0) * nn) * nn) / denom AS z_alpha
  FROM poz),
pores AS (SELECT pair, z_alpha AS po_stat, {po_pval} AS po_pvalue FROM postat),
jr AS (
  SELECT pair, bucket,
    (xa1 - xa) AS za, (xb1 - xb) AS zb,
    (xa2 - xa1) AS d0a, (xb2 - xb1) AS d0b,
    xa AS l1a, xb AS l1b
  FROM prw WHERE rn <= n - 2),
jg AS (
  SELECT pair, COUNT(*) AS t,
    CAST(SUM(za) AS BIGINT) AS g01, CAST(SUM(zb) AS BIGINT) AS g02,
    CAST(SUM(za*za) AS BIGINT) AS g11, CAST(SUM(za*zb) AS BIGINT) AS g12,
    CAST(SUM(zb*zb) AS BIGINT) AS g22,
    {csums}
  FROM jr GROUP BY pair),
ch0 AS (SELECT *,
    CAST(t AS DOUBLE) AS a_0,
    sqrt(CASE WHEN a_0 > 0.0e0 THEN a_0 ELSE 1.0e0 END) AS l_0_0,
    CAST(g01 AS DOUBLE) / l_0_0 AS l_1_0,
    CAST(g02 AS DOUBLE) / l_0_0 AS l_2_0
  FROM jg),
ch1 AS (SELECT *,
    (CAST(g11 AS DOUBLE) - l_1_0 * l_1_0) AS a_1,
    sqrt(CASE WHEN a_1 > 0.0e0 THEN a_1 ELSE 1.0e0 END) AS l_1_1,
    (CAST(g12 AS DOUBLE) - l_2_0 * l_1_0) / l_1_1 AS l_2_1
  FROM ch0),
ch2 AS (SELECT *,
    ((CAST(g22 AS DOUBLE) - l_2_0 * l_2_0) - l_2_1 * l_2_1) AS a_2,
    sqrt(CASE WHEN a_2 > 0.0e0 THEN a_2 ELSE 1.0e0 END) AS l_2_2
  FROM ch1),
jsolve AS (SELECT *,
    {solve_cols}
  FROM ch2),
jres AS (
  SELECT r.pair, r.bucket,
    {resid}
  FROM jr r JOIN jsolve b USING (pair)),
jf AS (
  SELECT pair,
    {folds}
  FROM jres GROUP BY pair),
jm0 AS (
  SELECT s.pair, s.t, (s.a_0 <= 0.0e0 OR s.a_1 <= 0.0e0 OR s.a_2 <= 0.0e0) AS sing,
    f.f_d0a_d0a / s.t AS s00aa, f.f_d0a_d0b / s.t AS s00ab, f.f_d0b_d0b / s.t AS s00bb,
    f.f_l1a_l1a / s.t AS s11aa, f.f_l1a_l1b / s.t AS s11ab, f.f_l1b_l1b / s.t AS s11bb,
    f.f_d0a_l1a / s.t AS s01aa, f.f_d0a_l1b / s.t AS s01ab,
    f.f_d0b_l1a / s.t AS s01ba, f.f_d0b_l1b / s.t AS s01bb
  FROM jsolve s JOIN jf f USING (pair)),
jm1 AS (
  SELECT *,
    s00aa * s00bb - s00ab * s00ab AS det00,
    s11aa * s11bb - s11ab * s11ab AS det11
  FROM jm0),
jm2 AS (
  SELECT *,
    (s00bb * s01aa - s00ab * s01ba) / det00 AS k00,
    (s00bb * s01ab - s00ab * s01bb) / det00 AS k01,
    (s00aa * s01ba - s00ab * s01aa) / det00 AS k10,
    (s00aa * s01bb - s00ab * s01ab) / det00 AS k11
  FROM jm1),
jm3 AS (
  SELECT *,
    s01aa * k00 + s01ba * k10 AS q00,
    s01aa * k01 + s01ba * k11 AS q01,
    s01ab * k00 + s01bb * k10 AS q10,
    s01ab * k01 + s01bb * k11 AS q11
  FROM jm2),
jm4 AS (
  SELECT *,
    (s11bb * q00 - s11ab * q10) / det11 AS m00,
    (s11bb * q01 - s11ab * q11) / det11 AS m01,
    (s11aa * q10 - s11ab * q00) / det11 AS m10,
    (s11aa * q11 - s11ab * q01) / det11 AS m11
  FROM jm3),
jm5 AS (
  SELECT *, m00 + m11 AS tr, m00 * m11 - m01 * m10 AS dt
  FROM jm4),
jm6 AS (
  SELECT *, tr * tr - 4.0e0 * dt AS disc
  FROM jm5),
jm7 AS (
  SELECT *,
    sqrt(CASE WHEN disc >= 0.0e0 THEN disc ELSE 0.0e0 END) AS sq,
    CASE WHEN disc >= 0.0e0 THEN (tr + sq) / 2.0e0 ELSE tr / 2.0e0 END AS lam1r,
    CASE WHEN disc >= 0.0e0 THEN (tr - sq) / 2.0e0 ELSE tr / 2.0e0 END AS lam2r
  FROM jm6),
jm8 AS (
  SELECT *,
    least(greatest(lam1r, 0.0e0), {hi}) AS lam1,
    least(greatest(lam2r, 0.0e0), {hi}) AS lam2
  FROM jm7),
jm9 AS (
  SELECT *,
    (-t) * (ln(1.0e0 - lam1) + ln(1.0e0 - lam2)) AS trace0,
    (-t) * ln(1.0e0 - lam2) AS trace1
  FROM jm8),
jores AS (
  SELECT pair,
    CASE WHEN sing OR det00 = 0.0e0 OR det11 = 0.0e0 THEN NULL
         ELSE trace0 END AS johansen_trace,
    CASE WHEN sing OR det00 = 0.0e0 OR det11 = 0.0e0 THEN NULL
         ELSE {jo_pval} END AS johansen_pvalue,
    CASE WHEN sing OR det00 = 0.0e0 OR det11 = 0.0e0 THEN NULL
         WHEN trace0 < {_lit(cv0[1])} THEN 0.0e0
         WHEN trace1 < {_lit(_JO_TRACE_CVAL[1][1])} THEN 1.0e0
         ELSE 2.0e0 END AS johansen_rank
  FROM jm9)
SELECT p.pair, p.po_stat, p.po_pvalue,
  j.johansen_trace, j.johansen_pvalue, j.johansen_rank
FROM pores p JOIN jores j USING (pair)
"""
