"""DuckDB oracle generator for the KPSS level test + ndiffs over
integer series.

Mirrors the exact-int kernel `functions/unitroot._kpss_mu_exact_int`
term-for-term: every aggregate is an exact integer power sum; the only
float operations are the fixed expressions documented there, emitted
here in the same order with e0-suffixed DOUBLE literals. The running
sum Σ s_k² folds list_sum over an ORDERED list (sequential, matching
the kernel's ascending Python loop).

KPSS 1992 statistic; p-values by stats::approx(rule=2) interpolation of
the published Table-1 critical values (same table as the kernel).
Reference drives this via urca: /root/reference/R/features.R:139-144,
ndiffs loop :181-203.
"""

from __future__ import annotations

from ..functions.unitroot import _KPSS_CVAL, _KPSS_PCT
from .x11_sql import _lit

_L_MAX = 12  # Bartlett terms emitted; guarded by l <= L at runtime


def _pval_case(stat: str) -> str:
    """np.interp(stat, cvals, pcts) with rule=2 clamping, as a CASE whose
    slope literals are the same Python doubles np.interp derives."""
    xs = _KPSS_CVAL["mu"]
    ys = _KPSS_PCT
    parts = [f"WHEN {stat} <= {_lit(xs[0])} THEN {_lit(ys[0])}",
             f"WHEN {stat} >= {_lit(xs[-1])} THEN {_lit(ys[-1])}"]
    for j in range(len(xs) - 1):
        slope = (float(ys[j + 1]) - float(ys[j])) / (float(xs[j + 1]) - float(xs[j]))
        seg = f"({_lit(slope)} * ({stat} - {_lit(xs[j])}) + {_lit(ys[j])})"
        if j < len(xs) - 2:
            parts.append(f"WHEN {stat} < {_lit(xs[j + 1])} THEN {seg}")
        else:
            parts.append(f"ELSE {seg}")
    return "CASE " + " ".join(parts) + " END"


def kpss_ctes(src: str, p: str) -> str:
    """CTE chain computing (event_type, kpss_stat, kpss_pvalue) as
    ``{p}out`` from CTE ``src`` of (event_type, bucket, x:int) rows."""
    leads = ", ".join(
        f"lead(x, {l}) OVER w AS x{l}" for l in range(1, _L_MAX + 1))
    sxys = ", ".join(
        f"SUM(x * x{l}) AS sxy{l}" for l in range(1, _L_MAX + 1))
    hts = ", ".join(
        f"SUM(CASE WHEN k <= n - {l} THEN x END) AS h{l}, "
        f"SUM(CASE WHEN k >= {l + 1} THEN x END) AS t{l}"
        for l in range(1, _L_MAX + 1))
    # lrv chain in the kernel's ascending-l accumulation order
    lrv = "(e2 / n)"
    for l in range(1, _L_MAX + 1):
        w = f"(1.0e0 - {l} / (L + 1.0e0))"
        dot = (f"((sxy{l} - m * (h{l} + t{l}))"
               f" + ((n - {l}) * m) * m)")
        lrv = (f"({lrv} + CASE WHEN {l} <= L THEN "
               f"((2.0e0 / n) * {w}) * {dot} ELSE 0.0e0 END)")
    return f"""
{p}i AS (
  SELECT event_type, bucket, x,
    ROW_NUMBER() OVER w AS k,
    COUNT(*) OVER (PARTITION BY event_type) AS n,
    SUM(x) OVER (PARTITION BY event_type ORDER BY bucket
                 ROWS UNBOUNDED PRECEDING) AS ck,
    {leads}
  FROM {src} WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
{p}g AS (
  SELECT event_type, ANY_VALUE(n) AS n, SUM(x) AS S, SUM(x*x) AS SS,
    {sxys}, {hts}
  FROM {p}i GROUP BY event_type),
{p}s AS (
  SELECT i.event_type,
    list_sum(list((CAST(i.ck AS DOUBLE) - i.k * (g.S / g.n))
                  * (CAST(i.ck AS DOUBLE) - i.k * (g.S / g.n))
                  ORDER BY i.k)) AS ss2
  FROM {p}i i JOIN {p}g g USING (event_type) GROUP BY i.event_type),
{p}m AS (
  SELECT g.*, s.ss2, g.S / g.n AS m,
    g.SS - g.S * (g.S / g.n) AS e2,
    CAST(trunc(4.0e0 * power(n / 100.0e0, 0.25e0)) AS BIGINT) AS L
  FROM {p}g g JOIN {p}s s USING (event_type)),
{p}out AS (
  SELECT event_type, ss2 / ((n * n) * {lrv}) AS kpss_stat,
    {_pval_case(f"(ss2 / ((n * n) * {lrv}))")} AS kpss_pvalue
  FROM {p}m)"""


def unitroot_sql(series_cte: str) -> str:
    """Full oracle for the unitroot_1h query: per event_type
    (kpss_stat, kpss_pvalue, ndiffs) over gap-filled integer counts.
    ndiffs mirrors features.unitroot_ndiffs' candidate-set rule:
    2 if kpss(diff1) rejects at 0.05, else 1 if kpss(x) rejects, else 0."""
    return f"""
WITH {series_cte},
d1 AS (
  SELECT event_type, bucket, x - xp AS x FROM (
    SELECT event_type, bucket, x,
      lag(x) OVER (PARTITION BY event_type ORDER BY bucket) AS xp
    FROM series) WHERE xp IS NOT NULL),
{kpss_ctes('series', 'k0')},
{kpss_ctes('d1', 'k1')}
SELECT a.event_type, a.kpss_stat, a.kpss_pvalue,
  CASE WHEN b.kpss_pvalue < 0.05e0 THEN 2.0e0
       WHEN a.kpss_pvalue < 0.05e0 THEN 1.0e0
       ELSE 0.0e0 END AS ndiffs
FROM k0out a JOIN k1out b USING (event_type)
"""
