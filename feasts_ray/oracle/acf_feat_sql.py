"""DuckDB oracle generator for the feat_acf feature family over integer
series.

Every rho_k is the exact power-sum correlation expression (same form as
the acf_1h_counts / acf_table_1h oracles):

  rho_k = ((Sxy_k - m*(H_k + T_k)) + ((n-k)*m)*m) / (SS - S*m),  m = S/n

and the acf10-style sums of squares are LEFT-ASSOCIATED chains mirroring
the kernel's ordered fold (functions/features._fold_sq). diff series are
integer diffs of the input, so their power sums are exact too.

Reference semantics: /root/reference/R/features.R:616-653.
"""

from __future__ import annotations

_L = "abcdefghijklmnopqrstuvwxyz"


def _acf_block(src: str, p: str, K: int) -> str:
    """CTE chain from ``src`` (event_type, bucket, x:int) to ``{p}r``
    with per-key columns n, r1..rK."""
    leads = ", ".join(f"lead(x, {l}) OVER w AS x{l}" for l in range(1, K + 1))
    aggs = ", ".join(
        f"SUM(x * x{l}) AS sxy{l}, "
        f"SUM(CASE WHEN k <= n - {l} THEN x END) AS h{l}, "
        f"SUM(CASE WHEN k >= {l + 1} THEN x END) AS t{l}"
        for l in range(1, K + 1))
    rhos = ", ".join(
        f"(((sxy{l} - m * (h{l} + t{l})) + ((n - {l}) * m) * m)"
        f" / (SS - S * m)) AS r{l}"
        for l in range(1, K + 1))
    return f"""
{p}i AS (
  SELECT event_type, x, ROW_NUMBER() OVER w AS k,
    COUNT(*) OVER (PARTITION BY event_type) AS n, {leads}
  FROM {src} WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
{p}g AS (
  SELECT event_type, ANY_VALUE(n) AS n, SUM(x) AS S, SUM(x*x) AS SS, {aggs}
  FROM {p}i GROUP BY event_type),
{p}r AS (
  SELECT event_type, n, {rhos} FROM (SELECT *, S / n AS m FROM {p}g))"""


def _sq_chain(prefix: str, lo: int, hi: int) -> str:
    """Left-associated sum of squares r_lo^2 + ... + r_{hi-1}^2."""
    s = f"({prefix}r{lo} * {prefix}r{lo})"
    for k in range(lo + 1, hi):
        s = f"({s} + {prefix}r{k} * {prefix}r{k})"
    return s


def feat_acf_sql(series_cte: str, period: int = 24) -> str:
    """Oracle for feat_acf over gap-filled integer counts: per key
    acf1/acf10 of x (lag_max = period), of diff1 and diff2 (lag 10),
    plus season_acf1 = rho_period."""
    return f"""
WITH {series_cte},
fd1 AS (
  SELECT event_type, bucket, x - xp AS x FROM (
    SELECT event_type, bucket, x,
      lag(x) OVER (PARTITION BY event_type ORDER BY bucket) AS xp
    FROM series) WHERE xp IS NOT NULL),
fd2 AS (
  SELECT event_type, bucket, x - xp AS x FROM (
    SELECT event_type, bucket, x,
      lag(x) OVER (PARTITION BY event_type ORDER BY bucket) AS xp
    FROM fd1) WHERE xp IS NOT NULL),
{_acf_block('series', 'fa', period)},
{_acf_block('fd1', 'fb', 10)},
{_acf_block('fd2', 'fc', 10)}
SELECT a.event_type,
  a.r1 AS acf1,
  {_sq_chain('a.', 1, 11)} AS acf10,
  b.r1 AS diff1_acf1,
  {_sq_chain('b.', 1, 11)} AS diff1_acf10,
  c.r1 AS diff2_acf1,
  {_sq_chain('c.', 1, 11)} AS diff2_acf10,
  a.r{period} AS season_acf1
FROM far a
JOIN fbr b ON b.event_type = a.event_type
JOIN fcr c ON c.event_type = a.event_type
"""
