"""DuckDB oracle generator for the feat_pacf feature family over integer
series: exact power-sum rho (same expression as the acf oracles) + a
recursive-CTE Durbin-Levinson whose list_sum inner products accumulate
sequentially — mirroring functions/acf.pacf_from_acf_seq term-for-term
(the same recursion the pacf_table_1h oracle validates). The pacf5 sums
of squares are left-associated chains (functions/features._fold_sq).

Reference semantics: /root/reference/R/features.R:669-695.
"""

from __future__ import annotations


def _pacf_block(src: str, p: str, K: int, unit_s: int) -> str:
    """CTE chain from ``src`` (event_type, bucket, x:int) to ``{p}out``
    with per-key column pcf = [pacf_1 .. pacf_K] (DOUBLE list)."""
    return f"""
{p}st AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS s, SUM(x*x) AS ss
          FROM {src} GROUP BY event_type),
{p}ls AS (
  SELECT a.event_type, k.lag AS lag, SUM(a.x * b.x) AS sxy,
         SUM(a.x) AS h, SUM(b.x) AS t, COUNT(*) AS cnt
  FROM {src} a
  JOIN (SELECT range AS lag FROM range(1, {K + 1})) k ON TRUE
  JOIN {src} b ON b.event_type = a.event_type
               AND b.bucket = a.bucket + k.lag * {unit_s}
  GROUP BY a.event_type, k.lag),
{p}rho AS (
  SELECT l.event_type, l.lag,
    ((l.sxy - (CAST(st.s AS DOUBLE) / st.n) * (l.h + l.t))
      + (l.cnt * (CAST(st.s AS DOUBLE) / st.n)) * (CAST(st.s AS DOUBLE) / st.n))
    / (st.ss - st.s * (CAST(st.s AS DOUBLE) / st.n)) AS rho
  FROM {p}ls l JOIN {p}st st ON st.event_type = l.event_type),
{p}rl AS (SELECT event_type, [1.0::DOUBLE] || list(rho ORDER BY lag) AS rho
          FROM {p}rho GROUP BY event_type),
{p}rec AS (
  SELECT event_type, 1 AS k, [rho[2]] AS phi, [rho[2]] AS pcf FROM {p}rl
  UNION ALL
  SELECT r.event_type, r.k + 1,
    list_append(
      list_transform(range(1, r.k + 1),
                     j -> r.phi[j] - ((rl.rho[r.k + 2]
                         - list_sum(list_transform(range(1, r.k + 1),
                                    i -> r.phi[i] * rl.rho[r.k + 2 - i])))
                        / (1.0 - list_sum(list_transform(range(1, r.k + 1),
                                    i -> r.phi[i] * rl.rho[i + 1]))))
                       * r.phi[r.k + 1 - j]),
      (rl.rho[r.k + 2]
         - list_sum(list_transform(range(1, r.k + 1),
                    i -> r.phi[i] * rl.rho[r.k + 2 - i])))
        / (1.0 - list_sum(list_transform(range(1, r.k + 1),
                    i -> r.phi[i] * rl.rho[i + 1])))),
    list_append(r.pcf,
      (rl.rho[r.k + 2]
         - list_sum(list_transform(range(1, r.k + 1),
                    i -> r.phi[i] * rl.rho[r.k + 2 - i])))
        / (1.0 - list_sum(list_transform(range(1, r.k + 1),
                    i -> r.phi[i] * rl.rho[i + 1]))))
  FROM {p}rec r JOIN {p}rl rl ON rl.event_type = r.event_type
  WHERE r.k < {K}),
{p}out AS (SELECT event_type, pcf FROM {p}rec WHERE k = {K})"""


def _sq_chain(col: str, K: int) -> str:
    s = f"({col}[1] * {col}[1])"
    for k in range(2, K + 1):
        s = f"({s} + {col}[{k}] * {col}[{k}])"
    return s


def feat_pacf_sql(series_cte: str, period: int = 24, unit_s: int = 3600) -> str:
    """Oracle for feat_pacf over gap-filled integer counts. Durbin-
    Levinson is incremental, so the diff series only recurse to lag 5
    (pacf_1..5 are identical at any deeper lag_max); x recurses to
    ``period`` for season_pacf."""
    return f"""
WITH RECURSIVE {series_cte},
pd1 AS (
  SELECT event_type, bucket, x - xp AS x FROM (
    SELECT event_type, bucket, x,
      lag(x) OVER (PARTITION BY event_type ORDER BY bucket) AS xp
    FROM series) WHERE xp IS NOT NULL),
pd2 AS (
  SELECT event_type, bucket, x - xp AS x FROM (
    SELECT event_type, bucket, x,
      lag(x) OVER (PARTITION BY event_type ORDER BY bucket) AS xp
    FROM pd1) WHERE xp IS NOT NULL),
{_pacf_block('series', 'pa', period, unit_s)},
{_pacf_block('pd1', 'pb', 5, unit_s)},
{_pacf_block('pd2', 'pc', 5, unit_s)}
SELECT a.event_type,
  {_sq_chain('a.pcf', 5)} AS pacf5,
  {_sq_chain('b.pcf', 5)} AS diff1_pacf5,
  {_sq_chain('c.pcf', 5)} AS diff2_pacf5,
  a.pcf[{period}] AS season_pacf
FROM paout a
JOIN pbout b ON b.event_type = a.event_type
JOIN pcout c ON c.event_type = a.event_type
"""
