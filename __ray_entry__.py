"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in feasts_ray) calls ray.init()/ray.shutdown().

Every SQL-expressible query's oracle computes the identical exact
integers (counts / cent-sums / bucket ids) and mirrors the identical
IEEE-double expression tree for derived floats, so the driver's
value-hash compare is bit-exact (see feasts_ray/pipelines/events.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship on sf0.001: events -> 1m continuous aggregate -> cascade
    to 1h (tier[k+1] from tier[k]) -> distributed gap-fill -> derived
    mean. Returns a streaming ray.data.Dataset."""
    from feasts_ray.pipelines.events import rollup_table

    return rollup_table("/root/testdata/sf0.001/events.parquet", 3600,
                        cascade_from_s=60, fill_gaps=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from feasts_ray.pipelines.queries import ALL_QUERIES

    return dict(ALL_QUERIES)


# ---- oracle SQL building blocks (kept in sync with pipelines/events.py) ----

_EV_SEC = ("SELECT event_type, (epoch_us(ts)//1000000//{u})*{u} AS bucket, "
           "CAST(ROUND(value*100) AS BIGINT) AS cents FROM events")

_ROLLUP = ("WITH sec AS ({sec}) "
           "SELECT event_type, bucket, COUNT(*) AS count, "
           "CAST(SUM(cents) AS BIGINT) AS sum_cents, MIN(cents) AS min_cents, "
           "MAX(cents) AS max_cents, "
           "(CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / 100.0 "
           "AS mean_val FROM sec GROUP BY event_type, bucket")


def _rollup_sql(unit_s: int) -> str:
    return _ROLLUP.format(sec=_EV_SEC.format(u=unit_s))


_GAPFILL_1H = """
WITH sec AS ({sec}),
agg AS (
  SELECT event_type, bucket, COUNT(*) AS count, SUM(cents) AS sum_cents,
         MIN(cents) AS min_cents, MAX(cents) AS max_cents
  FROM sec GROUP BY event_type, bucket),
span AS (SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg GROUP BY event_type),
dense AS (SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS bucket FROM span)
SELECT d.event_type, d.bucket,
       COALESCE(a.count, 0) AS count,
       CAST(COALESCE(a.sum_cents, 0) AS BIGINT) AS sum_cents,
       a.min_cents AS min_cents, a.max_cents AS max_cents,
       CASE WHEN a.count IS NOT NULL THEN
         (CAST(a.sum_cents AS DOUBLE) / CAST(a.count AS DOUBLE)) / 100.0 END AS mean_val
FROM dense d LEFT JOIN agg a ON a.event_type = d.event_type AND a.bucket = d.bucket
""".format(sec=_EV_SEC.format(u=3600))

_ACF_1H = """
WITH sec AS ({sec}),
agg AS (SELECT event_type, bucket, COUNT(*) AS x FROM sec GROUP BY event_type, bucket),
span AS (SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg GROUP BY event_type),
dense AS (SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS bucket FROM span),
series AS (
  SELECT d.event_type, d.bucket, COALESCE(a.x, 0) AS x
  FROM dense d LEFT JOIN agg a ON a.event_type = d.event_type AND a.bucket = d.bucket),
stats AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS s, SUM(x*x) AS ss FROM series GROUP BY event_type),
lags AS (
  SELECT a.event_type, k.lag AS lag, SUM(a.x * b.x) AS sxy,
         SUM(a.x) AS h, SUM(b.x) AS t, COUNT(*) AS cnt
  FROM series a
  JOIN (SELECT range AS lag FROM range(1, 25)) k ON TRUE
  JOIN series b ON b.event_type = a.event_type AND b.bucket = a.bucket + k.lag * 3600
  GROUP BY a.event_type, k.lag)
SELECT l.event_type, l.lag,
  ((l.sxy - (CAST(st.s AS DOUBLE) / st.n) * (l.h + l.t))
    + (l.cnt * (CAST(st.s AS DOUBLE) / st.n)) * (CAST(st.s AS DOUBLE) / st.n))
  / (st.ss - st.s * (CAST(st.s AS DOUBLE) / st.n)) AS acf
FROM lags l JOIN stats st ON st.event_type = l.event_type
""".format(sec=_EV_SEC.format(u=3600))


# gap-filled hourly integer-count series per event_type (shared CTE body)
_SERIES_1H = """
sec AS ({sec}),
agg AS (SELECT event_type, bucket, COUNT(*) AS x FROM sec GROUP BY event_type, bucket),
span AS (SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg GROUP BY event_type),
dense AS (SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS bucket FROM span),
series AS (
  SELECT d.event_type, d.bucket, COALESCE(a.x, 0) AS x
  FROM dense d LEFT JOIN agg a ON a.event_type = d.event_type AND a.bucket = d.bucket)
""".format(sec=_EV_SEC.format(u=3600))

_TSDISPLAY_1H = """
WITH {series},
stats AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS s, SUM(x*x) AS ss FROM series GROUP BY event_type),
lags AS (
  SELECT a.event_type, k.lag AS lag, SUM(a.x * b.x) AS sxy,
         SUM(a.x) AS h, SUM(b.x) AS t, COUNT(*) AS cnt
  FROM series a
  JOIN (SELECT range AS lag FROM range(1, 25)) k ON TRUE
  JOIN series b ON b.event_type = a.event_type AND b.bucket = a.bucket + k.lag * 3600
  GROUP BY a.event_type, k.lag),
p1 AS (SELECT event_type, 'series' AS panel, bucket AS px,
         CAST(x AS DOUBLE) AS py FROM series),
p2 AS (SELECT l.event_type, 'acf' AS panel, l.lag AS px,
  ((l.sxy - (CAST(st.s AS DOUBLE) / st.n) * (l.h + l.t))
    + (l.cnt * (CAST(st.s AS DOUBLE) / st.n)) * (CAST(st.s AS DOUBLE) / st.n))
  / (st.ss - st.s * (CAST(st.s AS DOUBLE) / st.n)) AS py
  FROM lags l JOIN stats st ON st.event_type = l.event_type),
p3 AS (SELECT event_type, 'season' AS panel, (bucket % 86400) // 3600 AS px,
         CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS py
       FROM series WHERE x > 0
       GROUP BY event_type, (bucket % 86400) // 3600)
SELECT event_type, panel, px AS x, py AS y FROM p1
UNION ALL SELECT event_type, panel, px, py FROM p2
UNION ALL SELECT event_type, panel, px, py FROM p3
""".format(series=_SERIES_1H)



# ACF table (cf stage): same exact-power-sum expression as _ACF_1H plus
# the stage's num_obs column.
_ACF_TABLE_1H = """
WITH {series},
stats AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS s, SUM(x*x) AS ss FROM series GROUP BY event_type),
lags AS (
  SELECT a.event_type, k.lag AS lag, SUM(a.x * b.x) AS sxy,
         SUM(a.x) AS h, SUM(b.x) AS t, COUNT(*) AS cnt
  FROM series a
  JOIN (SELECT range AS lag FROM range(1, 25)) k ON TRUE
  JOIN series b ON b.event_type = a.event_type AND b.bucket = a.bucket + k.lag * 3600
  GROUP BY a.event_type, k.lag)
SELECT l.event_type, l.lag,
  ((l.sxy - (CAST(st.s AS DOUBLE) / st.n) * (l.h + l.t))
    + (l.cnt * (CAST(st.s AS DOUBLE) / st.n)) * (CAST(st.s AS DOUBLE) / st.n))
  / (st.ss - st.s * (CAST(st.s AS DOUBLE) / st.n)) AS acf,
  CAST(st.n AS BIGINT) AS num_obs
FROM lags l JOIN stats st ON st.event_type = l.event_type
""".format(series=_SERIES_1H)

# PACF table: Durbin-Levinson recursion over the exact-power-sum ACF as
# a recursive CTE on DOUBLE[] state. DuckDB's list_sum accumulates
# sequentially left-to-right, mirrored by pacf_from_acf_seq's explicit
# sequential loops (feasts_ray/functions/acf.py) — bit-identical.
_PACF_TABLE_1H = """
WITH RECURSIVE {series},
stats AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS s, SUM(x*x) AS ss FROM series GROUP BY event_type),
lagsums AS (
  SELECT a.event_type, k.lag AS lag, SUM(a.x * b.x) AS sxy,
         SUM(a.x) AS h, SUM(b.x) AS t, COUNT(*) AS cnt
  FROM series a
  JOIN (SELECT range AS lag FROM range(1, 25)) k ON TRUE
  JOIN series b ON b.event_type = a.event_type AND b.bucket = a.bucket + k.lag * 3600
  GROUP BY a.event_type, k.lag),
rhotab AS (
  SELECT l.event_type, l.lag,
    ((l.sxy - (CAST(st.s AS DOUBLE) / st.n) * (l.h + l.t))
      + (l.cnt * (CAST(st.s AS DOUBLE) / st.n)) * (CAST(st.s AS DOUBLE) / st.n))
    / (st.ss - st.s * (CAST(st.s AS DOUBLE) / st.n)) AS rho
  FROM lagsums l JOIN stats st ON st.event_type = l.event_type),
rl AS (SELECT event_type, [1.0::DOUBLE] || list(rho ORDER BY lag) AS rho
       FROM rhotab GROUP BY event_type),
rec AS (
  SELECT event_type, 1 AS k, [rho[2]] AS phi, [rho[2]] AS pcf FROM rl
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
  FROM rec r JOIN rl ON rl.event_type = r.event_type
  WHERE r.k < 24)
SELECT f.event_type, j.lag AS lag, f.pcf[j.lag] AS pacf,
       CAST(st.n AS BIGINT) AS num_obs
FROM rec f
JOIN (SELECT range AS lag FROM range(1, 25)) j ON TRUE
JOIN stats st ON st.event_type = f.event_type
WHERE f.k = 24
""".format(series=_SERIES_1H)

# features() SQL-expressible subset: n_crossing_points (median crossings;
# DuckDB median == numpy nanmedian exactly for integer series) and
# longest_flat_spot (np.digitize over np.linspace interior edges == the
# k*step+lo expression; run lengths via gaps-and-islands).
_FEATURES_BASIC_1H = """
WITH {series},
med AS (SELECT event_type, median(CAST(x AS DOUBLE)) AS mid FROM series GROUP BY event_type),
fl AS (SELECT s.event_type, s.bucket, (CAST(s.x AS DOUBLE) <= m.mid) AS ab
       FROM series s JOIN med m ON m.event_type = s.event_type),
fl2 AS (SELECT event_type, ab,
          lag(ab) OVER (PARTITION BY event_type ORDER BY bucket) AS ab_prev
        FROM fl),
cr AS (SELECT event_type,
         SUM(CASE WHEN ab <> ab_prev THEN 1 ELSE 0 END) AS ncross
       FROM fl2 GROUP BY event_type),
mm AS (SELECT event_type, MIN(x) AS lo, MAX(x) AS hi FROM series GROUP BY event_type),
codes AS (
  SELECT s.event_type, s.bucket,
    (SELECT COUNT(*) FROM range(1, 10) k
     WHERE CAST(k.range AS DOUBLE)
             * ((CAST(m.hi AS DOUBLE) - CAST(m.lo AS DOUBLE)) / 10.0)
           + CAST(m.lo AS DOUBLE) < CAST(s.x AS DOUBLE)) AS code
  FROM series s JOIN mm m ON m.event_type = s.event_type),
runs AS (SELECT event_type, code,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket)
    - ROW_NUMBER() OVER (PARTITION BY event_type, code ORDER BY bucket) AS grp
  FROM codes),
flat AS (SELECT event_type, MAX(cnt) AS fmax FROM (
    SELECT event_type, code, grp, COUNT(*) AS cnt FROM runs
    GROUP BY event_type, code, grp) GROUP BY event_type)
SELECT c.event_type, CAST(c.ncross AS DOUBLE) AS n_crossing_points,
       CAST(f.fmax AS DOUBLE) AS longest_flat_spot
FROM cr c JOIN flat f ON f.event_type = c.event_type
""".format(series=_SERIES_1H)

# Exact-integer feature extractors (intermittency, tiled stability /
# lumpiness, level/variance shifts) over the gap-filled hourly counts.
# Every value mirrors the kernel's fixed IEEE expression over exact
# integer power sums: m = S/n; v = (SS - S*m)/(n-1); tile stats are one
# expression per tile; across-tile variances fold list_sum over an
# ORDERED tile list (sequential, like the kernel's Python loop); rolling
# shifts are window int sums with the kernel's division order.
_FEATURES_EXACT_1H = """
WITH {series},
idx AS (
  SELECT event_type, bucket, x,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket) - 1 AS t,
    COUNT(*) OVER (PARTITION BY event_type) AS n,
    lag(x) OVER (PARTITION BY event_type ORDER BY bucket) AS xp
  FROM series),
g AS (
  SELECT event_type, ANY_VALUE(n) AS n, SUM(x) AS S, SUM(x*x) AS SS,
    SUM(CASE WHEN x <> 0 THEN 1 ELSE 0 END) AS nz_cnt,
    SUM(CASE WHEN x <> 0 THEN x ELSE 0 END) AS S_nz,
    SUM(CASE WHEN x <> 0 THEN x*x ELSE 0 END) AS SS_nz,
    SUM(CASE WHEN x = 0 AND (xp IS NULL OR xp <> 0) THEN 1 ELSE 0 END) AS zr,
    MIN(CASE WHEN x <> 0 THEN t END) AS first_nz,
    MAX(CASE WHEN x <> 0 THEN t END) AS last_nz,
    MIN(CASE WHEN t = 0 THEN x END) AS x_first,
    MAX(CASE WHEN t = n - 1 THEN x END) AS x_last
  FROM idx GROUP BY event_type),
gs AS (
  SELECT *, S / n AS mu,
    sqrt((SS - S * (S / n)) / (n - 1)) AS sd,
    S_nz / nz_cnt AS mu_nz,
    (SS_nz - S_nz * (S_nz / nz_cnt)) / (nz_cnt - 1) AS v_nz
  FROM g),
interm AS (
  SELECT event_type,
    CASE WHEN nz_cnt = n THEN 0.0e0
         ELSE CAST(n - nz_cnt AS DOUBLE) / zr END AS zero_run_mean,
    (sqrt(v_nz) / mu_nz) * (sqrt(v_nz) / mu_nz) AS nonzero_squared_cv,
    CASE WHEN x_first = 0 THEN CAST(first_nz AS DOUBLE) / n
         ELSE 0.0e0 END AS zero_start_prop,
    CASE WHEN x_last = 0 THEN CAST(n - 1 - last_nz AS DOUBLE) / n
         ELSE 0.0e0 END AS zero_end_prop
  FROM gs),
tl AS (
  SELECT i.event_type, i.t // 24 AS tile, COUNT(*) AS c,
    SUM(i.x) AS S_t, SUM(i.x*i.x) AS SS_t,
    ANY_VALUE(s.mu) AS mu, ANY_VALUE(s.sd) AS sd
  FROM idx i JOIN gs s ON s.event_type = i.event_type
  GROUP BY i.event_type, i.t // 24),
tmean AS (
  SELECT event_type, list((S_t / c - mu) / sd ORDER BY tile) AS l
  FROM tl GROUP BY event_type),
tvar AS (
  SELECT event_type,
    list((((SS_t - S_t * (S_t / c)) / (c - 1)) / sd) / sd ORDER BY tile) AS l
  FROM tl WHERE c = 24 GROUP BY event_type),
vt AS (
  SELECT m.event_type,
    (list_sum(list_transform(m.l, z -> z*z))
     - list_sum(m.l) * (list_sum(m.l) / len(m.l))) / (len(m.l) - 1)
      AS var_tiled_mean,
    (list_sum(list_transform(v.l, z -> z*z))
     - list_sum(v.l) * (list_sum(v.l) / len(v.l))) / (len(v.l) - 1)
      AS var_tiled_var
  FROM tmean m JOIN tvar v ON v.event_type = m.event_type),
roll AS (
  SELECT event_type, bucket, t, n,
    SUM(x) OVER w24 AS s24,
    SUM(x*x) OVER w24 AS s224,
    COUNT(*) OVER w24 AS c24
  FROM idx
  WINDOW w24 AS (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
rstat AS (
  SELECT event_type, bucket, t, n,
    s24 / c24 AS rm,
    CASE WHEN c24 >= 2 THEN (s224 - (s24 * s24) / c24) / (c24 - 1) END AS rv
  FROM roll),
dstat AS (
  SELECT event_type, t,
    ABS(rm - lag(rm, 24) OVER w) AS dm,
    ABS(rv - lag(rv, 24) OVER w) AS dv
  FROM rstat
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
shift AS (
  SELECT d.event_type,
    MAX(d.dm) AS shift_level_max,
    CAST(MIN(CASE WHEN d.dm = mx.m_dm THEN d.t END) - 22 AS DOUBLE)
      AS shift_level_index,
    MAX(d.dv) AS shift_var_max,
    CAST(MIN(CASE WHEN d.dv = mx.m_dv THEN d.t END) - 22 AS DOUBLE)
      AS shift_var_index
  FROM dstat d JOIN (
    SELECT event_type, MAX(dm) AS m_dm, MAX(dv) AS m_dv
    FROM dstat GROUP BY event_type) mx ON mx.event_type = d.event_type
  GROUP BY d.event_type)
SELECT i.event_type, i.zero_run_mean, i.nonzero_squared_cv,
  i.zero_start_prop, i.zero_end_prop, v.var_tiled_mean, v.var_tiled_var,
  s.shift_level_max, s.shift_level_index, s.shift_var_max, s.shift_var_index
FROM interm i
JOIN vt v ON v.event_type = i.event_type
JOIN shift s ON s.event_type = i.event_type
""".format(series=_SERIES_1H)


# GPT-2-style pre-tokenizer count. Kernel and oracle share the SAME
# lookahead-free RE2 pattern (the engine counts via Arrow's RE2
# count_substring_regex), so they agree by construction. NOTE the
# GPT-2 lookahead variant is NOT count-equivalent: a whitespace run
# >= 2 ending in a non-space whitespace char (e.g. "a \tb") splits in
# two under the lookahead — the engine defines its count by this RE2
# pattern instead (test_bpe_count_matches_duckdb pins kernel==oracle
# on adversarial strings).
_BPE_COUNTS = (
    "SELECT doc_id, CAST(len(regexp_extract_all(text, "
    "'''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+'"
    ")) AS BIGINT) AS n_bpe_tokens FROM documents")

# Classical additive decomposition over the same count series. Mirrors
# the engine's exact-integer path (_classical_decompose_exact_int,
# feasts_ray/functions/stl.py): every output double is a single rounding
# division / subtraction over exact integers.
_CLASSICAL_1H = """
WITH {series},
idx AS (
  SELECT event_type, bucket, x,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket) - 1 AS t,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM series),
w AS (
  SELECT event_type, bucket, x, t % 24 AS phase,
    CASE WHEN t >= 12 AND t <= n - 13 THEN
      lag(x, 12) OVER win + lead(x, 12) OVER win
      + 2 * (SUM(x) OVER (PARTITION BY event_type ORDER BY bucket
                          ROWS BETWEEN 11 PRECEDING AND 11 FOLLOWING))
    END AS W
  FROM idx
  WINDOW win AS (PARTITION BY event_type ORDER BY bucket)),
d AS (SELECT *, CASE WHEN W IS NOT NULL THEN 48 * x - W END AS D FROM w),
ph AS (SELECT event_type, phase, CAST(SUM(D) AS BIGINT) AS A, COUNT(D) AS c
       FROM d WHERE D IS NOT NULL GROUP BY event_type, phase),
lt AS (SELECT event_type, lcm(MIN(c), MAX(c)) AS L FROM ph GROUP BY event_type),
ov AS (SELECT p.event_type, SUM(p.A * (l.L // p.c)) AS N, ANY_VALUE(l.L) AS L
       FROM ph p JOIN lt l USING (event_type) GROUP BY p.event_type),
fig AS (SELECT p.event_type, p.phase,
          CAST(p.A AS DOUBLE) / CAST(48 * p.c AS DOUBLE)
          - CAST(o.N AS DOUBLE) / CAST(48 * o.L * 24 AS DOUBLE) AS seasonal
        FROM ph p JOIN ov o USING (event_type))
SELECT d.event_type, d.bucket, CAST(d.x AS DOUBLE) AS value,
  CAST(d.W AS DOUBLE) / 48.0 AS trend,
  f.seasonal AS seasonal,
  (CAST(d.x AS DOUBLE) - f.seasonal) - CAST(d.W AS DOUBLE) / 48.0 AS random,
  CAST(d.x AS DOUBLE) - f.seasonal AS season_adjust
FROM d JOIN fig f ON f.event_type = d.event_type AND f.phase = d.phase
""".format(series=_SERIES_1H)


_CCF_1H = """
WITH sec AS (SELECT event_type, (epoch_us(ts)//1000000//3600)*3600 AS bucket FROM events),
agg AS (SELECT event_type, bucket, COUNT(*) AS c FROM sec GROUP BY event_type, bucket),
grid AS (SELECT unnest(generate_series((SELECT MIN(bucket) FROM agg),
                                       (SELECT MAX(bucket) FROM agg), 3600)) AS bucket),
t0 AS (SELECT MIN(event_type) AS et FROM agg),
t1 AS (SELECT MIN(event_type) AS et FROM agg WHERE event_type > (SELECT et FROM t0)),
sa AS (SELECT g.bucket, COALESCE(a.c, 0) AS x FROM grid g
       LEFT JOIN agg a ON a.bucket = g.bucket AND a.event_type = (SELECT et FROM t0)),
sb AS (SELECT g.bucket, COALESCE(a.c, 0) AS y FROM grid g
       LEFT JOIN agg a ON a.bucket = g.bucket AND a.event_type = (SELECT et FROM t1)),
stats AS (SELECT (SELECT COUNT(*) FROM sa) AS n,
                 (SELECT SUM(x) FROM sa) AS sxs, (SELECT SUM(x*x) FROM sa) AS ssx,
                 (SELECT SUM(y) FROM sb) AS sys, (SELECT SUM(y*y) FROM sb) AS ssy),
lags AS (SELECT k.lag AS lag, SUM(a.x * b.y) AS sxy, SUM(a.x) AS hx,
                SUM(b.y) AS ty, COUNT(*) AS cnt
         FROM sa a JOIN (SELECT range AS lag FROM range(-12, 13)) k ON TRUE
         JOIN sb b ON b.bucket = a.bucket + k.lag * 3600
         GROUP BY k.lag)
SELECT l.lag,
  (((((l.sxy - (CAST(st.sys AS DOUBLE) / st.n) * l.hx)
      - (CAST(st.sxs AS DOUBLE) / st.n) * l.ty)
     + (l.cnt * (CAST(st.sxs AS DOUBLE) / st.n)) * (CAST(st.sys AS DOUBLE) / st.n))
    / st.n)
   / (sqrt((st.ssy - st.sys * (CAST(st.sys AS DOUBLE) / st.n)) / st.n)
      * sqrt((st.ssx - st.sxs * (CAST(st.sxs AS DOUBLE) / st.n)) / st.n))) AS ccf
FROM lags l, stats st
"""


_LANG_SETS = {
    "en": "'the','and','of','to','a','in','is','it','that','for'",
    "de": "'der','die','und','das','ist','nicht','ein','zu','mit','den'",
    "fr": "'le','la','et','les','des','un','une','est','pour','que'",
    "es": "'el','la','de','que','y','los','un','es','en','por'",
}

# Exact word-3-gram Jaccard near-dup pairs. The engine's MinHash+LSH
# candidates are verified with the EXACT shingle-set Jaccard, so when
# banding recall is 1 over the >=threshold pairs (true here: the corpus
# pair similarities are cleanly separated, all >=0.9 vs <=0.2, and the
# 16-band/128-perm scheme catches j>=0.9 with P>0.9998) the output IS
# the exact pair set — SQL-computable from string 3-grams (the 64-bit
# shingle hashes are collision-free at this scale).
_MINHASH_PAIRS = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS tkn, generate_subscripts(ws, 1) AS i FROM w),
tri AS (
  SELECT DISTINCT a.doc_id, a.tkn || ' ' || b.tkn || ' ' || c.tkn AS sh
  FROM tok a
  JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN tok c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
short AS (SELECT doc_id, array_to_string(ws, ' ') AS sh FROM w WHERE len(ws) < 3),
sh_all AS (SELECT * FROM tri UNION SELECT * FROM short),
sizes AS (SELECT doc_id, COUNT(*) AS m FROM sh_all GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS ni
  FROM sh_all x JOIN sh_all y ON y.sh = x.sh AND y.doc_id > x.doc_id
  GROUP BY x.doc_id, y.doc_id)
SELECT i.id_a, i.id_b,
  CAST(i.ni AS DOUBLE) / CAST(sa.m + sb.m - i.ni AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE CAST(i.ni AS DOUBLE) / CAST(sa.m + sb.m - i.ni AS DOUBLE) >= 0.35
"""

# Same exact-Jaccard SQL at the prefix-filter query's threshold. For
# ngram_jaccard_dup_pairs this oracle needs NO recall assumption at all:
# the engine's prefix-filtered candidate generation is exhaustive by the
# Chaudhuri/Bayardo prefix lemma (feasts_ray/dedup/ngram.py), so the
# match is exact by construction, not by banding probability.
_NGRAM_PAIRS = _MINHASH_PAIRS.replace(">= 0.35", ">= 0.4")

# Near-dup cluster assignment: the exact-Jaccard pair set (same CTEs as
# _MINHASH_PAIRS) -> connected components by UNROLLED min-label
# propagation (8 rounds >= any component diameter in this corpus; the
# engine iterates the same integer recurrence to fixpoint, so labels are
# identical — pure int64 arithmetic, no float semantics).
def _make_cc_sql(pairs_sql: str, node_table: str, node_col: str,
                 rounds: int = 8) -> str:
    # AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, which
    # would re-evaluate the expensive pair subquery (and each round's
    # labels, referenced twice) once per downstream reference.
    # ``rounds`` must be >= the max distance from any component's min-id
    # node to its farthest member (the engine iterates the same integer
    # recurrence to fixpoint, so labels match once that bound holds).
    sql = f"""
WITH p AS MATERIALIZED (SELECT id_a, id_b FROM ({pairs_sql})),
e AS MATERIALIZED (SELECT id_a AS node, id_b AS other FROM p
      UNION ALL SELECT id_b, id_a FROM p),
l0 AS MATERIALIZED (SELECT {node_col} AS node, {node_col} AS label FROM {node_table})"""
    prev = "l0"
    for i in range(1, rounds + 1):
        sql += f""",
l{i} AS MATERIALIZED (
  SELECT n.node,
    LEAST(n.label, COALESCE(MIN(lo.label), n.label)) AS label
  FROM {prev} n
  LEFT JOIN e ON e.node = n.node
  LEFT JOIN {prev} lo ON lo.node = e.other
  GROUP BY n.node, n.label)"""
        prev = f"l{i}"
    sql += f"\nSELECT node AS {node_col}, label AS cluster_id FROM {prev}"
    return sql


_MINHASH_DEDUP_DOCS = _make_cc_sql(_MINHASH_PAIRS, "documents", "doc_id")

# Per-doc quality heuristics: every ratio is a fixed double expression
# over exact integer counts, so the engine kernel
# (feasts_ray/text/analysis.py::add_quality) matches bit-for-bit.
_TEXT_QUALITY = """
WITH c AS (
  SELECT doc_id,
    length(text) AS n_chars,
    length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}-]', '', 'g')) AS n_punct,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
    CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 0
         ELSE len(regexp_split_to_array(
             regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS n_words,
    len(list_filter(regexp_split_to_array(
            regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+'),
        x -> lower(x) IN ('the','and','of','to','a','in','is','it','that','for'))) AS n_stop
  FROM documents),
r AS (
  SELECT doc_id,
    CAST(n_punct AS DOUBLE) / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS punct_ratio,
    CAST(n_stop AS DOUBLE) / CAST(GREATEST(n_words, 1) AS DOUBLE) AS stopword_ratio,
    CAST(n_alpha AS DOUBLE) / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS alpha_ratio,
    CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(GREATEST(n_words, 1) AS DOUBLE)
      AS mean_word_len,
    n_chars FROM c)
SELECT doc_id, punct_ratio, stopword_ratio, alpha_ratio, mean_word_len,
  0.4 * LEAST(CAST(n_chars AS DOUBLE) / 500.0, 1.0)
  + 0.2 * (1.0 - LEAST(punct_ratio * 5.0, 1.0))
  + 0.2 * LEAST(stopword_ratio * 4.0, 1.0)
  + 0.2 * alpha_ratio AS quality_score
FROM r"""

# Quality-canonical dedup: per near-dup cluster keep the best-quality
# doc (min doc_id tie-break — exact-dup texts tie exactly on score).
# Both inputs are bit-exact (cluster labels: integer min-propagation;
# quality_score: fixed double tree over exact ints), and DuckDB's
# ORDER BY over identical doubles sorts identically, so the composite
# matches the engine's per-cluster argmax bit-for-bit
# (feasts_ray/dedup/keep_best.py).
_DEDUP_KEEP_BEST = (
    "WITH cc AS MATERIALIZED (" + _MINHASH_DEDUP_DOCS + "),\n"
    "q AS MATERIALIZED (SELECT doc_id, quality_score FROM ("
    + _TEXT_QUALITY + ")),\n"
    """j AS (SELECT cc.cluster_id, cc.doc_id, q.quality_score
      FROM cc JOIN q ON q.doc_id = cc.doc_id),
rnk AS (SELECT cluster_id, doc_id, quality_score,
  ROW_NUMBER() OVER (PARTITION BY cluster_id
                     ORDER BY quality_score DESC, doc_id ASC) AS rn,
  COUNT(*) OVER (PARTITION BY cluster_id) AS n_members FROM j)
SELECT cluster_id, doc_id AS keep_id, quality_score AS keep_quality,
  CAST(n_members AS BIGINT) AS n_members
FROM rnk WHERE rn = 1""")

# Semantic dedup over embeddings: the EXACT cosine pair set (identical to
# the embedding_dup_pairs_exact oracle, recall 1) -> the same unrolled
# min-label propagation. 10 rounds >= any min-to-member distance in this
# corpus (max BFS eccentricity measured 3 at sf0.001/sf0.01).
_EMBEDDING_PAIRS_EXACT = (
    "SELECT a.vec_id AS id_a, b.vec_id AS id_b "
    "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
    "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4e0")
_EMBEDDING_DEDUP_DOCS = _make_cc_sql(_EMBEDDING_PAIRS_EXACT,
                                     "embeddings", "vec_id", rounds=10)

_LANGID = """
WITH w AS (
  SELECT doc_id,
    list_distinct(list_transform(string_split(text, ' '), x -> lower(x))) AS ws
  FROM documents),
c AS (
  SELECT doc_id,
    len(list_filter(ws, x -> x IN ({en}))) AS n_en,
    len(list_filter(ws, x -> x IN ({de}))) AS n_de,
    len(list_filter(ws, x -> x IN ({fr}))) AS n_fr,
    len(list_filter(ws, x -> x IN ({es}))) AS n_es
  FROM w)
SELECT doc_id,
  CASE WHEN n_en = 0 AND n_de = 0 AND n_fr = 0 AND n_es = 0 THEN 'und'
       WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
       WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
       WHEN n_fr >= n_es THEN 'fr'
       ELSE 'es' END AS lang_pred
FROM c""".format(**_LANG_SETS)


def oracle_sql() -> dict[str, str]:
    from feasts_ray.oracle.acf_feat_sql import feat_acf_sql
    from feasts_ray.oracle.archlm_sql import arch_lm_sql
    from feasts_ray.oracle.cointegration_sql import cointegration_pairs_sql
    from feasts_ray.oracle.pacf_feat_sql import feat_pacf_sql
    from feasts_ray.oracle.simhash_sql import (fingerprint_sql,
                                               simhash_pairs_sql,
                                               word_hash_expr)
    from feasts_ray.oracle.pp_sql import pp_ztau_sql
    from feasts_ray.oracle.unitroot_sql import unitroot_sql
    from feasts_ray.oracle.stl_sql import feat_stl_sql, nsdiffs_sql, stl_sql
    from feasts_ray.oracle.x11_sql import x11_additive_sql
    from feasts_ray.oracle.arma_sql import (
        arma_roots_sql, irf_sql, tsresiduals_sql)

    out = {
        "feat_acf_1h": feat_acf_sql(_SERIES_1H, period=24),
        "feat_pacf_1h": feat_pacf_sql(_SERIES_1H, period=24),
        "unitroot_pp_1h": pp_ztau_sql(_SERIES_1H),
        # ARCH LM R²: unrolled 13x13 Cholesky + ordered folds, mirrored
        # op-for-op by the kernel's exact-int path (oracle/archlm_sql.py)
        "arch_lm_1h": arch_lm_sql(_SERIES_1H),
        # P-O + Johansen over event-type pairs: closed-form 2x2 OLS /
        # unrolled 3x3 Cholesky residuals / quadratic-formula 2x2 eigen,
        # mirrored by the kernels' exact-int paths (cointegration_sql.py)
        "cointegration_1h": cointegration_pairs_sql(
            "sec AS ({sec})".format(sec=_EV_SEC.format(u=3600))),
        # KPSS + ndiffs via exact integer power sums (see
        # oracle/unitroot_sql.py for the mirrored expression trees)
        "unitroot_1h": unitroot_sql(_SERIES_1H),
        # Ljung-Box / Box-Pierce Q at the reference defaults (lag=1):
        # r1 from the exact power-sum ACF expression (same as _ACF_1H),
        # Q by the kernel's exact fold order
        "portmanteau_1h": """
WITH {series},
i AS (
  SELECT event_type, bucket, x,
    lead(x, 1) OVER w AS x1,
    ROW_NUMBER() OVER w AS k,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM series WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
g AS (
  SELECT event_type, ANY_VALUE(n) AS n, SUM(x) AS S, SUM(x*x) AS SS,
    SUM(x * x1) AS sxy1,
    SUM(CASE WHEN k <= n - 1 THEN x END) AS h1,
    SUM(CASE WHEN k >= 2 THEN x END) AS t1
  FROM i GROUP BY event_type),
r AS (
  SELECT event_type, n,
    (((sxy1 - (S / n) * (h1 + t1)) + ((n - 1) * (S / n)) * (S / n))
     / (SS - S * (S / n))) AS r1
  FROM g)
SELECT event_type,
  (n * (n + 2)) * ((r1 * r1) / (n - 1)) AS lb_stat,
  n * (r1 * r1) AS bp_stat
FROM r
""".format(series=_SERIES_1H),
        "ccf_1h": _CCF_1H,
        # X11 additive = fixed finite linear filters over the gap-filled
        # integer counts; the generator emits the kernel's own weights as
        # literal left-associated chains (bit-exact, see oracle/x11_sql.py)
        "x11_1h": x11_additive_sql(_SERIES_1H, period=24),
        # STL with numeric windows + robust=False is ALSO a fixed linear
        # filter composition (loess weights depend only on position):
        # the kernel's exact path and this generated SQL share the same
        # weight vectors and fold orders (bit-exact, oracle/stl_sql.py)
        "stl_1h": stl_sql(_SERIES_1H, period=24, s_window=11),
        # feat_stl strengths/shape over the same exact STL components
        # + ordered list_sum downstream folds (oracle/stl_sql.py)
        "feat_stl_1h": feat_stl_sql(_SERIES_1H, period=24, s_window=11),
        # nsdiffs: the 0.64 seasonal-strength rule on bit-exact strengths
        "nsdiffs_1h": nsdiffs_sql(_SERIES_1H, period=24, s_window=11),
        # gg_arma / gg_irf data layers: DL on the exact power-sum ACF,
        # quadratic-formula roots / recursive-CTE psi (oracle/arma_sql.py)
        "arma_roots_1h": arma_roots_sql(_SERIES_1H),
        "irf_1h": irf_sql(_SERIES_1H, h_max=24),
        # gg_tsresiduals data layer: AR(3) innovation residuals
        "tsresiduals_1h": tsresiduals_sql(_SERIES_1H),
        # gg_tsdisplay data layer: series + exact ACF + hour-of-day
        # seasonal means as one long (event_type, panel, x, y) table
        "tsdisplay_1h": _TSDISPLAY_1H,
        "langid": _LANGID,
        # md5-LE word hashes make SimHash / the FNV rolling fingerprint
        # exact-integer SQL (oracle/simhash_sql.py). The simhash oracle
        # is a brute-force Hamming join; chunk banding has exact recall
        # by pigeonhole, so the sets agree (bucket cap asserted in suite)
        "simhash_dup_pairs": simhash_pairs_sql(max_hamming=4),
        "fingerprint": fingerprint_sql(),
        "seasonal_subseries_1h": (
            "WITH sec AS ({sec}), "
            "agg AS (SELECT event_type, bucket, COUNT(*) AS c FROM sec "
            "GROUP BY event_type, bucket), "
            "ph AS (SELECT event_type, (bucket % 86400) // 3600 AS phase, c FROM agg) "
            "SELECT event_type, phase, COUNT(*) AS n, "
            "CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_value, "
            "CAST(MIN(c) AS DOUBLE) AS min_value, CAST(MAX(c) AS DOUBLE) AS max_value "
            "FROM ph GROUP BY event_type, phase"
            .format(sec=_EV_SEC.format(u=3600))),
        "anomalies_1h": """
WITH sec AS ({sec3}),
agg AS (SELECT event_type, bucket, COUNT(*) AS x FROM sec GROUP BY event_type, bucket),
span AS (SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg GROUP BY event_type),
dense AS (SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS bucket FROM span),
series AS (
  SELECT d.event_type, d.bucket, COALESCE(a.x, 0) AS x
  FROM dense d LEFT JOIN agg a ON a.event_type = d.event_type AND a.bucket = d.bucket),
w AS (
  SELECT event_type, bucket, x,
    SUM(x) OVER win AS s, COUNT(x) OVER win AS c, SUM(x*x) OVER win AS q
  FROM series
  WINDOW win AS (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
SELECT event_type, bucket, CAST(x AS DOUBLE) AS value,
  CASE WHEN c > 1 THEN
    abs(CAST(x AS DOUBLE) - CAST(s AS DOUBLE) / CAST(c AS DOUBLE))
    - 3.0 * sqrt((CAST(q AS DOUBLE) - CAST(c AS DOUBLE)
        * (CAST(s AS DOUBLE) / CAST(c AS DOUBLE))
        * (CAST(s AS DOUBLE) / CAST(c AS DOUBLE))) / (CAST(c AS DOUBLE) - 1.0)) > 0.0
  ELSE FALSE END AS is_anomaly
FROM w
""".format(sec3=_EV_SEC.format(u=3600)),
        "asof_join_1h": """
WITH sec AS ({sec}),
r AS (SELECT event_type, bucket, COUNT(*) AS count,
             CAST(SUM(cents) AS BIGINT) AS sum_cents
      FROM sec GROUP BY event_type, bucket),
e AS (SELECT event_id, event_type, epoch_us(ts)//1000000 AS ts_sec FROM events)
SELECT e.event_id, e.event_type, e.ts_sec, r.bucket AS asof_bucket,
       r.count AS asof_count, r.sum_cents AS asof_sum_cents
FROM e ASOF JOIN r ON e.event_type = r.event_type AND e.ts_sec >= r.bucket
""".format(sec=_EV_SEC.format(u=3600)),
        "ewm_1h": """
WITH RECURSIVE {series},
idx AS (
  SELECT event_type, bucket, CAST(x AS DOUBLE) AS x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket) - 1 AS i
  FROM series),
ewm(event_type, bucket, i, value, ewm_mean) AS (
  SELECT event_type, bucket, i, x, x FROM idx WHERE i = 0
  UNION ALL
  SELECT s.event_type, s.bucket, s.i, s.x, 0.25 * s.x + 0.75 * e.ewm_mean
  FROM ewm e JOIN idx s ON s.event_type = e.event_type AND s.i = e.i + 1)
SELECT event_type, bucket, value, ewm_mean FROM ewm
""".format(series=_SERIES_1H),
        "value_quantiles": """
WITH sec AS ({sec})
SELECT event_type, COUNT(*) AS n_vals,
       quantile_disc(cents, 0.5) AS p500,
       quantile_disc(cents, 0.9) AS p900,
       quantile_disc(cents, 0.99) AS p990
FROM sec GROUP BY event_type
""".format(sec=_EV_SEC.format(u=3600)),
        "range_join_anomalies": """
WITH sec AS ({sec}),
agg AS (SELECT event_type, bucket, COUNT(*) AS x FROM sec GROUP BY event_type, bucket),
span AS (SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg GROUP BY event_type),
dense AS (SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS bucket FROM span),
series AS (
  SELECT d.event_type, d.bucket, COALESCE(a.x, 0) AS x
  FROM dense d LEFT JOIN agg a ON a.event_type = d.event_type AND a.bucket = d.bucket),
w AS (
  SELECT event_type, bucket, x,
    SUM(x) OVER win AS s, COUNT(x) OVER win AS c, SUM(x*x) OVER win AS q
  FROM series
  WINDOW win AS (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
anom AS (
  SELECT event_type, bucket AS win_start, bucket + 3600 AS win_end
  FROM w WHERE CASE WHEN c > 1 THEN
    abs(CAST(x AS DOUBLE) - CAST(s AS DOUBLE) / CAST(c AS DOUBLE))
    - 3.0 * sqrt((CAST(q AS DOUBLE) - CAST(c AS DOUBLE)
        * (CAST(s AS DOUBLE) / CAST(c AS DOUBLE))
        * (CAST(s AS DOUBLE) / CAST(c AS DOUBLE))) / (CAST(c AS DOUBLE) - 1.0)) > 0.0
  ELSE FALSE END),
e AS (SELECT event_id, event_type, epoch_us(ts)//1000000 AS ts_sec FROM events)
SELECT e.event_id, e.event_type, e.ts_sec, a.win_start, a.win_end
FROM e JOIN anom a ON a.event_type = e.event_type
  AND e.ts_sec >= a.win_start AND e.ts_sec < a.win_end
""".format(sec=_EV_SEC.format(u=3600)),
        "sessionize": """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
                  CAST(ROUND(value*100) AS BIGINT) AS cents FROM events),
o AS (SELECT user_id, ts_us, cents,
  CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
            > 1800000000 THEN 1 ELSE 0 END AS brk FROM e),
s AS (SELECT user_id, ts_us, cents,
  CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us
       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM o)
SELECT user_id, session_id, MIN(ts_us) AS session_start,
       MAX(ts_us) AS session_end, COUNT(*) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM s GROUP BY user_id, session_id
""",
        "rolling_24h": """
WITH sec AS ({sec2}),
agg AS (SELECT event_type, bucket, COUNT(*) AS x FROM sec GROUP BY event_type, bucket),
span AS (SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg GROUP BY event_type),
dense AS (SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS bucket FROM span),
series AS (
  SELECT d.event_type, d.bucket, COALESCE(a.x, 0) AS x
  FROM dense d LEFT JOIN agg a ON a.event_type = d.event_type AND a.bucket = d.bucket)
SELECT event_type, bucket, CAST(x AS DOUBLE) AS value,
  CAST(SUM(x) OVER w AS DOUBLE) / CAST(COUNT(x) OVER w AS DOUBLE) AS roll_mean,
  CAST(COUNT(x) OVER w AS DOUBLE) AS roll_count
FROM series
WINDOW w AS (PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
""".format(sec2=_EV_SEC.format(u=3600)),
        # robust z: median and MAD are exact discrete quantiles; the
        # score is one IEEE division of a BIGINT deviation by the MAD
        "robust_z_by_lang": (
            "WITH nw AS (SELECT doc_id, lang, "
            "CAST(CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' "
            "THEN 0 ELSE len(regexp_split_to_array("
            "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END "
            "AS BIGINT) AS n_words FROM documents), "
            "m AS (SELECT lang, quantile_disc(n_words, 0.5) AS med "
            "FROM nw GROUP BY lang), "
            "a AS (SELECT nw.doc_id, nw.lang, nw.n_words, "
            "nw.n_words - m.med AS dev FROM nw JOIN m ON m.lang = nw.lang), "
            "d AS (SELECT lang, quantile_disc(abs(dev), 0.5) AS mad "
            "FROM a GROUP BY lang) "
            "SELECT a.doc_id, a.lang, a.n_words, "
            "CASE WHEN d.mad > 0 THEN CAST(a.dev AS DOUBLE) "
            "/ CAST(d.mad AS DOUBLE) END AS robust_z "
            "FROM a JOIN d ON d.lang = a.lang"),
        # Q6-style selective aggregate: revenue as exact
        # cents x discount-percent BIGINT products
        "revenue_q6": (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) "
            "* CAST(ROUND(l_discount * 100) AS BIGINT)), 0) AS BIGINT) "
            "AS revenue_cents_pct FROM lineitem "
            "WHERE l_shipdate >= DATE '1996-01-01' "
            "AND l_shipdate < DATE '1997-01-01' "
            "AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7 "
            "AND CAST(ROUND(l_quantity) AS BIGINT) < 24"),
        # rolling correlation: exact BIGINT window sums; the correlation
        # is the single mirrored float expression num/(sqrt(d1)*sqrt(d2))
        "rolling_corr_24h": """
WITH sec AS ({sec2}),
agg AS (SELECT event_type, bucket, COUNT(*) AS x FROM sec GROUP BY event_type, bucket),
span AS (SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg GROUP BY event_type),
dense AS (SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS bucket FROM span),
series AS (
  SELECT d.event_type, d.bucket, CAST(COALESCE(a.x, 0) AS BIGINT) AS x
  FROM dense d LEFT JOIN agg a ON a.event_type = d.event_type AND a.bucket = d.bucket),
j AS (SELECT a.bucket, a.x AS x, b.x AS y
  FROM series a JOIN series b ON b.bucket = a.bucket
  WHERE a.event_type = 'click' AND b.event_type = 'view'),
wsum AS (SELECT bucket, x, y,
  CAST(COUNT(*) OVER w AS BIGINT) AS c,
  CAST(SUM(x) OVER w AS BIGINT) AS sx, CAST(SUM(y) OVER w AS BIGINT) AS sy,
  CAST(SUM(x*y) OVER w AS BIGINT) AS sxy,
  CAST(SUM(x*x) OVER w AS BIGINT) AS sxx,
  CAST(SUM(y*y) OVER w AS BIGINT) AS syy
  FROM j WINDOW w AS (ORDER BY bucket ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
SELECT 'click|view' AS pair, bucket, x AS x_count, y AS y_count,
  CASE WHEN c*sxx - sx*sx > 0 AND c*syy - sy*sy > 0 THEN
    CAST(c*sxy - sx*sy AS DOUBLE)
    / (sqrt(CAST(c*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(c*syy - sy*sy AS DOUBLE)))
  END AS roll_corr
FROM wsum
""".format(sec2=_EV_SEC.format(u=3600)),
        # rolling discrete quantiles: selection-only (the output is an
        # ELEMENT of the window under the quantile_disc definition
        # sorted[ceil(q*n)-1]) — no float arithmetic on either side
        "rolling_median_24h": """
WITH sec AS ({sec2}),
agg AS (SELECT event_type, bucket, COUNT(*) AS x FROM sec GROUP BY event_type, bucket),
span AS (SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg GROUP BY event_type),
dense AS (SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS bucket FROM span),
series AS (
  SELECT d.event_type, d.bucket, CAST(COALESCE(a.x, 0) AS BIGINT) AS x
  FROM dense d LEFT JOIN agg a ON a.event_type = d.event_type AND a.bucket = d.bucket)
SELECT event_type, bucket, x AS value,
  quantile_disc(x, 0.5) OVER w AS roll_p500,
  quantile_disc(x, 0.9) OVER w AS roll_p900
FROM series
WINDOW w AS (PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
""".format(sec2=_EV_SEC.format(u=3600)),
        "lag_pairs_1h": """
WITH sec AS ({sec}),
agg AS (SELECT event_type, bucket, COUNT(*) AS x FROM sec GROUP BY event_type, bucket),
span AS (SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg GROUP BY event_type),
dense AS (SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS bucket FROM span),
series AS (
  SELECT d.event_type, d.bucket, COALESCE(a.x, 0) AS x
  FROM dense d LEFT JOIN agg a ON a.event_type = d.event_type AND a.bucket = d.bucket)
SELECT s.event_type, k.lag AS lag, s.bucket,
       CAST(s.x AS DOUBLE) AS y, CAST(p.x AS DOUBLE) AS y_lagged
FROM series s
JOIN (SELECT range AS lag FROM range(1, 4)) k ON TRUE
JOIN series p ON p.event_type = s.event_type AND p.bucket = s.bucket - k.lag * 3600
""".format(sec=_EV_SEC.format(u=3600)),
        "rollup_1m": _rollup_sql(60),
        # the ingest query folds the second half of events into the
        # rolled first half; its oracle is the SAME full aggregation —
        # a hash match proves ingest == full recompute
        "rollup_1m_incremental": _rollup_sql(60),
        "rollup_1h_cascade": _rollup_sql(3600),
        "rollup_1h_blobs_roundtrip": _rollup_sql(3600),
        "gapfill_1h": _GAPFILL_1H,
        "series_checks_1h": (
            "WITH sec AS ({sec}), "
            "agg AS (SELECT event_type, bucket FROM sec GROUP BY event_type, bucket), "
            "d AS (SELECT event_type, bucket - lag(bucket) OVER "
            "(PARTITION BY event_type ORDER BY bucket) AS delta FROM agg), "
            "st AS (SELECT event_type, COUNT(*) AS n, MIN(bucket) AS lo, "
            "MAX(bucket) AS hi FROM agg GROUP BY event_type), "
            "rg AS (SELECT event_type, COUNT(DISTINCT delta) AS nd FROM d "
            "WHERE delta IS NOT NULL GROUP BY event_type) "
            "SELECT s.event_type, s.n, "
            "s.n < ((s.hi - s.lo) // 3600 + 1) AS has_gaps, "
            "COALESCE(rg.nd, 0) <= 1 AS regular "
            "FROM st s LEFT JOIN rg ON rg.event_type = s.event_type"
            .format(sec=_EV_SEC.format(u=3600))),
        "gap_counts": (
            "WITH sec AS ({sec}), agg AS (SELECT event_type, bucket FROM sec "
            "GROUP BY event_type, bucket) "
            "SELECT event_type, (MAX(bucket) - MIN(bucket))//3600 + 1 AS n_buckets, "
            "COUNT(*) AS n_present, "
            "(MAX(bucket) - MIN(bucket))//3600 + 1 - COUNT(*) AS n_missing "
            "FROM agg GROUP BY event_type".format(sec=_EV_SEC.format(u=3600))),
        "acf_1h_counts": _ACF_1H,
        "acf_table_1h": _ACF_TABLE_1H,
        "pacf_table_1h": _PACF_TABLE_1H,
        "classical_1h": _CLASSICAL_1H,
        "features_basic_1h": _FEATURES_BASIC_1H,
        "features_exact_1h": _FEATURES_EXACT_1H,
        "seasonal_overlay_1h": (
            "WITH {series} SELECT event_type, bucket // 86400 AS cycle, "
            "(bucket % 86400) // 3600 AS phase, CAST(x AS DOUBLE) AS value "
            "FROM series".format(series=_SERIES_1H)),
        "bpe_token_counts": _BPE_COUNTS,
        "event_type_stats": (
            "WITH sec AS ({sec}) SELECT event_type, COUNT(*) AS n_events, "
            "CAST(SUM(cents) AS BIGINT) AS sum_cents, MIN(cents) AS min_cents, "
            "MAX(cents) AS max_cents FROM sec GROUP BY event_type"
            .format(sec=_EV_SEC.format(u=86400))),
        "top_users": (
            "WITH cents AS (SELECT user_id, CAST(ROUND(value*100) AS BIGINT) AS c "
            "FROM events) SELECT user_id, CAST(SUM(c) AS BIGINT) AS total_cents, "
            "COUNT(*) AS n_events "
            "FROM cents GROUP BY user_id ORDER BY total_cents DESC, user_id LIMIT 10"),
        "pricing_summary": (
            "WITH t AS (SELECT l_returnflag, l_linestatus, "
            "CAST(ROUND(l_quantity) AS BIGINT) AS qty, "
            "CAST(ROUND(l_extendedprice * 100.0) AS BIGINT) AS base_cents, "
            "CAST(ROUND((l_extendedprice * (1.0 - l_discount)) * 10000.0) AS BIGINT) "
            "AS disc_t FROM lineitem) "
            "SELECT l_returnflag, l_linestatus, CAST(SUM(qty) AS BIGINT) AS sum_qty, "
            "CAST(SUM(base_cents) AS BIGINT) AS sum_base_cents, "
            "CAST(SUM(disc_t) AS BIGINT) AS sum_disc_t, "
            "COUNT(*) AS count_order, "
            "CAST(SUM(qty) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty, "
            "(CAST(SUM(base_cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / 100.0 "
            "AS avg_price FROM t GROUP BY l_returnflag, l_linestatus"),
        "lineitem_daily": (
            "WITH sec AS (SELECT l_returnflag, "
            "(epoch_us(l_shipdate)//1000000//86400)*86400 AS bucket, "
            "CAST(ROUND(l_extendedprice*100) AS BIGINT) AS cents FROM lineitem) "
            "SELECT l_returnflag, bucket, COUNT(*) AS count, "
            "CAST(SUM(cents) AS BIGINT) AS sum_cents, "
            "MIN(cents) AS min_cents, MAX(cents) AS max_cents, "
            "(CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / 100.0 AS mean_val "
            "FROM sec GROUP BY l_returnflag, bucket"),
        "minhash_dup_pairs": _MINHASH_PAIRS,
        "ngram_jaccard_dup_pairs": _NGRAM_PAIRS,
        "minhash_dedup_docs": _MINHASH_DEDUP_DOCS,
        "embedding_dedup_docs": _EMBEDDING_DEDUP_DOCS,
        "dedup_exact": (
            "SELECT md5(text) AS text_md5, MIN(doc_id) AS survivor_id, "
            "COUNT(*) AS n_copies FROM documents GROUP BY md5(text)"),
        "token_counts": (
            # str.split() semantics: trim, then count non-empty tokens
            "SELECT doc_id, CAST(CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' "
            "THEN 0 ELSE len(regexp_split_to_array("
            "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS BIGINT) "
            "AS n_words, CAST(length(text) AS BIGINT) AS n_chars_calc FROM documents"),
        "text_quality": _TEXT_QUALITY,
        # corpus-level ops (feasts_ray/text/corpus.py): integer counts /
        # integer hash filters only — bit-exact by construction
        "word_freq_topk": (
            "WITH words AS (SELECT unnest(list_filter("
            "string_split_regex(text, '\\s+'), w -> w <> '')) AS word "
            "FROM documents) "
            "SELECT word, CAST(COUNT(*) AS BIGINT) AS total FROM words "
            "GROUP BY word ORDER BY total DESC, word ASC LIMIT 50"),
        "decontaminate": (
            "WITH ws AS (SELECT doc_id, list_filter("
            "string_split_regex(text, '\\s+'), w -> w <> '') AS ws "
            "FROM documents), "
            "bl AS (SELECT DISTINCT array_to_string(ws[1:8], ' ') AS phrase "
            "FROM ws WHERE doc_id % 101 = 0 AND len(ws) >= 8) "
            "SELECT d.doc_id, CAST((SELECT COUNT(*) FROM bl "
            "WHERE strpos(d.text, bl.phrase) > 0) AS BIGINT) AS n_hits "
            "FROM documents d"),
        # md5-LE uint64 of the DECIMAL doc-id string — the same fold the
        # SimHash oracle uses for words (oracle/simhash_sql.py)
        "sample_stratified": (
            "SELECT doc_id, lang, source FROM documents WHERE "
            + word_hash_expr("CAST(doc_id AS VARCHAR)")
            + " % 100 < CASE WHEN lang = 'en' THEN 5 ELSE 25 END"),
        "dedup_keep_best": _DEDUP_KEEP_BEST,
        # per-group top-k selection: (n_words DESC, doc_id ASC) makes the
        # pick unique; n_words uses the token_counts expression verbatim
        "quality_topk_per_lang": (
            "WITH nw AS (SELECT lang, doc_id, "
            "CAST(CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' "
            "THEN 0 ELSE len(regexp_split_to_array("
            "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS BIGINT) "
            "AS n_words FROM documents), "
            "r AS (SELECT lang, doc_id, n_words, ROW_NUMBER() OVER ("
            "PARTITION BY lang ORDER BY n_words DESC, doc_id ASC) AS rn FROM nw) "
            "SELECT lang, doc_id, n_words FROM r WHERE rn <= 20"),
        "distinct_users_by_type": (
            "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) "
            "AS n_users FROM events GROUP BY event_type"),
        # Gopher-style repetition signals (Rae et al. 2021 §A1.1): the
        # kernel groups n-grams by 64-bit shingle hash, the SQL by the
        # joined string (same collision-free equivalence as
        # dup_span_stats); char lengths are exact ints, fractions one
        # IEEE DOUBLE division on both sides
        "repetition_signals": (
            "WITH w AS (SELECT doc_id, list_filter("
            "string_split_regex(text, '\\s+'), x -> x <> '') AS ws "
            "FROM documents), "
            "tok AS (SELECT doc_id, unnest(ws) AS tkn, "
            "generate_subscripts(ws, 1) AS i FROM w), "
            "tot AS (SELECT doc_id, CAST(SUM(length(tkn)) AS BIGINT) AS tc "
            "FROM tok GROUP BY doc_id), "
            "bi AS (SELECT a.doc_id, a.i, a.tkn || ' ' || b.tkn AS g, "
            "length(a.tkn) + length(b.tkn) + 1 AS cl "
            "FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1), "
            "bc AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS n, "
            "MAX(cl) AS cl FROM bi GROUP BY doc_id, g), "
            "bmax AS (SELECT doc_id, MAX(n) AS nmax FROM bc GROUP BY doc_id), "
            "topc AS (SELECT bc.doc_id, "
            "CAST(bmax.nmax * MAX(bc.cl) AS BIGINT) AS top_chars "
            "FROM bc JOIN bmax ON bmax.doc_id = bc.doc_id AND bc.n = bmax.nmax "
            "GROUP BY bc.doc_id, bmax.nmax), "
            "tri AS (SELECT a.doc_id, a.i, "
            "a.tkn || ' ' || b.tkn || ' ' || c.tkn AS g "
            "FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1 "
            "JOIN tok c ON c.doc_id = a.doc_id AND c.i = a.i + 2), "
            "dupg AS (SELECT doc_id, g FROM tri GROUP BY doc_id, g "
            "HAVING COUNT(*) >= 2), "
            "dpos AS (SELECT DISTINCT t.doc_id, t.i + u.o AS j "
            "FROM tri t JOIN dupg d ON d.doc_id = t.doc_id AND d.g = t.g "
            "CROSS JOIN generate_series(0, 2) AS u(o)), "
            "cov AS (SELECT p.doc_id, CAST(SUM(length(k.tkn)) AS BIGINT) "
            "AS cc FROM dpos p JOIN tok k ON k.doc_id = p.doc_id "
            "AND k.i = p.j GROUP BY p.doc_id) "
            "SELECT d.doc_id, COALESCE(tot.tc, 0) AS word_chars, "
            "COALESCE(topc.top_chars, 0) AS top_ngram_chars, "
            "CASE WHEN COALESCE(tot.tc, 0) > 0 THEN "
            "CAST(COALESCE(topc.top_chars, 0) AS DOUBLE) / "
            "CAST(tot.tc AS DOUBLE) ELSE 0.0 END AS top_ngram_frac, "
            "COALESCE(cov.cc, 0) AS dup_ngram_chars, "
            "CASE WHEN COALESCE(tot.tc, 0) > 0 THEN "
            "CAST(COALESCE(cov.cc, 0) AS DOUBLE) / "
            "CAST(tot.tc AS DOUBLE) ELSE 0.0 END AS dup_ngram_frac "
            "FROM documents d "
            "LEFT JOIN tot ON tot.doc_id = d.doc_id "
            "LEFT JOIN topc ON topc.doc_id = d.doc_id "
            "LEFT JOIN cov ON cov.doc_id = d.doc_id"),
        # per-language quality-threshold selection: the engine's exact
        # discrete quantile IS quantile_disc (stages/quantiles.py), so
        # the integer threshold compare is bit-exact
        "quality_filter_by_lang": (
            "WITH nw AS (SELECT doc_id, lang, "
            "CAST(CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' "
            "THEN 0 ELSE len(regexp_split_to_array("
            "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END "
            "AS BIGINT) AS n_words FROM documents), "
            "t AS (SELECT lang, quantile_disc(n_words, 0.5) AS thr "
            "FROM nw GROUP BY lang) "
            "SELECT nw.doc_id, nw.lang, nw.n_words FROM nw "
            "JOIN t ON t.lang = nw.lang WHERE nw.n_words >= t.thr"),
        # per-doc quality percentile within language: PERCENT_RANK is
        # (rank-1)/(n-1), one IEEE division of exact BIGINTs — the
        # engine's histogram-broadcast kernel divides the same two ints
        "percent_rank_by_lang": (
            "WITH nw AS (SELECT doc_id, lang, "
            "CAST(CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' "
            "THEN 0 ELSE len(regexp_split_to_array("
            "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END "
            "AS BIGINT) AS n_words FROM documents) "
            "SELECT doc_id, lang, n_words, PERCENT_RANK() OVER ("
            "PARTITION BY lang ORDER BY n_words) AS pct_rank FROM nw"),
        # fixed-length sequence chunking: per-chunk exact scalar
        # summaries; chunk_idx = (i-1)//64 over the 1-based word index
        "chunk_words_64": (
            "WITH w AS (SELECT doc_id, list_filter("
            "string_split_regex(text, '\\s+'), x -> x <> '') AS ws "
            "FROM documents), "
            "tok AS (SELECT doc_id, unnest(ws) AS tkn, "
            "generate_subscripts(ws, 1) AS i FROM w) "
            "SELECT doc_id, CAST((i - 1) // 64 AS BIGINT) AS chunk_idx, "
            "CAST(COUNT(*) AS BIGINT) AS n_words_chunk, "
            "CAST(SUM(length(tkn)) AS BIGINT) AS chunk_chars, "
            "arg_min(tkn, i) AS first_word, arg_max(tkn, i) AS last_word "
            "FROM tok GROUP BY doc_id, (i - 1) // 64"),
        # eval-set n-gram decontamination: the kernel counts by 64-bit
        # shingle hash, the SQL by the joined string (same
        # collision-free equivalence as dup_span_stats)
        "ngram_decontaminate": (
            "WITH w AS (SELECT doc_id, list_filter("
            "string_split_regex(text, '\\s+'), x -> x <> '') AS ws "
            "FROM documents), "
            "g AS (SELECT DISTINCT doc_id, gram FROM ("
            "SELECT doc_id, unnest(list_transform("
            "generate_series(1, len(ws) - 4), "
            "i -> array_to_string(ws[i:i+4], ' '))) AS gram "
            "FROM w WHERE len(ws) >= 5)), "
            "bl AS (SELECT DISTINCT gram FROM g WHERE doc_id % 101 = 0), "
            "h AS (SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM g JOIN bl USING (gram) GROUP BY g.doc_id) "
            "SELECT d.doc_id, COALESCE(h.n, 0) AS n_gram_hits "
            "FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id"),
        # deterministic split assignment: same md5-LE fold, CASE chain
        # over cumulative shares (h=90 -> val, h=95 -> test boundaries)
        "split_assign": (
            "SELECT doc_id, CASE WHEN "
            + word_hash_expr("CAST(doc_id AS VARCHAR) || '#split'")
            + " % 100 < 90 THEN 'train' WHEN "
            + word_hash_expr("CAST(doc_id AS VARCHAR) || '#split'")
            + " % 100 < 95 THEN 'val' ELSE 'test' END AS split "
            "FROM documents"),
        # labeled-vs-predicted language confusion: GROUP BY over the
        # langid oracle's prediction joined back to the labels
        "langid_confusion": (
            "WITH pred AS (" + _LANGID + ") "
            "SELECT d.lang, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM documents d JOIN pred p ON p.doc_id = d.doc_id "
            "GROUP BY d.lang, p.lang_pred"),
        # exactly-k per-stratum sample: ROW_NUMBER over the md5-LE rank
        "sample_k_per_lang": (
            "WITH r AS (SELECT doc_id, lang, ROW_NUMBER() OVER ("
            "PARTITION BY lang ORDER BY "
            + word_hash_expr("CAST(doc_id AS VARCHAR) || '#samplek'")
            + ", doc_id) AS rn FROM documents) "
            "SELECT doc_id, lang FROM r WHERE rn <= 10"),
        # winsorization: clip selects existing values (no arithmetic);
        # thresholds are the exact discrete quantiles
        "winsorize_by_lang": (
            "WITH nw AS (SELECT doc_id, lang, "
            "CAST(CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' "
            "THEN 0 ELSE len(regexp_split_to_array("
            "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END "
            "AS BIGINT) AS n_words FROM documents), "
            "t AS (SELECT lang, quantile_disc(n_words, 0.05) AS lo, "
            "quantile_disc(n_words, 0.95) AS hi FROM nw GROUP BY lang) "
            "SELECT nw.doc_id, nw.lang, nw.n_words, "
            "LEAST(GREATEST(nw.n_words, t.lo), t.hi) AS n_words_winsor "
            "FROM nw JOIN t ON t.lang = nw.lang"),
        # PII scrub: DuckDB regexp_* is the same RE2 engine as the
        # kernel's pc.*_substring_regex — counts and redacted text
        # agree by construction
        "pii_scrub": (
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, "
            "'[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}')) "
            "AS BIGINT) AS n_emails, "
            "CAST(len(regexp_extract_all(text, "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) "
            "AS BIGINT) AS n_ipv4, "
            "regexp_replace(regexp_replace(text, "
            "'[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}', "
            "'<EMAIL>', 'g'), "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', "
            "'<IP>', 'g') AS text_redacted FROM documents"),
        # within-doc line dedup: kernel groups lines by md5-LE hash,
        # SQL by the line string (same collision-free equivalence)
        "line_dedup": (
            "WITH l AS (SELECT doc_id, "
            "unnest(string_split(text, chr(10))) AS line, "
            "generate_subscripts(string_split(text, chr(10)), 1) AS i "
            "FROM documents), "
            "f AS (SELECT doc_id, line, MIN(i) AS fi FROM l "
            "GROUP BY doc_id, line), "
            "c AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines "
            "FROM l GROUP BY doc_id), "
            "d AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY fi) "
            "AS text_dedup, CAST(COUNT(*) AS BIGINT) AS n_kept "
            "FROM f GROUP BY doc_id) "
            "SELECT c.doc_id, c.n_lines, c.n_lines - d.n_kept "
            "AS n_lines_removed, d.text_dedup "
            "FROM c JOIN d ON d.doc_id = c.doc_id"),
        # corpus-wide duplicated-line removal: keep each line's global
        # first occurrence (min (doc_id, idx)); kernel keys on the
        # md5-LE line hash, SQL on the line string (same equivalence)
        "line_dedup_corpus": (
            "WITH l AS (SELECT doc_id, "
            "unnest(string_split(text, chr(10))) AS line, "
            "generate_subscripts(string_split(text, chr(10)), 1) AS i "
            "FROM documents), "
            "r AS (SELECT doc_id, line, i, ROW_NUMBER() OVER ("
            "PARTITION BY line ORDER BY doc_id, i) AS rn FROM l), "
            "c AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines, "
            "CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_removed FROM r GROUP BY doc_id), "
            "k AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) "
            "AS text_clean FROM r WHERE rn = 1 GROUP BY doc_id) "
            "SELECT c.doc_id, c.n_lines, c.n_removed AS n_lines_removed, "
            "COALESCE(k.text_clean, '') AS text_clean "
            "FROM c LEFT JOIN k ON k.doc_id = c.doc_id"),
        # reproducible epoch shuffle: rank in the md5(id#seed) total
        # order (UBIGINT compare == the kernel's uint64 sort)
        "shuffle_rank": (
            "SELECT doc_id, ROW_NUMBER() OVER (ORDER BY "
            + word_hash_expr("CAST(doc_id AS VARCHAR) || '#7'")
            + ", doc_id) - 1 AS shuffle_rank FROM documents"),
        # stream packing: the engine's distributed prefix sum must equal
        # the window running sum exactly (all BIGINT; empty docs NULL)
        "pack_stream_512": (
            "WITH nw AS (SELECT doc_id, "
            "CAST(CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' "
            "THEN 0 ELSE len(regexp_split_to_array("
            "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END "
            "AS BIGINT) AS n_words FROM documents), "
            "c AS (SELECT doc_id, n_words, CAST(SUM(n_words) OVER ("
            "ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum "
            "FROM nw) "
            "SELECT doc_id, n_words, cum - n_words AS cum_before, "
            "CASE WHEN n_words > 0 THEN (cum - n_words) // 512 "
            "ELSE NULL END AS first_seq, "
            "CASE WHEN n_words > 0 THEN (cum - 1) // 512 "
            "ELSE NULL END AS last_seq, "
            "CASE WHEN n_words > 0 THEN "
            "(cum - 1) // 512 - (cum - n_words) // 512 + 1 "
            "ELSE 0 END AS n_seqs FROM c"),
        # equal-width integer histogram: width = ceil((hi-lo+1)/20),
        # floor-division binning — exact ints end to end
        "length_histogram": (
            "WITH nw AS (SELECT "
            "CAST(CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' "
            "THEN 0 ELSE len(regexp_split_to_array("
            "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END "
            "AS BIGINT) AS v FROM documents), "
            "w AS (SELECT MIN(v) AS lo, "
            "GREATEST((MAX(v) - MIN(v) + 20) // 20, 1) AS width FROM nw) "
            "SELECT CAST((v - lo) // width AS BIGINT) AS bin, "
            "CAST(lo + ((v - lo) // width) * width AS BIGINT) AS bin_lo, "
            "CAST(lo + ((v - lo) // width + 1) * width - 1 AS BIGINT) AS bin_hi, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM nw, w GROUP BY (v - lo) // width, lo, width"),
        # rational tf-idf (score = tf/df; documented deviation from
        # tf*ln(N/df) — IEEE-reproducible, no libm): both engines divide
        # the same exact ints once, ties break on the binary-smallest term
        "tfidf_top_terms": (
            "WITH w AS (SELECT doc_id, list_filter("
            "string_split_regex(text, '\\s+'), x -> x <> '') AS ws "
            "FROM documents), "
            "tok AS (SELECT doc_id, unnest(ws) AS tkn FROM w), "
            "tf AS (SELECT doc_id, tkn, CAST(COUNT(*) AS BIGINT) AS tf "
            "FROM tok GROUP BY doc_id, tkn), "
            "df AS (SELECT tkn, CAST(COUNT(*) AS BIGINT) AS df FROM "
            "(SELECT DISTINCT doc_id, tkn FROM tok) GROUP BY tkn), "
            "s AS (SELECT tf.doc_id, tf.tkn AS term, tf.tf, df.df, "
            "CAST(tf.tf AS DOUBLE) / CAST(df.df AS DOUBLE) AS score, "
            "ROW_NUMBER() OVER (PARTITION BY tf.doc_id "
            "ORDER BY CAST(tf.tf AS DOUBLE) / CAST(df.df AS DOUBLE) DESC, "
            "tf.tkn ASC) AS rn FROM tf JOIN df ON df.tkn = tf.tkn) "
            "SELECT doc_id, term, tf, df, score FROM s WHERE rn = 1"),
        # duplicated word-3-gram spans: the tri CTE mirrors the MinHash
        # oracle's shingle definition (string 3-grams; the kernel's 64-bit
        # shingle hashes are collision-free at this scale — the
        # exact-Jaccard oracle above already relies on that equivalence)
        "dup_span_stats": (
            "WITH w AS (SELECT doc_id, list_filter("
            "string_split_regex(text, '\\s+'), x -> x <> '') AS ws "
            "FROM documents), "
            "tok AS (SELECT doc_id, unnest(ws) AS tkn, "
            "generate_subscripts(ws, 1) AS i FROM w), "
            "tri AS (SELECT DISTINCT a.doc_id, "
            "a.tkn || ' ' || b.tkn || ' ' || c.tkn AS sh FROM tok a "
            "JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1 "
            "JOIN tok c ON c.doc_id = a.doc_id AND c.i = a.i + 2), "
            "nd AS (SELECT sh, COUNT(*) AS n FROM tri GROUP BY sh) "
            "SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans, "
            "CAST(SUM(CASE WHEN nd.n >= 2 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_dup_spans FROM tri t JOIN nd ON nd.sh = t.sh "
            "GROUP BY t.doc_id"),
        # exact all-pairs cosine baseline: list_cosine_similarity over
        # FLOAT[] is a float32 sequential fold of dot/(|x| * |y|), which
        # the kernel mirrors with float32 cumsum-last folds
        # (dedup/embedding.py::_ExactPairKernel) — `sim` is bitwise-equal
        "embedding_dup_pairs_exact": (
            "WITH s AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "list_cosine_similarity(a.embedding, b.embedding) AS sim "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) "
            "SELECT id_a, id_b, sim FROM s WHERE sim >= 0.4e0"),
        "ann_topk": (
            "WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings "
            "WHERE vec_id < 5), "
            "sims AS (SELECT q.query_id, e.vec_id, "
            "list_cosine_similarity(q.embedding, e.embedding) AS sim "
            "FROM q CROSS JOIN embeddings e), "
            "ranked AS (SELECT query_id, vec_id, ROW_NUMBER() OVER "
            "(PARTITION BY query_id ORDER BY sim DESC, vec_id) AS \"rank\" FROM sims) "
            "SELECT query_id, \"rank\", vec_id FROM ranked WHERE \"rank\" <= 10"),
    }
    # The grouped (shuffle) physical plans are pinned bit-identical to
    # their broadcast siblings, so they share the SAME oracle SQL — the
    # driver then verifies BOTH plans against DuckDB independently.
    out["asof_join_grouped_1h"] = out["asof_join_1h"]
    out["range_join_grouped"] = out["range_join_anomalies"]
    out["line_dedup_corpus_grouped"] = out["line_dedup_corpus"]
    # certified-exact Misra-Gries heavy hitters == the exact top-k
    out["word_freq_topk_mg"] = out["word_freq_topk"]
    # Two-measure rollup: the Ray side decodes its result rows back OUT
    # of the kernel-written Gorilla/dod blobs, so a hash match here also
    # proves the multi-measure blob round-trip lossless. Means mirror the
    # engine's expression tree: (CAST(sum AS DOUBLE)/count)[/scale].
    out["rollup_daily_multi"] = """
WITH t AS (
  SELECT l_returnflag,
         (epoch_us(l_shipdate) // 1000000 // 86400) * 86400 AS bucket,
         CAST(ROUND(l_quantity) AS BIGINT) AS qty,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem)
SELECT l_returnflag, bucket, COUNT(*) AS count,
       CAST(SUM(qty) AS BIGINT) AS sum_qty,
       MIN(qty) AS min_qty, MAX(qty) AS max_qty,
       CAST(SUM(qty) AS DOUBLE) / COUNT(*) AS mean_qty,
       CAST(SUM(cents) AS BIGINT) AS sum_price_cents,
       MIN(cents) AS min_price_cents, MAX(cents) AS max_price_cents,
       (CAST(SUM(cents) AS DOUBLE) / COUNT(*)) / 100.0 AS mean_price
FROM t GROUP BY l_returnflag, bucket
"""
    return out
