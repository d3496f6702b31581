"""DuckDB oracle generator for the STL decomposition (stl_1h).

With numeric windows and robust=False the STL pipeline (Cleveland et al.
1990; kernel functions/stl.py:stl_decompose) is a FIXED composition of
linear filters: every loess weight vector depends only on (window,
degree, position class), never on the data. The kernel's exact path
(functions/stl.py:stl_decompose_exact) evaluates the same pipeline with
fixed ascending folds; this generator emits the SAME weight vectors
(from the same loess_weight_vector call, shortest-round-trip literals)
in the SAME left-associated chain order — so DuckDB reproduces the
kernel bit-for-bit (the X11 / classical / ARCH-LM oracle device).

Pipeline mirrored per inner iteration (2x, unrolled):
  detrended -> cycle-subseries loess (phase partitions, jump interp,
  +-1-period extension scalars) -> ext on a q index -> MA(p) MA(p) MA(3)
  -> low-pass loess -> season = ext[p+t] - low -> deseas = y - season
  -> trend loess.  Jump interpolation is a self-join to the flanking
  eval rows; end-of-series eval at rn = L is part of the eval set.

Validity regime (asserted by the kernel's stl_exact_applicable; the
driver's hourly count series satisfy it): every per-phase subseries
length >= s_window + 2, n >= t_window + 2, and the degree-1 loess guard
sqrt(c) > 0.001*(L-1) holds for every evaluation class.
"""

from __future__ import annotations

from ..functions.stl import loess_weight_vector, stl_exact_config


def _lit(v: float) -> str:
    """Shortest round-trip DOUBLE literal ('e0' forces DOUBLE parse)."""
    r = repr(float(v))
    return r if ("e" in r or "E" in r) else r + "e0"


def _chain(pairs: list[tuple[float, str]]) -> str:
    """Left-associated coefficient chain mirroring _fold's order."""
    s = f"({_lit(pairs[0][0])} * {pairs[0][1]})"
    for w, e in pairs[1:]:
        s = f"({s} + {_lit(w)} * {e})"
    return s


def _sum_chain(terms: list[str]) -> str:
    """Left-associated plain sum mirroring _ma_exact's fold."""
    s = terms[0]
    for t in terms[1:]:
        s = f"({s} + {t})"
    return s


def _off_ref(base: str, off: int) -> str:
    if off == 0:
        return base
    return f"lg{-off}" if off < 0 else f"ld{off}"


def _lag_cols(base: str, lo: int, hi: int, win: str) -> str:
    """Column list defining lg{1..lo} / ld{1..hi} over ``win``."""
    cols = []
    for o in range(1, lo + 1):
        cols.append(f"lag({base}, {o}) OVER {win} AS lg{o}")
    for o in range(1, hi + 1):
        cols.append(f"lead({base}, {o}) OVER {win} AS ld{o}")
    return ", ".join(cols)


def _loess_case(base: str, length: int, degree: int, jump: int,
                rn: str, L: str) -> str:
    """Eval-position CASE mirroring _stless_exact: NULL at non-eval
    rows, literal weight chains per position class otherwise."""
    nsh = (length + 1) // 2
    # left classes i = 1..nsh-1: window abs [1, length]
    left = []
    for i in range(1, nsh):
        w = loess_weight_vector(length, degree, float(i), 1, length)
        pairs = [(w[t], _off_ref(base, 1 + t - i)) for t in range(length)]
        left.append(f"WHEN {i} THEN {_chain(pairs)}")
    # right classes d = L - i = 0..nsh-1: window abs [L-length+1, L]
    right = []
    for d in range(nsh):
        xs_rel = float(length - d)
        w = loess_weight_vector(length, degree, xs_rel, 1, length)
        pairs = [(w[t], _off_ref(base, d - length + 1 + t))
                 for t in range(length)]
        right.append(f"WHEN {d} THEN {_chain(pairs)}")
    wi = loess_weight_vector(length, degree, float(nsh), 1, length)
    interior = _chain([(wi[t], _off_ref(base, t + 1 - nsh))
                       for t in range(length)])
    return (f"CASE WHEN ({rn} - 1) % {jump} = 0 OR {rn} = {L} THEN "
            f"CASE WHEN {rn} <= {nsh - 1} THEN CASE {rn} "
            + " ".join(left)
            + f" END WHEN {rn} >= {L} - {nsh - 1} THEN CASE {L} - {rn} "
            + " ".join(right)
            + f" END ELSE {interior} END END")


def _interp_body(src: str, pos: str, L: str, jump: int,
                 val: str, carry: str, phase_join: str = "") -> str:
    """Jump-interpolation CTE body: eval rows keep their value, others
    get ii.v + ((kk.v - ii.v)/(kk-ii)) * (mm-ii) from flanking evals."""
    return f"""(
  SELECT mm.event_type, {carry}
    CASE WHEN (mm.{pos} - 1) % {jump} = 0 OR mm.{pos} = mm.{L} THEN mm.ev
         ELSE ii.ev + ((kk.ev - ii.ev) / CAST(kk.{pos} - ii.{pos} AS DOUBLE))
              * CAST(mm.{pos} - ii.{pos} AS DOUBLE) END AS {val}
  FROM {src} mm
  JOIN {src} ii ON ii.event_type = mm.event_type{phase_join.replace('XX', 'ii')}
       AND ii.{pos} = mm.{pos} - ((mm.{pos} - 1) % {jump})
  JOIN {src} kk ON kk.event_type = mm.event_type{phase_join.replace('XX', 'kk')}
       AND kk.{pos} = least(ii.{pos} + {jump}, mm.{L}))"""


def _ext_chains(s_window: int, degree: int) -> tuple[str, str]:
    """Pivoted-aggregate chains for the subseries extension scalars at
    xs = 0 (abs window [1, s_window]) and xs = k+1 ([k-s_window+1, k])."""
    w0 = loess_weight_vector(s_window, degree, 0.0, 1, s_window)
    e0 = _chain([(w0[t], f"MAX(CASE WHEN m = {t + 1} THEN d END)")
                 for t in range(s_window)])
    wk = loess_weight_vector(s_window, degree, float(s_window + 1),
                             1, s_window)
    ek = _chain([(wk[t],
                  f"MAX(CASE WHEN m = np - {s_window - 1 - t} THEN d END)")
                 for t in range(s_window)])
    return e0, ek


def _iteration(x: str, det_src: str, cfg: dict) -> str:
    """CTE block for one inner iteration with suffix ``x``; ``det_src``
    must provide (event_type, rn, n, ph, m, np, y, d)."""
    p = cfg["period"]
    sw, sj = cfg["s_window"], cfg["s_jump"]
    lw, lj = cfg["l_window"], cfg["l_jump"]
    tw, tj = cfg["t_window"], cfg["t_jump"]
    pw = "(PARTITION BY event_type, ph ORDER BY m)"
    qw = "(PARTITION BY event_type ORDER BY q)"
    rw = "(PARTITION BY event_type ORDER BY rn)"
    e0, ek = _ext_chains(sw, cfg["s_degree"])
    ma_p = _sum_chain(["v"] + [f"lead(v, {o}) OVER qw" for o in range(1, p)])
    ma_3 = _sum_chain(["v"] + [f"lead(v, {o}) OVER qw" for o in range(1, 3)])
    return f"""sl_{x} AS MATERIALIZED (
  SELECT event_type, rn, n, ph, m, np, d,
    {_lag_cols('d', sw - 1, sw - 1, 'pw')}
  FROM {det_src} WINDOW pw AS {pw}),
se_{x} AS MATERIALIZED (
  SELECT event_type, rn, n, ph, m, np,
    {_loess_case('d', sw, cfg['s_degree'], sj, 'm', 'np')} AS ev
  FROM sl_{x}),
si_{x} AS MATERIALIZED {_interp_body(f'se_{x}', 'm', 'np', sj, 'sm',
                        'mm.rn AS rn, mm.n AS n,',
                        ' AND XX.ph = mm.ph')},
xv_{x} AS MATERIALIZED (
  SELECT event_type, ph, np, n, {e0} AS e0, {ek} AS ek
  FROM {det_src} GROUP BY event_type, ph, np, n),
ex_{x} AS MATERIALIZED (
  SELECT event_type, rn - 1 + {p} AS q, n, sm AS v FROM si_{x}
  UNION ALL SELECT event_type, ph - 1 AS q, n, e0 AS v FROM xv_{x}
  UNION ALL SELECT event_type, (ph - 1) + (np + 1) * {p} AS q, n, ek AS v
  FROM xv_{x}),
m1_{x} AS MATERIALIZED (
  SELECT * FROM (
    SELECT event_type, q, n, {ma_p} / {_lit(p)} AS v
    FROM ex_{x} WINDOW qw AS {qw})
  WHERE q <= n + {p}),
m2_{x} AS MATERIALIZED (
  SELECT * FROM (
    SELECT event_type, q, n, {ma_p} / {_lit(p)} AS v
    FROM m1_{x} WINDOW qw AS {qw})
  WHERE q <= n + 1),
m3_{x} AS MATERIALIZED (
  SELECT * FROM (
    SELECT event_type, q, n, {ma_3} / {_lit(3)} AS v
    FROM m2_{x} WINDOW qw AS {qw})
  WHERE q <= n - 1),
ll_{x} AS MATERIALIZED (
  SELECT event_type, q + 1 AS rn, n, v AS d,
    {_lag_cols('v', lw - 1, lw - 1, 'qw')}
  FROM m3_{x} WINDOW qw AS {qw}),
le_{x} AS MATERIALIZED (
  SELECT event_type, rn, n,
    {_loess_case('d', lw, cfg['l_degree'], lj, 'rn', 'n')} AS ev
  FROM ll_{x}),
li_{x} AS MATERIALIZED {_interp_body(f'le_{x}', 'rn', 'n', lj, 'lv',
                        'mm.rn AS rn, mm.n AS n,')},
ds_{x} AS MATERIALIZED (
  SELECT i.event_type, i.rn, i.n, i.bucket, i.y, e.v - l.lv AS season,
    i.y - (e.v - l.lv) AS deseas
  FROM idx2 i
  JOIN li_{x} l ON l.event_type = i.event_type AND l.rn = i.rn
  JOIN ex_{x} e ON e.event_type = i.event_type AND e.q = i.rn + {p - 1}),
tl_{x} AS MATERIALIZED (
  SELECT event_type, rn, n, deseas AS d,
    {_lag_cols('deseas', tw - 1, tw - 1, 'rw')}
  FROM ds_{x} WINDOW rw AS {rw}),
te_{x} AS MATERIALIZED (
  SELECT event_type, rn, n,
    {_loess_case('d', tw, cfg['t_degree'], tj, 'rn', 'n')} AS ev
  FROM tl_{x}),
ti_{x} AS MATERIALIZED {_interp_body(f'te_{x}', 'rn', 'n', tj, 'tv',
                        'mm.rn AS rn,')}"""


def _stl_body(series_cte: str, cfg: dict) -> str:
    """The shared WITH body: series -> idx2 -> two unrolled inner
    iterations; exposes ds_b (season/deseas per row) and ti_b (trend)."""
    p = cfg["period"]
    win = "(PARTITION BY event_type ORDER BY bucket)"
    it_a = _iteration("a", "det_a", cfg)
    it_b = _iteration("b", "det_b", cfg)
    return f"""WITH {series_cte},
idx AS MATERIALIZED (
  SELECT event_type, bucket, CAST(x AS DOUBLE) AS y,
    ROW_NUMBER() OVER {win} AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM series),
idx2 AS MATERIALIZED (
  SELECT *, ((rn - 1) % {p}) + 1 AS ph, ((rn - 1) // {p}) + 1 AS m,
    COUNT(*) OVER (PARTITION BY event_type, ((rn - 1) % {p})) AS np
  FROM idx),
det_a AS MATERIALIZED (
  SELECT event_type, rn, n, ph, m, np, y, y AS d FROM idx2),
{it_a},
det_b AS MATERIALIZED (
  SELECT i.event_type, i.rn, i.n, i.ph, i.m, i.np, i.y, i.y - t.tv AS d
  FROM idx2 i JOIN ti_a t ON t.event_type = i.event_type AND t.rn = i.rn),
{it_b}"""


def stl_sql(series_cte: str, period: int = 24, s_window: int = 11) -> str:
    """Full oracle: ``series_cte`` must end with a CTE named ``series``
    of (event_type, bucket, x) rows — gap-filled integer counts. Output
    matches q_stl_1h's components(): event_type, bucket, value, trend,
    season_<period>, remainder, season_adjust."""
    cfg = stl_exact_config(period, s_window)
    return f"""
{_stl_body(series_cte, cfg)}
SELECT d.event_type, d.bucket, d.y AS value, t.tv AS trend,
  d.season AS season_{period}, d.deseas - t.tv AS remainder,
  d.deseas AS season_adjust
FROM ds_b d JOIN ti_b t ON t.event_type = d.event_type AND t.rn = d.rn
"""


def nsdiffs_sql(series_cte: str, period: int = 24,
                s_window: int = 11) -> str:
    """Oracle for unitroot_nsdiffs (features.R:209-235 semantics as
    implemented by features.unitroot_nsdiffs): D candidates decided by
    feat_stl seasonal_strength >= 0.64 on the series (D=1) and on its
    lag-``period`` difference (D=2, independent of the D=1 outcome);
    nsdiffs = max candidate. Both strengths come from the bit-exact
    feat_stl oracle (the lag difference of integers is integral, so the
    exact path applies on both sides)."""
    diff_cte = (series_cte.replace("series AS", "series_base AS", 1)
                + f""",
series AS (
  SELECT event_type, bucket, x FROM (
    SELECT event_type, bucket,
      x - lag(x, {period}) OVER (PARTITION BY event_type ORDER BY bucket)
        AS x
    FROM series_base)
  WHERE x IS NOT NULL)""")
    ss = f"seasonal_strength_{period}"
    return f"""
SELECT s0.event_type,
  CAST(greatest(
    CASE WHEN s0.ss IS NOT NULL AND s0.ss >= 0.64e0 THEN 1 ELSE 0 END,
    CASE WHEN s1.ss IS NOT NULL AND s1.ss >= 0.64e0 THEN 2 ELSE 0 END)
    AS DOUBLE) AS nsdiffs
FROM (SELECT event_type, {ss} AS ss FROM (
{feat_stl_sql(series_cte, period, s_window)}
)) s0
JOIN (SELECT event_type, {ss} AS ss FROM (
{feat_stl_sql(diff_cte, period, s_window)}
)) s1 USING (event_type)
"""


def feat_stl_sql(series_cte: str, period: int = 24,
                 s_window: int = 11) -> str:
    """Oracle for the feat_stl feature family over integer counts: the
    STL body above plus the downstream statistics as ordered list_sum
    folds (DuckDB's list_sum accumulates sequentially left-to-right —
    the same ascending order as features._feat_stl_exact's _seq_sum),
    the closed-form orthonormal degree-2 polynomial (centered power sums
    are exactly representable, so plain SUM matches any fold order), and
    first-occurrence argmax/argmin via MIN(rn) at the extreme value."""
    cfg = stl_exact_config(period, s_window)
    p = period
    # centered index powers: exactly-representable multiples of 1/4, 1/16
    t2 = "((rn - (n + 1) / 2) * (rn - (n + 1) / 2))"
    acf10 = _sum_chain([f"(rho{k} * rho{k})" for k in range(1, 11)])
    lead_cols = ", ".join(
        f"lead(dr, {k}) OVER (PARTITION BY event_type ORDER BY rn) AS dl{k}"
        for k in range(1, 11))
    sks = ",\n    ".join(
        f"list_sum(list(dr * dl{k} ORDER BY rn) "
        f"FILTER (WHERE rn <= n - {k})) AS sk{k}" for k in range(1, 11))
    return f"""
{_stl_body(series_cte, cfg)},
comp AS MATERIALIZED (
  SELECT d.event_type, d.rn, d.n, d.season, d.deseas, t.tv AS trend,
    d.deseas - t.tv AS rem
  FROM ds_b d JOIN ti_b t ON t.event_type = d.event_type AND t.rn = d.rn),
a1 AS MATERIALIZED (
  SELECT event_type, n,
    list_sum(list(rem ORDER BY rn)) / n AS m_rem,
    list_sum(list(deseas ORDER BY rn)) / n AS m_sa,
    list_sum(list(rem + season ORDER BY rn)) / n AS m_rs,
    SUM({t2}) AS s2, SUM({t2} * {t2}) AS s4,
    MAX(season) AS smax, MIN(season) AS smin
  FROM comp GROUP BY event_type, n),
a2 AS MATERIALIZED (
  SELECT c.*, a.m_rem, a.m_sa, a.m_rs, a.s2, a.s4, a.smax, a.smin,
    c.rem - a.m_rem AS dr
  FROM comp c JOIN a1 a USING (event_type)),
a2l AS MATERIALIZED (
  SELECT *, {lead_cols} FROM a2),
a3 AS MATERIALIZED (
  SELECT event_type, n, s2, s4,
    list_sum(list(dr * dr ORDER BY rn)) AS ss_rem,
    list_sum(list((deseas - m_sa) * (deseas - m_sa) ORDER BY rn)) AS ss_sa,
    list_sum(list(((rem + season) - m_rs) * ((rem + season) - m_rs)
                  ORDER BY rn)) AS ss_rs,
    list_sum(list(((rn - (n + 1) / 2) / sqrt(s2)) * trend
                  ORDER BY rn)) AS lin,
    list_sum(list((({t2} - s2 / n) / sqrt(s4 - s2 * (s2 / n))) * trend
                  ORDER BY rn)) AS cur,
    MIN(CASE WHEN season = smax THEN rn END) AS peak_rn,
    MIN(CASE WHEN season = smin THEN rn END) AS trough_rn,
    {sks}
  FROM a2l GROUP BY event_type, n, s2, s4),
loo AS MATERIALIZED (
  SELECT a2.event_type, a2.rn, a2.n,
    ((a3.ss_rem / (a2.n - 1)) * (a2.n - 1) - a2.dr * a2.dr)
      / (a2.n - 2) AS lv
  FROM a2 JOIN a3 USING (event_type)),
a5 AS MATERIALIZED (
  SELECT event_type, n, list_sum(list(lv ORDER BY rn)) / n AS m_loo
  FROM loo GROUP BY event_type, n),
a6 AS MATERIALIZED (
  SELECT l.event_type,
    list_sum(list((l.lv - a.m_loo) * (l.lv - a.m_loo) ORDER BY l.rn))
      / (l.n - 1) AS spikiness
  FROM loo l JOIN a5 a USING (event_type, n)
  GROUP BY l.event_type, l.n),
rhos AS MATERIALIZED (
  SELECT *, ss_rem / (n - 1) AS var_e, ss_rem / n AS c0,
    {", ".join(f"((sk{k} / n) / (ss_rem / n)) AS rho{k}"
               for k in range(1, 11))}
  FROM a3)
SELECT r.event_type,
  CASE WHEN r.ss_sa / (r.n - 1) = 0 THEN NULL
       ELSE greatest(0e0, least(1e0, 1e0 - r.var_e / (r.ss_sa / (r.n - 1))))
       END AS trend_strength,
  CASE WHEN r.ss_rs / (r.n - 1) = 0 THEN NULL
       ELSE greatest(0e0, least(1e0, 1e0 - r.var_e / (r.ss_rs / (r.n - 1))))
       END AS seasonal_strength_{p},
  CAST(r.peak_rn % {p} AS DOUBLE) AS seasonal_peak_{p},
  CAST(r.trough_rn % {p} AS DOUBLE) AS seasonal_trough_{p},
  s.spikiness AS spikiness, r.lin AS linearity, r.cur AS curvature,
  r.rho1 AS stl_e_acf1, {acf10} AS stl_e_acf10
FROM rhos r JOIN a6 s USING (event_type)
"""
