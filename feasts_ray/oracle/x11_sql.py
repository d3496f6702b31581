"""DuckDB oracle generator for the additive X11 decomposition.

X11 additive is a composition of FIXED finite linear filters (centered
MA(period), 3x3/3x5 seasonal MAs with the published X-11 end-weight
tables, Henderson-13 with Musgrave minimum-revision end filters — see
functions/x11.py). Every output value is therefore a window dot product
over the gap-filled series, expressible as explicit lag/lead coefficient
chains in ANSI SQL.

Bit-exactness contract: the kernel evaluates every dot product with a
strictly left-to-right tap accumulation (functions/x11._seq_dot /
_interior_taps), and this generator emits the SAME weights (taken from
the same numpy arrays, shortest-round-trip float literals) in the SAME
order as left-associated `(w0*x0 + w1*x1) + ...` chains — so DuckDB's
IEEE doubles reproduce the kernel bit-for-bit.

Reference contract for the X11 surface: /root/reference/R/x11.R:19-84
(the binary itself is out of scope; the published-method reimplementation
is the documented deviation, SURVEY.md §2.6).
"""

from __future__ import annotations

import numpy as np

from ..functions.x11 import _END33, _END35, _H13, _H13_R, _W33, _W35, musgrave_weights


def _lit(v: float) -> str:
    """Shortest round-trip DOUBLE literal. The exponent suffix is load-
    bearing: DuckDB types a bare decimal literal as DECIMAL (different
    rounding); '...e0' forces DOUBLE with correctly-rounded parse."""
    r = repr(float(v))
    return r if ("e" in r or "E" in r) else r + "e0"


def _chain(pairs: list[tuple[float, str]]) -> str:
    """Left-associated coefficient chain mirroring _seq_dot's order."""
    s = f"({_lit(pairs[0][0])} * {pairs[0][1]})"
    for w, e in pairs[1:]:
        s = f"({s} + {_lit(w)} * {e})"
    return s


def _ref(col: str, off: int, win: str) -> str:
    if off == 0:
        return col
    if off < 0:
        return f"lag({col}, {-off}) OVER {win}"
    return f"lead({col}, {off}) OVER {win}"


def _cma_weights(period: int) -> np.ndarray:
    if period % 2 == 0:
        return np.concatenate([[0.5], np.ones(period - 1), [0.5]]) / period
    return np.ones(period) / period


def _cma_case(col: str, win: str, period: int, t: str = "t", n: str = "n") -> str:
    """Centered MA(period) with truncated re-normalized edge weights
    (kernel _centered_ma -> _sym_filter with no end table). Valid for
    series length n >= 2h+1."""
    w = _cma_weights(period)
    h = len(w) // 2
    whens = []
    for tt in range(h):           # start edges: support -tt..h
        ww = w[h - tt:]
        pairs = [(ww[i], _ref(col, -tt + i, win)) for i in range(len(ww))]
        whens.append(f"WHEN {t} = {tt} THEN {_chain(pairs)} / {_lit(ww.sum())}")
    for q in range(h):            # end edges at t = n-1-q: support -h..q
        ww = w[: h + q + 1]
        pairs = [(ww[i], _ref(col, -h + i, win)) for i in range(len(ww))]
        whens.append(f"WHEN {t} = {n} - {q + 1} THEN {_chain(pairs)} / {_lit(ww.sum())}")
    interior = [(w[k], _ref(col, k - h, win)) for k in range(len(w))]
    return "CASE " + " ".join(whens) + f" ELSE {_chain(interior)} END"


def _h13_case(col: str, win: str, t: str = "t", n: str = "n") -> str:
    """Henderson-13 with Musgrave asymmetric ends (kernel
    _musgrave_filter; weights from the same musgrave_weights call)."""
    w = _H13
    h = len(w) // 2
    whens = []
    for tt in range(h):           # start edges: mirrored support -tt..h
        u = musgrave_weights(w, tt, _H13_R)[::-1]
        pairs = [(u[i], _ref(col, -tt + i, win)) for i in range(len(u))]
        whens.append(f"WHEN {t} = {tt} THEN {_chain(pairs)}")
    for q in range(h):            # end edges at t = n-1-q: support -h..q
        u = musgrave_weights(w, q, _H13_R)
        pairs = [(u[i], _ref(col, -h + i, win)) for i in range(len(u))]
        whens.append(f"WHEN {t} = {n} - {q + 1} THEN {_chain(pairs)}")
    interior = [(w[k], _ref(col, k - h, win)) for k in range(len(w))]
    return "CASE " + " ".join(whens) + f" ELSE {_chain(interior)} END"


def _pma_case(col: str, pwin: str, W: np.ndarray, E: dict[int, np.ndarray],
              h: int, tp: str = "tp", np_: str = "np") -> str:
    """Seasonal (phase-subseries) MA with the published X-11 end-weight
    table E (kernel _phase_ma -> _sym_filter with end_weights). Valid
    for per-phase length np >= 2h+1."""
    whens = []
    for q in sorted(E):           # start edges: mirrored table weights
        ww = E[q][::-1]
        pairs = [(ww[i], _ref(col, -q + i, pwin)) for i in range(len(ww))]
        whens.append(f"WHEN {tp} = {q} THEN {_chain(pairs)}")
    for q in sorted(E):           # end edges at tp = np-1-q
        ww = E[q]
        pairs = [(ww[i], _ref(col, -h + i, pwin)) for i in range(len(ww))]
        whens.append(f"WHEN {tp} = {np_} - {q + 1} THEN {_chain(pairs)}")
    interior = [(W[k], _ref(col, k - h, pwin)) for k in range(len(W))]
    return "CASE " + " ".join(whens) + f" ELSE {_chain(interior)} END"


def x11_additive_sql(series_cte: str, period: int = 24) -> str:
    """Full oracle: ``series_cte`` must end with a CTE named ``series``
    of (event_type, bucket, x) rows — the gap-filled integer counts.
    Requires n >= 2*period per series (the query's own precondition)."""
    win = "(PARTITION BY event_type ORDER BY bucket)"
    pwin = "(PARTITION BY event_type, phase ORDER BY bucket)"
    return f"""
WITH {series_cte},
idx AS (
  SELECT event_type, bucket, CAST(x AS DOUBLE) AS y,
    ROW_NUMBER() OVER {win} - 1 AS t,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM series),
s_t1 AS (
  SELECT *, {_cma_case('y', 'win', period)} AS t1 FROM idx
  WINDOW win AS {win}),
s_d1 AS (SELECT *, y - t1 AS detr1, t % {period} AS phase FROM s_t1),
s_np AS (
  SELECT *, ROW_NUMBER() OVER {pwin} - 1 AS tp,
    COUNT(*) OVER (PARTITION BY event_type, phase) AS np
  FROM s_d1),
s_s1r AS (
  SELECT *, {_pma_case('detr1', 'pwin', _W33, _END33, 2)} AS s1_raw FROM s_np
  WINDOW pwin AS {pwin}),
s_c1 AS (
  SELECT *, {_cma_case('s1_raw', 'win', period)} AS centre1 FROM s_s1r
  WINDOW win AS {win}),
s_d2 AS (SELECT *, y - (s1_raw - centre1) AS des1 FROM s_c1),
s_t2 AS (
  SELECT *, {_h13_case('des1', 'win')} AS t2 FROM s_d2
  WINDOW win AS {win}),
s_d3 AS (SELECT *, y - t2 AS detr2 FROM s_t2),
s_s2r AS (
  SELECT *, {_pma_case('detr2', 'pwin', _W35, _END35, 3)} AS s2_raw FROM s_d3
  WINDOW pwin AS {pwin}),
s_c2 AS (
  SELECT *, {_cma_case('s2_raw', 'win', period)} AS centre2 FROM s_s2r
  WINDOW win AS {win}),
fin AS (SELECT *, s2_raw - centre2 AS seasonal FROM s_c2)
SELECT event_type, bucket, y AS value, t2 AS trend, seasonal,
  (y - t2) - seasonal AS remainder, y - seasonal AS season_adjust
FROM fin
"""
