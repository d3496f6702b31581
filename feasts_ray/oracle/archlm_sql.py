"""DuckDB oracle generator for the ARCH LM statistic (stat_arch_lm).

Mirrors functions/features._arch_lm_exact_int term-for-term: z_t =
(x_t - S/n)^2 per element (S, n exact integers), the (lags+1)x(lags+1)
normal equations as ascending-row sequential folds (list_sum over
ORDERED lists — DuckDB's list_sum accumulates left-to-right, the same
fold order as the kernel's explicit loops), a fully unrolled Cholesky
solve (+-*/ and sqrt only — all correctly-rounded IEEE ops), and the
residual / total sums as the same ordered folds.

The Cholesky / forward / back substitutions are emitted as ONE CTE
STAGE PER SOLVED ELEMENT rather than lateral alias chains: DuckDB
inlines same-SELECT alias references textually, so a chained solve in
one projection blows up exponentially in the binder; materializing each
column across ~40 tiny projections keeps every expression linear while
preserving the exact subtraction order (ascending k, matching the
kernel's explicit loops).

sqrt is guarded (DuckDB errors on negative input); a `sing` flag ORs
the diag-arg<=0 conditions, equivalent to the kernel's sequential
early-return to 1.0 regardless of the garbage the guarded substitution
produces downstream.

Reference semantics: /root/reference/R/features.R:18-30 (R^2 of x^2 on
its `lags` lags after demeaning).
"""

from __future__ import annotations


def arch_lm_sql(series_cte: str, lags: int = 12) -> str:
    p = lags + 1

    zlags = ",\n    ".join(
        f"lag(z0, {j}) OVER w AS z{j}" for j in range(1, lags + 1))

    # ---- normal equations: G (upper triangle) and c ------------------
    def fold(expr: str) -> str:
        return f"list_sum(list({expr} ORDER BY bucket))"

    g_cols = []
    for j in range(1, p):
        g_cols.append(f"{fold(f'z{j}')} AS g_0_{j}")
    for i in range(1, p):
        for j in range(i, p):
            g_cols.append(f"{fold(f'z{i} * z{j}')} AS g_{i}_{j}")
    c_cols = [f"{fold('z0')} AS c_0"]
    for i in range(1, p):
        c_cols.append(f"{fold(f'z{i} * z0')} AS c_{i}")
    gagg = ",\n    ".join(g_cols + c_cols)

    def g_ref(i: int, j: int) -> str:
        if i == 0 and j == 0:
            return "CAST(m AS DOUBLE)"
        lo, hi = min(i, j), max(i, j)
        return f"g_{lo}_{hi}"

    # ---- solve stages: each CTE materializes one column of the solve,
    # so every expression references REAL columns (linear size) --------
    stages: list[str] = []
    prev = "g"

    def stage(name: str, cols: list[str]) -> None:
        nonlocal prev
        stages.append(
            f"{name} AS (SELECT *,\n    " + ",\n    ".join(cols)
            + f"\n  FROM {prev})")
        prev = name

    for j in range(p):
        acc = g_ref(j, j)
        for k in range(j):
            acc = f"({acc} - l_{j}_{k} * l_{j}_{k})"
        cols = [f"{acc} AS a_{j}",
                f"sqrt(CASE WHEN a_{j} > 0.0e0 THEN a_{j} ELSE 1.0e0 END) "
                f"AS l_{j}_{j}"]
        for i in range(j + 1, p):
            acc = g_ref(i, j)
            for k in range(j):
                acc = f"({acc} - l_{i}_{k} * l_{j}_{k})"
            cols.append(f"{acc} / l_{j}_{j} AS l_{i}_{j}")
        stage(f"ch{j}", cols)
    for i in range(p):
        acc = f"c_{i}"
        for k in range(i):
            acc = f"({acc} - l_{i}_{k} * w_{k})"
        stage(f"fs{i}", [f"{acc} / l_{i}_{i} AS w_{i}"])
    for i in range(p - 1, -1, -1):
        acc = f"w_{i}"
        for k in range(i + 1, p):
            acc = f"({acc} - l_{k}_{i} * beta_{k})"
        stage(f"bs{i}", [f"{acc} / l_{i}_{i} AS beta_{i}"])

    solve_stages = ",\n".join(stages)
    sing = "(" + " OR ".join(f"a_{j} <= 0.0e0" for j in range(p)) + ")"
    beta_keep = ", ".join(f"beta_{j}" for j in range(p))

    # ---- per-row fitted chain: ((b0 + b1*z1) + b2*z2) + ... ----------
    fit = "s.beta_0"
    for j in range(1, p):
        fit = f"({fit} + s.beta_{j} * r.z{j})"

    return f"""
WITH {series_cte},
st AS (
  SELECT event_type, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s
  FROM series GROUP BY event_type),
zz AS (
  SELECT sr.event_type, sr.bucket,
    (CAST(sr.x AS DOUBLE) - CAST(st.s AS DOUBLE) / st.n)
      * (CAST(sr.x AS DOUBLE) - CAST(st.s AS DOUBLE) / st.n) AS z0
  FROM series sr JOIN st USING (event_type)),
zl AS (
  SELECT event_type, bucket, z0,
    {zlags},
    ROW_NUMBER() OVER w AS rn
  FROM zz WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
rows_ AS (SELECT * FROM zl WHERE rn > {lags}),
g AS (
  SELECT event_type, COUNT(*) AS m,
    {gagg}
  FROM rows_ GROUP BY event_type),
{solve_stages},
sk AS (SELECT event_type, m, c_0, {sing} AS sing, {beta_keep} FROM {prev}),
ragg AS (
  SELECT r.event_type,
    list_sum(list((r.z0 - {fit}) * (r.z0 - {fit}) ORDER BY r.bucket)) AS ss_res,
    list_sum(list((r.z0 - s.c_0 / s.m) * (r.z0 - s.c_0 / s.m) ORDER BY r.bucket)) AS ss_tot
  FROM rows_ r JOIN sk s USING (event_type)
  GROUP BY r.event_type)
SELECT s.event_type,
  CASE WHEN s.m <= {lags + 1} THEN NULL
       WHEN s.sing THEN 1.0e0
       WHEN a.ss_tot <= 0.0e0 THEN 1.0e0
       ELSE 1.0e0 - a.ss_res / a.ss_tot END AS stat_arch_lm
FROM sk s JOIN ragg a USING (event_type)
"""
