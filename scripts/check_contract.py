"""Local mimic of the driver's correctness gate: run each queries() entry
and its oracle_sql() side-by-side, compare row-count + schema +
order-insensitive values (floats compared bitwise, like a value-hash).

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

import ray

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, ours: pd.DataFrame, theirs: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ours.columns) != sorted(theirs.columns):
        return [f"schema: {sorted(ours.columns)} vs {sorted(theirs.columns)}"]
    if len(ours) != len(theirs):
        return [f"rows: {len(ours)} vs {len(theirs)}"]
    a, b = canon(ours), canon(theirs)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        # The driver's value-hash is dtype-sensitive: DuckDB HUGEINT (from a
        # bare SUM(BIGINT)) arrives as float64/object while the engine emits
        # int64, and that alone fails the hash even when values are equal.
        if av.dtype != bv.dtype:
            problems.append(f"col {c}: dtype {av.dtype} vs {bv.dtype} "
                            "(driver hash is dtype-sensitive)")
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = pd.to_numeric(a[c]).to_numpy(dtype=np.float64)
            bv = pd.to_numeric(b[c]).to_numpy(dtype=np.float64)
            same = (av.view(np.int64) == bv.view(np.int64)) | (
                np.isnan(av) & np.isnan(bv))
            if not same.all():
                i = int(np.flatnonzero(~same)[0])
                problems.append(
                    f"col {c}: {int((~same).sum())} mismatches, first at row {i}: "
                    f"{av[i]!r} vs {bv[i]!r}")
        else:
            same = av == bv
            if not same.all():
                i = int(np.flatnonzero(~same)[0])
                problems.append(
                    f"col {c}: {int((~same).sum())} mismatches, first {av[i]!r} vs {bv[i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, ".")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            n_bad += 1
            continue
        dt = time.perf_counter() - t0
        if name in oracles:
            try:
                theirs = con.sql(oracles[name]).df()
            except Exception as ex:
                print(f"FAIL {name}: oracle raised {ex}")
                n_bad += 1
                continue
            probs = compare(name, ours, theirs)
            if probs:
                print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(probs))
                n_bad += 1
            else:
                print(f"ok   {name} ({dt:.1f}s) rows={len(ours)} [oracle bit-exact]")
                n_ok += 1
        else:
            print(f"ok   {name} ({dt:.1f}s) rows={len(ours)} [rows-only]")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
