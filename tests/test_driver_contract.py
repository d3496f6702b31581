"""In-suite driver-contract conformance: a fast subset of the
queries()/oracle_sql() pairs compared bitwise against DuckDB at sf0.001
(the full sweep lives in scripts/check_contract.py)."""

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent
SF_DIR = "/root/testdata/sf0.001"

FAST_ORACLE_QUERIES = [
    "rollup_1m", "rollup_1h_cascade", "gapfill_1h", "gap_counts",
    "acf_1h_counts", "event_type_stats", "dedup_exact", "token_counts",
    "text_quality", "langid", "ccf_1h", "seasonal_subseries_1h",
    "rolling_24h", "anomalies_1h", "pricing_summary", "lag_pairs_1h",
    "acf_table_1h", "pacf_table_1h", "classical_1h", "features_basic_1h",
    "bpe_token_counts", "seasonal_overlay_1h", "arch_lm_1h",
    "simhash_dup_pairs", "fingerprint", "embedding_dedup_docs",
    "rollup_1m_incremental", "quality_topk_per_lang",
    "distinct_users_by_type", "dup_span_stats",
    "repetition_signals", "tfidf_top_terms", "quality_filter_by_lang",
]


@pytest.fixture(scope="module")
def contract():
    sys.path.insert(0, str(REPO))
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return e.queries(), e.oracle_sql(), con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", FAST_ORACLE_QUERIES)
def test_query_bit_exact_vs_duckdb(contract, ray_session, name):
    import pyarrow as pa

    import ray.data

    queries, oracles, con = contract
    res = queries[name](SF_DIR)
    if isinstance(res, ray.data.Dataset):
        ours = res.to_pandas()
    elif isinstance(res, pa.Table):
        ours = res.to_pandas()
    else:
        ours = res
    theirs = con.sql(oracles[name]).df()
    assert sorted(ours.columns) == sorted(theirs.columns)
    assert len(ours) == len(theirs)
    a, b = _canon(ours), _canon(theirs)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = pd.to_numeric(a[c]).to_numpy(dtype=np.float64)
            bv = pd.to_numeric(b[c]).to_numpy(dtype=np.float64)
            same = (av.view(np.int64) == bv.view(np.int64)) | (
                np.isnan(av) & np.isnan(bv))
            assert same.all(), f"{name}.{c}: {int((~same).sum())} float mismatches"
        else:
            assert (av == bv).all(), f"{name}.{c}: value mismatch"
