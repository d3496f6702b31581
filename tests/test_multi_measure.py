"""Multi-measure rollups (VERDICT r04 missing #3).

The contract: a RollupConfig with value_col=(m1, m2) rolls BOTH measures
in one scan + one shuffle, and every per-measure column (sum_<m>, min_<m>,
max_<m>, mean_<m>) is bit-identical to the column the legacy
single-measure run over that measure alone produces — the multi kernel is
the same reduceat per measure, so equality is exact, not approximate.
Blob round-trip must cover both measures.
"""

import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from feasts_ray.config import RollupConfig, TIERS
from feasts_ray.pipelines.rollup_pipeline import run_rollup
from feasts_ray.stages.encode import decode_segments
from feasts_ray.synth import ensure_token_table

BASE = "/tmp/feasts_ray_test/multi_measure"
N_DOCS = 4000


@pytest.fixture(scope="module")
def two_measure_table(ray_session):
    """Synth token table with a second deterministic measure column."""
    import glob

    src = ensure_token_table(N_DOCS)
    dst = f"{BASE}/input"
    shutil.rmtree(dst, ignore_errors=True)
    import os

    os.makedirs(dst, exist_ok=True)
    for f in sorted(glob.glob(f"{src}/*.parquet")):
        t = pq.read_table(f)
        n_tok = t["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        # second measure: deterministic, different distribution than n_tok
        alt = (n_tok * 7 + 3) % 101
        t = t.append_column("n_alt", pa.array(alt.astype(np.int32)))
        pq.write_table(t, f"{dst}/{os.path.basename(f)}")
    return dst


@pytest.fixture(scope="module")
def runs(two_measure_table):
    multi_out = f"{BASE}/out_multi"
    single_tok = f"{BASE}/out_tok"
    single_alt = f"{BASE}/out_alt"
    for d in (multi_out, single_tok, single_alt):
        shutil.rmtree(d, ignore_errors=True)
    run_rollup(two_measure_table, multi_out,
               cfg=RollupConfig(value_col=("n_tok", "n_alt")))
    run_rollup(two_measure_table, single_tok,
               cfg=RollupConfig(value_col="n_tok"))
    run_rollup(two_measure_table, single_alt,
               cfg=RollupConfig(value_col="n_alt"))
    return multi_out, single_tok, single_alt


def _points(out: str, tier: str) -> pd.DataFrame:
    return (pads.dataset(f"{out}/tier={tier}/points").to_table().to_pandas()
            .sort_values(["source", "bucket"], ignore_index=True))


@pytest.mark.parametrize("tier", [t.name for t in TIERS])
def test_multi_matches_each_single(runs, tier):
    multi_out, single_tok, single_alt = runs
    got = _points(multi_out, tier)
    for m, single in (("n_tok", single_tok), ("n_alt", single_alt)):
        exp = _points(single, tier)
        np.testing.assert_array_equal(got["source"], exp["source"])
        np.testing.assert_array_equal(got["bucket"], exp["bucket"])
        np.testing.assert_array_equal(got["count"], exp["count"])
        for c in ("sum", "min", "max", "mean"):
            g = got[f"{c}_{m}"].to_numpy(dtype=np.float64, na_value=np.nan)
            e = exp[c].to_numpy(dtype=np.float64, na_value=np.nan)
            # bitwise: same reduceat trees on the same ints
            assert g.view(np.uint64).tolist() == e.view(np.uint64).tolist(), \
                f"{tier}/{c}_{m}"


@pytest.mark.parametrize("tier", ["1m", "1h"])
def test_multi_blob_roundtrip_both_measures(runs, tier):
    multi_out, _, _ = runs
    blobs = pads.dataset(f"{multi_out}/tier={tier}/blobs").to_table()
    decoded = decode_segments(blobs, measures=("n_tok", "n_alt"))
    pts = _points(multi_out, tier)
    assert len(decoded) == len(pts)
    np.testing.assert_array_equal(decoded["bucket"].to_numpy(), pts["bucket"])
    np.testing.assert_array_equal(decoded["count"].to_numpy(), pts["count"])
    for m in ("n_tok", "n_alt"):
        for c in ("sum", "min", "max", "mean"):
            g = decoded[f"{c}_{m}"].to_numpy(dtype=np.float64, na_value=np.nan)
            e = pts[f"{c}_{m}"].to_numpy(dtype=np.float64, na_value=np.nan)
            np.testing.assert_array_equal(g, e, err_msg=f"{tier}/{c}_{m}")


def test_incremental_multi_measure_bit_identical(two_measure_table):
    """Multi-measure ingest == multi-measure full recompute, every tier,
    points AND blobs (the suffixed-column selective merge)."""
    import glob
    import os

    from feasts_ray.pipelines.incremental import run_rollup_incremental

    cfg = RollupConfig(value_col=("n_tok", "n_alt"))
    parts = sorted(glob.glob(f"{two_measure_table}/*.parquet"))
    assert len(parts) >= 1
    # split the FIRST part file into base + delta (same recipe as
    # tests/test_incremental.py): base run sees rows [0, split), the
    # appended file carries the rest
    src = pq.read_table(parts[0])
    split = len(src) // 2
    in_dir = f"{BASE}/in_inc"
    shutil.rmtree(in_dir, ignore_errors=True)
    os.makedirs(in_dir)
    pq.write_table(src.slice(0, split), f"{in_dir}/part-00000.parquet")
    out_inc = f"{BASE}/out_inc"
    out_full = f"{BASE}/out_inc_full"
    for d in (out_inc, out_full):
        shutil.rmtree(d, ignore_errors=True)
    run_rollup(in_dir, out_inc, cfg=cfg)
    pq.write_table(src.slice(split), f"{in_dir}/part-00001.parquet")
    m1 = run_rollup_incremental(in_dir, out_inc, cfg=cfg)
    assert m1["raw"].get("incremental") is True
    run_rollup(in_dir, out_full, cfg=cfg)
    for tier in [t.name for t in TIERS]:
        for sub, keys in (("points", ["source", "bucket"]),
                          ("blobs", ["source", "segment"])):
            a = (pads.dataset(f"{out_inc}/tier={tier}/{sub}").to_table()
                 .to_pandas().sort_values(keys, ignore_index=True))
            b = (pads.dataset(f"{out_full}/tier={tier}/{sub}").to_table()
                 .to_pandas().sort_values(keys, ignore_index=True))
            pd.testing.assert_frame_equal(
                a[sorted(a.columns)], b[sorted(b.columns)],
                check_exact=True, obj=f"{tier}/{sub}")
