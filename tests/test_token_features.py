"""Ray token-feature kernel vs single-process oracle: bit-exact."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from feasts_ray.oracle.token_features import oracle_token_features
from feasts_ray.stages.token_features import (
    FEATURE_COLS,
    token_feature_block,
    token_feature_table,
    padded_matrix,
)
from feasts_ray.synth import ensure_token_table

N_DOCS = 3000


@pytest.fixture(scope="module")
def both(ray_session):
    path = ensure_token_table(N_DOCS)
    ds = ray.data.read_parquet(path, columns=["doc_id", "tokens", "source"])
    got = token_feature_table(ds, batch_size=256).to_pandas()
    got = got.sort_values("doc_id", ignore_index=True)
    exp = oracle_token_features(N_DOCS).sort_values("doc_id", ignore_index=True)
    return got, exp


def test_row_count_and_ids(both):
    got, exp = both
    assert len(got) == len(exp) == N_DOCS
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["source"].tolist() == exp["source"].tolist()


@pytest.mark.parametrize("col", FEATURE_COLS)
def test_feature_bit_exact(both, col):
    got, exp = both
    g = got[col].to_numpy(dtype=np.float64)
    e = exp[col].to_numpy(dtype=np.float64)
    nan_g, nan_e = np.isnan(g), np.isnan(e)
    assert (nan_g == nan_e).all()
    assert (g[~nan_g].view(np.int64) == e[~nan_e].view(np.int64)).all(), \
        f"{col}: not bit-identical"


def test_strengths_in_range(both):
    got, _ = both
    for c in ("season_strength", "trend_strength"):
        v = got[c].dropna()
        assert ((v >= 0) & (v <= 1 + 1e-12)).all()


def test_seasonal_signal_detected(both):
    """Synth token streams carry a period-60 seasonal wave (synth.py):
    the seasonal strength must reflect it on full-length docs."""
    got, _ = both
    long_docs = got[got["n"] >= 480]
    assert long_docs["season_strength"].mean() > 0.3


def test_batch_invariance(ray_session):
    """Same bits regardless of batch size (fixed PAD_LEN reduction tree)."""
    path = ensure_token_table(500)
    ds = ray.data.read_parquet(path, columns=["doc_id", "tokens", "source"])
    a = token_feature_table(ds, batch_size=64).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    b = token_feature_table(ds, batch_size=499).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    for c in FEATURE_COLS:
        ga = a[c].to_numpy(np.float64)
        gb = b[c].to_numpy(np.float64)
        same = (ga.view(np.int64) == gb.view(np.int64)) | (np.isnan(ga) & np.isnan(gb))
        assert same.all(), c


def test_long_docs_capped_consistently(ray_session):
    """Docs longer than PAD_LEN: features computed on the first PAD_LEN
    tokens with the CAPPED length as divisor (no silent wrong divisor,
    no opaque scatter error)."""
    import pyarrow as pa

    from feasts_ray.stages.token_features import (
        PAD_LEN,
        padded_matrix,
        token_feature_batch,
        token_feature_block,
    )

    long = list(range(PAD_LEN + 200))
    short = [5, 6, 7, 8]
    tbl = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "source": pa.array(["s", "s"]),
        "tokens": pa.array([long, short], type=pa.list_(pa.int32())),
    })
    out = token_feature_batch(tbl).to_pandas().sort_values("doc_id")
    # matches a manual run on the truncated prefix
    x, n, mask = padded_matrix(tbl["tokens"])
    assert n.tolist() == [PAD_LEN, 4]
    ref = token_feature_block(x[:1], n[:1], mask[:1])
    assert out["tok_mean"].iloc[0] == ref["tok_mean"][0]
    expect_mean = float(np.mean(np.arange(PAD_LEN, dtype=np.float64)))
    assert out["tok_mean"].iloc[0] == expect_mean


def test_tile_invariance():
    """Row tiling is a pure perf knob: any tile_elems gives identical
    bits (features are per-row; the tile only changes which rows share a
    matrix)."""
    from feasts_ray.stages.token_features import token_feature_batch
    from feasts_ray.synth import token_chunk

    batch = token_chunk(0, 700)
    ref = token_feature_batch(batch, tile_elems=1 << 30)   # one tile
    for te in (1, 4096, 64 * 1024):
        t = token_feature_batch(batch, tile_elems=te)
        for c in FEATURE_COLS:
            a = ref[c].to_numpy(zero_copy_only=False)
            b = t[c].to_numpy(zero_copy_only=False)
            same = (a.view(np.int64) == b.view(np.int64)) | (
                np.isnan(a) & np.isnan(b))
            assert same.all(), f"tile_elems={te} col={c}"
