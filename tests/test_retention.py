"""Retention enforcement (feasts_ray/pipelines/retention.py): expiry is
partition-exact (kept points == full set filtered to bucket >= cutoff;
kept blob files byte-identical), idempotent, re-applied by ingest, and
a full rebuild does not resurrect expired history.

Uses a small-segment config (segment_points=64, 2 segs/partition) so
the 20000-second synthetic span covers many raw partitions and a few
1m partitions — the default 3-day partitions would never expire at
test scale."""

import shutil
from pathlib import Path

import pandas as pd
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from feasts_ray.config import RollupConfig
from feasts_ray.pipelines.incremental import run_rollup_incremental
from feasts_ray.pipelines.retention import (enforce_retention, load_marker,
                                            reenforce_retention,
                                            retention_cutoff)
from feasts_ray.pipelines.rollup_pipeline import (_points_part_span,
                                                  _tier_dirs, run_rollup)
from feasts_ray.synth import ensure_token_table

N_DOCS = 80000  # 20000 s of event time at 4 docs/s; the synth
# table is written in multiple parquet parts — tests slice the FIRST
# part only, so splits are computed from its actual row count
BASE = Path("/tmp/feasts_ray_test/retention")
CFG = RollupConfig(segment_points=64, points_partition_segs=2)
UNIT = {"raw": 1, "1m": 60}


def _points_df(out_dir, tier) -> pd.DataFrame:
    points_dir, _ = _tier_dirs(str(out_dir), tier)
    df = pads.dataset(str(points_dir)).to_table().to_pandas()
    df = df.drop(columns=[c for c in df.columns if c == "seg_part"])
    return df.sort_values(["source", "bucket"], ignore_index=True,
                          kind="mergesort")


def _blob_bytes(out_dir, tier):
    _, blobs_dir = _tier_dirs(str(out_dir), tier)
    return {str(f.relative_to(blobs_dir)): f.read_bytes()
            for f in sorted(blobs_dir.glob("shard=*/blob-*.parquet"))}


@pytest.fixture(scope="module")
def built(ray_session):
    """One full build shared by the tests; each test copies it."""
    shutil.rmtree(BASE, ignore_errors=True)
    src = pq.read_table(f"{ensure_token_table(N_DOCS)}/part-00000.parquet")
    split = src.num_rows * 3 // 4
    in_dir = BASE / "in"
    in_dir.mkdir(parents=True)
    pq.write_table(src.slice(0, split), in_dir / "part-00000.parquet",
                   row_group_size=8192)
    out = BASE / "out"
    metrics = run_rollup(str(in_dir), str(out), cfg=CFG)
    return src, in_dir, out, metrics


def _copy(built, tmp_path):
    _src, _in, out0, metrics = built
    out = tmp_path / "out"
    shutil.copytree(out0, out)
    return out, metrics


def _horizons(out, wm) -> dict[str, int]:
    """Horizons guaranteed to bite: keep back to exactly the end of each
    tier's FIRST points partition, so precisely that partition (and its
    segments' blob files) expire regardless of the synth table's span."""
    h = {}
    for tier, unit in UNIT.items():
        points_dir, _ = _tier_dirs(str(out), tier)
        first = min(int(d.name.split("=", 1)[1])
                    for d in points_dir.glob("seg_part=*"))
        h[tier] = wm - (first + 1) * _points_part_span(CFG, unit)
        assert h[tier] > 0
    return h


class TestEnforce:
    def test_partition_exact_and_idempotent(self, built, tmp_path):
        out, metrics = _copy(built, tmp_path)
        full = {t: _points_df(out, t) for t in UNIT}
        blobs_before = {t: _blob_bytes(out, t) for t in UNIT}
        wm = max(m["watermark"] for m in metrics.values()
                 if m.get("watermark") is not None)
        horizons = _horizons(out, wm)
        rep = enforce_retention(out, horizons, cfg=CFG)
        for tier, horizon in horizons.items():
            part_span = _points_part_span(CFG, UNIT[tier])
            cutoff = retention_cutoff(wm, horizon, part_span)
            assert rep[tier]["cutoff"] == cutoff, tier
            kept = _points_df(out, tier)
            exp = (full[tier][full[tier]["bucket"] >= cutoff]
                   .reset_index(drop=True))
            pd.testing.assert_frame_equal(kept, exp)
            # kept blob files byte-identical; a file expires exactly when
            # its whole segment sits below the cutoff
            seg_span = CFG.segment_points * UNIT[tier]
            after = _blob_bytes(out, tier)
            for name, data in blobs_before[tier].items():
                seg = int(Path(name).stem.rsplit("-", 1)[1])
                if (seg + 1) * seg_span <= cutoff:
                    assert name not in after, (tier, name)
                else:
                    assert after[name] == data, (tier, name)
            assert set(after) <= set(blobs_before[tier])
            assert rep[tier]["expired_parts"] > 0, tier
            assert rep[tier]["expired_blob_files"] > 0, tier
        # idempotent: same as_of deletes nothing further
        rep2 = enforce_retention(out, horizons, cfg=CFG, as_of=wm)
        assert all(r["expired_parts"] == 0 and r["expired_blob_files"] == 0
                   for r in rep2.values())

    def test_marker_and_reenforce_noop(self, built, tmp_path):
        out, _ = _copy(built, tmp_path)
        rep = enforce_retention(out, {"raw": 4000}, cfg=CFG)
        m = load_marker(out, "raw")
        assert m == {k: rep["raw"][k]
                     for k in ("tier", "horizon_s", "cutoff", "as_of")}
        rep2 = reenforce_retention(out, cfg=CFG)
        assert rep2["raw"]["cutoff"] == rep["raw"]["cutoff"]
        assert rep2["raw"]["expired_parts"] == 0

    def test_missing_manifest_requires_as_of(self, tmp_path):
        with pytest.raises(ValueError):
            enforce_retention(tmp_path / "nothing", {"raw": 60}, cfg=CFG)


class TestRebuildAndIngest:
    def test_full_rebuild_does_not_resurrect(self, built, tmp_path):
        src, in_dir0, out0, _ = built
        out, _ = _copy(built, tmp_path)
        rep = enforce_retention(out, {"raw": 4000}, cfg=CFG)
        cutoff = rep["raw"]["cutoff"]
        assert int(_points_df(out, "raw")["bucket"].min()) >= cutoff
        # force a full rebuild: nuke every tier checkpoint manifest
        from feasts_ray.state import checkpoint as ckpt

        for t in CFG.tiers:
            mp = ckpt.manifest_path(out / f"tier={t.name}")
            if mp.exists():
                mp.unlink()
        run_rollup(str(in_dir0), str(out), cfg=CFG)
        # the rebuild regenerated full raw history from the (never
        # pruned) input, cascaded coarser tiers from it, then the marker
        # re-expired raw at the same watermark
        kept = _points_df(out, "raw")
        assert int(kept["bucket"].min()) >= cutoff
        m = load_marker(out, "raw")
        assert m is not None and m["cutoff"] == cutoff

    def test_ingest_advances_cutoff(self, built, tmp_path):
        # own input dir + build: the ingest lineage hashes the input
        # PATH, so the shared fixture's output can't be re-pointed here
        src, _in0, _out0, _ = built
        split = src.num_rows * 3 // 4
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        pq.write_table(src.slice(0, split), in_dir / "part-00000.parquet",
                       row_group_size=8192)
        out = tmp_path / "out"
        run_rollup(str(in_dir), str(out), cfg=CFG)
        rep = enforce_retention(out, {"raw": 4000}, cfg=CFG)
        # append newer docs (later doc index -> later event time)
        pq.write_table(src.slice(split), in_dir / "part-00001.parquet",
                       row_group_size=8192)
        m1 = run_rollup_incremental(str(in_dir), str(out), cfg=CFG)
        assert m1["raw"].get("incremental") is True
        m = load_marker(out, "raw")
        # watermark advanced ~5000 s -> the recorded horizon re-applied
        # at the new watermark moves the cutoff forward
        assert m["cutoff"] > rep["raw"]["cutoff"]
        assert m["as_of"] > rep["raw"]["as_of"]
        kept = _points_df(out, "raw")
        assert int(kept["bucket"].min()) >= m["cutoff"]
        assert int(kept["bucket"].max()) == m["as_of"]
        assert m1["raw"]["retention"]["cutoff"] == m["cutoff"]
