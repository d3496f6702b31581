"""Flagship pipeline: token table -> cascading retention tiers -> blobs.

Dataflow (SURVEY.md §7.1, north rule):

  read_parquet(doc_id, n_tok, source)            # tokens column pruned at read
    -> MB derive ts (pure fn of doc_id, source)  # zero-copy Arrow
    -> MB partial rollup per (source, raw bucket) (combiner = implicit salt)
    -> AGG merge partials (the one wide shuffle over raw-derived rows)
    -> cascade: tier[k+1] = MB re-bucket partial + AGG over tier[k] output
    -> gap-fill per tier (dense bucket domain, distributed union+merge)
    -> mean = sum/count; sort(source, bucket); write points parquet
    -> groupby(source, segment).map_groups Gorilla/dod encode -> blobs parquet
    -> _CHECKPOINT.json per tier (lineage + metrics; resume skips done tiers)

All stages stream; nothing materializes the full dataset on the driver.
"""

from __future__ import annotations

import time
from dataclasses import asdict
from pathlib import Path

import pyarrow.dataset as pads

import ray.data

from ..config import RollupConfig, TIERS
from ..stages.bucketize import add_time_columns
from ..stages.encode import encode_tier
from ..stages.gapfill import gap_fill
from ..stages.rollup import add_mean, cascade_batch, merge_partials, partial_rollup_batch
from ..state import checkpoint as ckpt


def read_token_table(input_path: str, columns=("doc_id", "n_tok", "source")) -> "ray.data.Dataset":
    return ray.data.read_parquet(input_path, columns=list(columns))


def _tier_dirs(out_dir: str, tier_name: str) -> tuple[Path, Path]:
    base = Path(out_dir) / f"tier={tier_name}"
    return base / "points", base / "blobs"


def _points_stats(points_dir: Path) -> tuple[int, int]:
    """(rows, watermark=max bucket) from parquet row-group stats — no scan."""
    dset = pads.dataset(str(points_dir))
    rows, wm = 0, None
    for frag in dset.get_fragments():
        md = frag.metadata
        rows += md.num_rows
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == "bucket" and col.statistics is not None:
                    mx = col.statistics.max
                    wm = mx if wm is None else max(wm, mx)
    return rows, (wm if wm is not None else -1)


def run_rollup(
    input_path: str,
    out_dir: str,
    cfg: RollupConfig | None = None,
    encode: bool = True,
) -> dict[str, dict]:
    """Run (or resume) the full tier cascade. Returns per-tier metrics."""
    cfg = cfg or RollupConfig()
    cfg_dict = {
        "tiers": [t.name for t in cfg.tiers],
        "value_col": cfg.value_col,
        "gap_fill": cfg.gap_fill,
        "segment_points": cfg.segment_points,
        "encode": encode,
    }
    lineage = ckpt.lineage_hash(input_path, cfg_dict)
    metrics: dict[str, dict] = {}
    prev_points: Path | None = None

    for k, tier in enumerate(cfg.tiers):
        points_dir, blobs_dir = _tier_dirs(out_dir, tier.name)
        if ckpt.is_complete(points_dir.parent, lineage):
            metrics[tier.name] = ckpt.load_manifest(points_dir.parent)
            prev_points = points_dir
            continue
        # stale partial output from a crashed attempt: clear before rerun
        import shutil

        for d in (points_dir, blobs_dir):
            if d.exists():
                shutil.rmtree(d)
        t0 = time.perf_counter()
        if k == 0:
            ds = read_token_table(input_path)
            ds = ds.map_batches(add_time_columns, batch_format="pyarrow")
            ds = ds.map_batches(
                partial_rollup_batch,
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
                fn_kwargs={"unit_s": tier.unit_s, "value_col": cfg.value_col,
                           "key_col": cfg.series_key},
            )
        else:
            assert prev_points is not None
            ds = ray.data.read_parquet(
                str(prev_points),
                columns=[cfg.series_key, "bucket", "count", "sum", "min", "max"],
            )
            ds = ds.map_batches(
                cascade_batch, batch_format="pyarrow", fn_kwargs={"unit_s": tier.unit_s}
            )
        agg = merge_partials(ds, key_cols=(cfg.series_key, "bucket"))
        if cfg.gap_fill:
            agg = gap_fill(agg, tier.unit_s, key_col=cfg.series_key)
        agg = add_mean(agg)
        agg = agg.sort([cfg.series_key, "bucket"])
        agg.write_parquet(str(points_dir))
        rows, watermark = _points_stats(points_dir)
        blob_bytes = 0
        if encode:
            blobs = encode_tier(
                ray.data.read_parquet(str(points_dir)),
                tier.unit_s,
                tier.name,
                key_col=cfg.series_key,
                segment_points=cfg.segment_points,
            )
            blobs.write_parquet(str(blobs_dir))
            blob_bytes = ckpt.dir_bytes(blobs_dir)
        wall = time.perf_counter() - t0
        m = {
            "tier": tier.name,
            "lineage": lineage,
            "rows_out": rows,
            "points": rows,
            "bytes_blobs": blob_bytes,
            "watermark": watermark,
            "wall_s": wall,
            "input": input_path if k == 0 else str(prev_points),
        }
        ckpt.save_manifest(points_dir.parent, m)
        metrics[tier.name] = ckpt.load_manifest(points_dir.parent)
        prev_points = points_dir
    return metrics
