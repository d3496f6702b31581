"""Retention enforcement: the third leg of the north rule's "rollup +
downsample + retention engine". Expires rolled points and blobs older
than a per-tier horizon by deleting WHOLE time partitions — cost is
O(#expired partitions + #expired blob files), never a data scan, so a
daily retention pass over a 10^12-sequence archive touches only the
partitions that age out that day.

Granularity contract: the cutoff snaps DOWN to a points-partition
boundary (``seg_part`` span = segment span x points_partition_segs,
rollup_pipeline._points_part_span), which is also a segment boundary —
so expiry is exact at the partition level: every kept partition dir and
blob file is byte-identical to before (nothing is rewritten), and the
kept point set equals the full set filtered to ``bucket >= cutoff``.

Blob files are addressable by segment without being opened: the tier
kernel names them ``blob-<crc>-<segment>.parquet``
(stages/tier_kernel.py::_write_blob), and segment s covers buckets
[s*seg_span, (s+1)*seg_span).

A ``_RETENTION.json`` marker per tier records the horizon, so
``reenforce_retention`` (called by run_rollup_incremental after every
ingest, and applicable after a full rebuild) re-derives the cutoff from
the CURRENT watermark — retention follows the data forward, and a full
recompute cannot silently resurrect expired history.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

from ..config import RollupConfig
from ..state import checkpoint as ckpt
from .rollup_pipeline import _points_part_span, _tier_dirs


def retention_cutoff(as_of: int, horizon_s: int, part_span: int) -> int:
    """First RETAINED bucket: (as_of - horizon) snapped down to the
    points-partition boundary (conservative: never expires a bucket
    younger than the horizon)."""
    return ((as_of - horizon_s) // part_span) * part_span


def marker_path(out_dir: str | Path, tier_name: str) -> Path:
    return Path(out_dir) / f"tier={tier_name}" / "_RETENTION.json"


def load_marker(out_dir: str | Path, tier_name: str) -> dict | None:
    p = marker_path(out_dir, tier_name)
    if not p.exists():
        return None
    try:
        return json.loads(p.read_text())
    except (OSError, json.JSONDecodeError):
        return None


def _tier_watermark(out_dir: str | Path, cfg: RollupConfig) -> int | None:
    """Newest bucket across all tier manifests (checkpoint metadata —
    no data scan)."""
    wms = []
    for t in cfg.tiers:
        m = ckpt.load_manifest(Path(out_dir) / f"tier={t.name}")
        if m and m.get("watermark") is not None:
            wms.append(int(m["watermark"]))
    return max(wms) if wms else None


def enforce_retention(
    out_dir: str | Path,
    horizons: dict[str, int],
    cfg: RollupConfig | None = None,
    as_of: int | None = None,
) -> dict[str, dict]:
    """Delete expired points partitions and blob files for every tier in
    ``horizons`` (seconds of history to keep, measured back from
    ``as_of`` — default: the newest manifest watermark). Idempotent; a
    repeat call with the same ``as_of`` deletes nothing. Returns a
    per-tier report and writes/updates ``_RETENTION.json`` markers."""
    cfg = cfg or RollupConfig()
    if as_of is None:
        as_of = _tier_watermark(out_dir, cfg)
        if as_of is None:
            raise ValueError(
                "no tier manifest with a watermark under "
                f"{out_dir}; pass as_of explicitly")
    report: dict[str, dict] = {}
    tiers = {t.name: t for t in cfg.tiers}
    for name, horizon_s in horizons.items():
        tier = tiers[name]
        part_span = _points_part_span(cfg, tier.unit_s)
        seg_span = cfg.segment_points * tier.unit_s
        cutoff = retention_cutoff(as_of, horizon_s, part_span)
        points_dir, blobs_dir = _tier_dirs(str(out_dir), name)
        expired_parts = 0
        if points_dir.exists():
            # partition P covers buckets [P*span, (P+1)*span): expired
            # iff its newest bucket is below the cutoff
            for d in sorted(points_dir.glob("seg_part=*")):
                if (int(d.name.split("=", 1)[1]) + 1) * part_span <= cutoff:
                    shutil.rmtree(d)
                    expired_parts += 1
        expired_blobs = 0
        if blobs_dir.exists():
            for f in blobs_dir.glob("shard=*/blob-*.parquet"):
                seg = int(f.stem.rsplit("-", 1)[1])
                if (seg + 1) * seg_span <= cutoff:
                    f.unlink()
                    expired_blobs += 1
        marker = {"tier": name, "horizon_s": int(horizon_s),
                  "cutoff": int(cutoff), "as_of": int(as_of)}
        mp = marker_path(out_dir, name)
        mp.parent.mkdir(parents=True, exist_ok=True)
        tmp = mp.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(marker))
        tmp.rename(mp)
        report[name] = dict(marker, expired_parts=expired_parts,
                            expired_blob_files=expired_blobs)
    return report


def reenforce_retention(out_dir: str | Path,
                        cfg: RollupConfig | None = None) -> dict[str, dict]:
    """Re-apply previously configured horizons at the CURRENT watermark:
    called after every incremental ingest (and safe to call after a full
    rebuild, which would otherwise resurrect expired partitions from the
    retained raw input). No markers -> no-op."""
    cfg = cfg or RollupConfig()
    horizons = {}
    for t in cfg.tiers:
        m = load_marker(out_dir, t.name)
        if m is not None:
            horizons[t.name] = int(m["horizon_s"])
    if not horizons:
        return {}
    return enforce_retention(out_dir, horizons, cfg=cfg)
