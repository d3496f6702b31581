"""Rollup job entry point — the script you hand to `ray job submit`:

    ray job submit -- python scripts/run_rollup_job.py \
        --input /data/tokens --out /data/rollups --features --archive

Resumable: re-submitting after a failure skips completed tiers via the
per-tier `_CHECKPOINT.json` lineage manifests. On a cluster, ray.init()
connects to the running cluster (RAY_ADDRESS); standalone it starts a
local session.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="token-table parquet dir")
    ap.add_argument("--out", required=True, help="output root for tiers")
    ap.add_argument("--features", action="store_true",
                    help="also run the per-doc token-stream feature stage")
    ap.add_argument("--archive", action="store_true",
                    help="also run the verified token-archive stage")
    ap.add_argument("--no-encode", action="store_true",
                    help="skip Gorilla/dod blob encoding")
    ap.add_argument("--incremental", action="store_true",
                    help="fold in only the parquet files added to --input "
                         "since the last completed run (continuous-aggregate "
                         "ingest; falls back to a full run when unsafe)")
    ap.add_argument("--retain", default=None, metavar="TIER=SECS,...",
                    help="retention horizons, e.g. raw=86400,1m=604800: "
                         "after the run, expire points partitions / blob "
                         "files wholly older than watermark-SECS (recorded "
                         "in _RETENTION.json and re-applied by every later "
                         "run at the advancing watermark)")
    ap.add_argument("--compact", action="store_true",
                    help="after the run, rewrite fragmented points "
                         "partitions into the minimal file count "
                         "(point set preserved bit-exactly; crash-safe "
                         "via the manifest-invalidate protocol)")
    ap.add_argument("--compact-target-mb", type=int, default=128,
                    help="compaction target file size in MiB")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)

    if args.incremental:
        from feasts_ray.pipelines.incremental import (
            run_rollup_incremental as run)
    else:
        from feasts_ray.pipelines.rollup_pipeline import run_rollup as run

    metrics = run(args.input, args.out, encode=not args.no_encode,
                  token_features=args.features,
                  token_archive=args.archive)
    if args.retain:
        from feasts_ray.pipelines.retention import enforce_retention

        horizons = {k: int(v) for k, v in
                    (kv.split("=", 1) for kv in args.retain.split(","))}
        metrics["retention"] = enforce_retention(args.out, horizons)
    if args.compact:
        from feasts_ray.pipelines.compaction import compact_all

        metrics["compaction"] = compact_all(
            args.out, target_bytes=args.compact_target_mb << 20)
    print(json.dumps(metrics, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
