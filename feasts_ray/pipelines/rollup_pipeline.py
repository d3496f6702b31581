"""Flagship pipeline: token table -> cascading retention tiers -> blobs.

Dataflow (SURVEY.md §7.1, north rule), ONE shuffle per tier:

  read_parquet(doc_id, n_tok, source)            # tokens column pruned
    -> MB derive ts (pure fn of doc_id, source)  # zero-copy Arrow
    -> MB partial rollup per (source, bucket)    # map-side combine
    -> [materialize partials: small, enables span reduce + reuse]
    -> driver reduce of per-batch span partials -> per-source [lo, hi]
    -> groupby(source, segment).map_groups fused TierSegmentKernel:
         merge partials + LOCAL gap-fill + mean + time sort + Gorilla
         encode (blobs written to partition-addressed files in-kernel)
    -> write points parquet; _CHECKPOINT.json per tier (lineage+metrics)
  cascade: tier[k+1] re-aggregates tier[k]'s points (never re-reads raw)

Why fused (vs the modular gap_fill/encode_tier stages kept for the query
paths): Ray's groupby costs ~0.3 ms/group in Python, so grouping by
(source, bucket) is quadratic-feeling at scale; grouping by (source,
segment) bounds group size at SEGMENT_POINTS (also the anti-skew salt)
and cuts group count 4096x. See stages/tier_kernel.py.
"""

from __future__ import annotations

import shutil
import time
from pathlib import Path

import pyarrow.dataset as pads

import ray.data

from ..config import RollupConfig, TIERS
from ..stages.bucketize import add_time_columns
from ..stages.rollup import cascade_batch, partial_rollup_batch
from ..stages.tier_kernel import run_tier, spans_from_partials
from ..state import checkpoint as ckpt


def _input_bytes(input_path: str) -> int:
    import os

    try:
        return sum(os.path.getsize(os.path.join(input_path, f))
                   for f in os.listdir(input_path) if f.endswith(".parquet"))
    except (OSError, NotADirectoryError):
        return 0


def _input_rows(input_path) -> int:
    """Row count from parquet footers only — no data scan."""
    try:
        return pads.dataset(input_path).count_rows()
    except Exception:
        return -1


def _file_inventory(input_path: str) -> list[list]:
    """Sorted [name, size] of the input's parquet files. Part of the
    lineage hash, so appending files invalidates stale checkpoints (a
    resumed run recomputes instead of silently skipping); the incremental
    path diffs inventories to find the files added since the last run."""
    import os

    try:
        return sorted(
            [f, os.path.getsize(os.path.join(input_path, f))]
            for f in os.listdir(input_path) if f.endswith(".parquet"))
    except (OSError, NotADirectoryError):
        return [[input_path, -1]]


def _cfg_dict(cfg: RollupConfig, encode: bool) -> dict:
    return {
        "tiers": [t.name for t in cfg.tiers],
        "value_col": cfg.value_col,
        "gap_fill": cfg.gap_fill,
        "segment_points": cfg.segment_points,
        "encode": encode,
        # points layout is part of lineage: outputs written under a
        # different partition span must not be selectively merged into
        "points_partition_segs": cfg.points_partition_segs,
    }


def _points_part_span(cfg: RollupConfig, unit_s: int) -> int:
    """Seconds per points partition dir (seg_part = bucket // this);
    floor-div composition makes it equal (bucket // seg_span) //
    points_partition_segs, i.e. whole segments never straddle parts."""
    return cfg.segment_points * unit_s * cfg.points_partition_segs


def _add_seg_part(batch, part_span: int):
    """Append the hive partition column for the points write."""
    import pyarrow as pa

    seg_part = batch["bucket"].to_numpy(zero_copy_only=False) // part_span
    return batch.append_column("seg_part", pa.array(seg_part, type=pa.int64()))


def write_tier_points(points: "ray.data.Dataset", points_dir,
                      cfg: RollupConfig, unit_s: int) -> None:
    """Tier points sink: hive-partitioned by time range so the selective
    incremental merge can leave untouched partition dirs in place
    (pyarrow drops the partition column from the file contents, so plain
    readers see the original schema)."""
    span = _points_part_span(cfg, unit_s)
    points.map_batches(
        _add_seg_part, batch_format="pyarrow", fn_kwargs={"part_span": span}
    ).write_parquet(str(points_dir), partition_cols=["seg_part"])


def _range_part_dirs(points_dir: Path, lo: int, hi: int, span: int) -> list[str]:
    """seg_part dirs intersecting [lo, hi) — the partition-prune set."""
    p_lo, p_hi = lo // span, (hi - 1) // span
    return [str(d) for d in sorted(points_dir.glob("seg_part=*"))
            if p_lo <= int(d.name.split("=", 1)[1]) <= p_hi]


def read_points_range(
    out_dir: str,
    tier_name: str,
    lo: int,
    hi: int,
    cfg: RollupConfig | None = None,
    columns: list[str] | None = None,
) -> "ray.data.Dataset":
    """Rolled points of one tier with ``lo <= bucket < hi``.

    Every tier's points are time-partitioned, so range scans are cheap
    at both ends: whole seg_part dirs outside the range are pruned
    before any file is opened, and the residual predicate pushes into
    parquet row-group statistics. A dashboard query for one day over a
    10^12-sequence archive therefore opens O(day) partitions, not the
    whole tier.
    """
    import pyarrow.dataset as pads

    cfg = cfg or RollupConfig()
    points_dir, _ = _tier_dirs(out_dir, tier_name)
    if columns is None:
        # pin to the FILE schema: Ray's hive inference would otherwise
        # append path-derived columns (tier=..., seg_part=...) on reads
        # without an explicit projection
        columns = list(pads.dataset(str(points_dir)).schema.names)
    tier = next(t for t in cfg.tiers if t.name == tier_name)
    pruned = _range_part_dirs(points_dir, lo, hi,
                              _points_part_span(cfg, tier.unit_s))
    if not pruned:
        import pyarrow as pa

        schema = pads.dataset(str(points_dir)).schema
        empty = pa.table({f.name: pa.array([], type=f.type) for f in schema})
        return ray.data.from_arrow(empty.select(columns))
    # expand to files: Ray 2.49 read_parquet rejects a LIST of
    # directories (single dir paths are expanded, lists are not)
    paths = [str(f) for d in pruned
             for f in sorted(Path(d).glob("*.parquet"))]
    import pyarrow.compute as pc

    expr = (pc.field("bucket") >= lo) & (pc.field("bucket") < hi)
    return ray.data.read_parquet(paths, columns=columns, filter=expr)


def _cluster_cpus() -> int:
    return (int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized() else 8)


def read_token_table(input_path: str, columns=("doc_id", "n_tok", "source")) -> "ray.data.Dataset":
    """Read the token table with blocks sized for the downstream shuffle.

    Ray's default read task count (~200) is fine for a pure map pipeline
    but poisons the raw tier's groupby: the sort all-to-all creates
    O(map_blocks x reduce_partitions) block slices, so 200 input blocks
    cost ~40k slice objects of pure scheduling overhead. Coalescing to
    max(cpus, file_bytes/128MB) blocks cut the 24M-doc raw tier from
    35.5 s to 15.6 s at 16 CPUs (sort wall 32 s -> ~6 s); the same
    sizing rule the cascade tiers already use on their re-reads.
    """
    nblk = max(_cluster_cpus(), _input_bytes(input_path) // (128 << 20))
    return ray.data.read_parquet(input_path, columns=list(columns),
                                 override_num_blocks=nblk)


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


def run_token_features(input_path: str, out_dir: str, lineage: str) -> dict:
    """Per-doc token-stream feature stage (north star: each doc's token
    stream is a regular time series -> ACF / trend / season-strength
    features). Zero shuffle; compute scales with total tokens."""
    from ..stages.token_features import token_feature_table

    feat_dir = Path(out_dir) / "features"
    if ckpt.is_complete(feat_dir, lineage):
        return ckpt.load_manifest(feat_dir)
    points_dir = feat_dir / "points"
    if points_dir.exists():
        shutil.rmtree(points_dir)
    t0 = time.perf_counter()
    ds = ray.data.read_parquet(input_path, columns=["doc_id", "tokens", "source"])
    feats = token_feature_table(ds)
    feats.write_parquet(str(points_dir))
    rows = pads.dataset(str(points_dir)).count_rows()
    m = {"tier": "features", "lineage": lineage,
         "rows_in": _input_rows(input_path), "rows_out": rows,
         "points": rows, "wall_s": time.perf_counter() - t0,
         "input": input_path}
    ckpt.save_manifest(feat_dir, m)
    return ckpt.load_manifest(feat_dir)


def run_token_archive(input_path: str, out_dir: str, lineage: str) -> dict:
    """Verified per-doc token-array compression (north-rule invariant:
    a completed archive proves decode(encode(tokens)) == tokens for every
    row — verify-on-write inside the kernel)."""
    from ..stages.token_archive import archive_tokens

    arch_dir = Path(out_dir) / "tokens_archive"
    if ckpt.is_complete(arch_dir, lineage):
        return ckpt.load_manifest(arch_dir)
    blobs_dir = arch_dir / "blobs"
    if blobs_dir.exists():
        shutil.rmtree(blobs_dir)
    t0 = time.perf_counter()
    ds = ray.data.read_parquet(input_path, columns=["doc_id", "tokens",
                                                    "n_tok", "source"])
    archive_tokens(ds).write_parquet(str(blobs_dir))
    rows = pads.dataset(str(blobs_dir)).count_rows()
    m = {"tier": "tokens_archive", "lineage": lineage,
         "rows_in": _input_rows(input_path), "rows_out": rows,
         "points": rows, "bytes_blobs": ckpt.dir_bytes(blobs_dir),
         "wall_s": time.perf_counter() - t0, "input": input_path}
    ckpt.save_manifest(arch_dir, m)
    return ckpt.load_manifest(arch_dir)


def run_token_features_and_archive(input_path: str, out_dir: str,
                                   lineage: str) -> dict[str, dict]:
    """Fused single-scan variant of run_token_features + run_token_archive:
    both stages are per-doc and need the large tokens column, so a fresh
    run reads the corpus ONCE and computes both (see stages/doc_fused.py).
    If either stage is already checkpointed, only the other runs (via its
    standalone runner) — resume semantics are unchanged."""
    from ..stages.doc_fused import fused_doc_batch

    feat_dir = Path(out_dir) / "features"
    arch_dir = Path(out_dir) / "tokens_archive"
    feat_done = ckpt.is_complete(feat_dir, lineage)
    arch_done = ckpt.is_complete(arch_dir, lineage)
    if feat_done or arch_done:
        return {
            "features": (ckpt.load_manifest(feat_dir) if feat_done
                         else run_token_features(input_path, out_dir, lineage)),
            "tokens_archive": (ckpt.load_manifest(arch_dir) if arch_done
                               else run_token_archive(input_path, out_dir,
                                                      lineage)),
        }
    points_dir = feat_dir / "points"
    blobs_dir = arch_dir / "blobs"
    for d in (points_dir, blobs_dir):
        if d.exists():
            shutil.rmtree(d)
    t0 = time.perf_counter()
    ds = ray.data.read_parquet(input_path, columns=["doc_id", "tokens",
                                                    "n_tok", "source"])
    # batch_size: BEFORE the kernels tiled internally, big batches
    # thrashed the shared L3 (16384 measured 0.6x at 32-way) and the
    # interleaved sweep picked 2048. With the feature kernel in 512 KB
    # row tiles and the dod encoder in 256-doc tiles, the cache penalty
    # is gone and bigger batches amortize per-batch costs + widen the
    # lockstep verify-decoder's vectors: 3-round alternating 32-way
    # sweep on 12M docs: 2048 32.0/33.5/33.9 s, 4096 28.8/30.4/31.7 s,
    # 8192 25.7/31.7/26.7 s (fastest or tied every round); 16384 was
    # no better than 8192 in the wider sweep.
    ds.map_batches(
        fused_doc_batch, batch_format="pyarrow", batch_size=8192,
        fn_kwargs={"features_dir": str(points_dir)},
    ).write_parquet(str(blobs_dir))
    wall = time.perf_counter() - t0
    feat_rows = pads.dataset(str(points_dir)).count_rows()
    arch_rows = pads.dataset(str(blobs_dir)).count_rows()
    rows_in = _input_rows(input_path)
    m_feat = {"tier": "features", "lineage": lineage, "rows_in": rows_in,
              "rows_out": feat_rows,
              "points": feat_rows, "wall_s": wall, "fused_scan": True,
              "input": input_path}
    m_arch = {"tier": "tokens_archive", "lineage": lineage,
              "rows_in": rows_in,
              "rows_out": arch_rows, "points": arch_rows,
              "bytes_blobs": ckpt.dir_bytes(blobs_dir), "wall_s": wall,
              "fused_scan": True, "input": input_path}
    ckpt.save_manifest(feat_dir, m_feat)
    ckpt.save_manifest(arch_dir, m_arch)
    return {"features": ckpt.load_manifest(feat_dir),
            "tokens_archive": ckpt.load_manifest(arch_dir)}


def run_rollup(
    input_path: str,
    out_dir: str,
    cfg: RollupConfig | None = None,
    encode: bool = True,
    token_features: bool = False,
    token_archive: bool = False,
) -> dict[str, dict]:
    """Run (or resume) the full tier cascade. Returns per-tier metrics."""
    cfg = cfg or RollupConfig()
    cfg_dict = _cfg_dict(cfg, encode)
    inventory = _file_inventory(input_path)
    lineage = ckpt.lineage_hash(input_path, cfg_dict, inventory=inventory)
    metrics: dict[str, dict] = {}
    prev_points: Path | None = None
    spans: dict | None = None

    for k, tier in enumerate(cfg.tiers):
        points_dir, blobs_dir = _tier_dirs(out_dir, tier.name)
        if ckpt.is_complete(points_dir.parent, lineage):
            m = ckpt.load_manifest(points_dir.parent)
            metrics[tier.name] = m
            if spans is None:
                # run-level parquet sidecar (written once per run) — NOT
                # inlined into each manifest: at 10^7 sources the inline
                # JSON dict made every manifest a huge driver-side parse
                spans = ckpt.load_spans(out_dir, lineage)
            prev_points = points_dir
            continue
        # stale partial output from a crashed attempt: clear before rerun
        for d in (points_dir, blobs_dir):
            if d.exists():
                shutil.rmtree(d)
        t0 = time.perf_counter()
        if k == 0:
            ds = read_token_table(
                input_path,
                columns=("doc_id", *cfg.value_cols, cfg.series_key))
            ds = ds.map_batches(add_time_columns, batch_format="pyarrow")
            ds = ds.map_batches(
                partial_rollup_batch,
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
                fn_kwargs={"unit_s": tier.unit_s, "value_col": cfg.value_col,
                           "key_col": cfg.series_key},
            )
            # Coalesce the partials before the sort: read blocks scale
            # with INPUT bytes (good for read/agg parallelism) but the
            # sort's block-slice count is O(blocks^2) pure scheduling —
            # at 192M docs (224 read blocks) that term alone was ~100 s
            # of the raw tier's wall at 16 CPUs. The partials are ~3x
            # smaller than the token table, so re-blocking them to
            # ~128 MB (floor 2/CPU) costs one cheap split-concat pass
            # and shrinks the sort matrix ~25x. Kernel output is
            # order-independent (integer-sum merges), so points are
            # bit-identical (pinned by the oracle suite).
            cpus = _cluster_cpus()
            tbytes = _input_bytes(input_path)
            read_nblk = max(cpus, tbytes // (128 << 20))
            sort_nblk = max(2 * cpus, tbytes // (384 << 20))
            if sort_nblk < read_nblk:
                ds = ds.repartition(sort_nblk)
        else:
            assert prev_points is not None
            # Size read blocks to ~128 MB (floor: one per CPU): the finer
            # tier wrote one small file per kernel task, and inheriting
            # 100+ KB-sized blocks makes the next shuffle pure scheduling
            # overhead (measured: 1m tier sort 17.7 s for 11 MB of rows).
            import ray as _ray

            cpus = (int(_ray.cluster_resources().get("CPU", 8))
                    if _ray.is_initialized() else 8)
            prev_bytes = ckpt.dir_bytes(prev_points)
            # tiny-tier fast path: when the prior tier's points fit well
            # under one block, the groupby all-to-all is pure fixed
            # latency — run_tier(single_block=True) applies the same
            # kernel inside ONE coalesced block instead (zero shuffle)
            single = prev_bytes < (32 << 20)
            nblk = 1 if single else max(cpus, prev_bytes // (128 << 20))
            ds = ray.data.read_parquet(
                str(prev_points),
                columns=[cfg.series_key, "bucket", "count", *cfg.partial_cols],
                override_num_blocks=nblk,
            ).map_batches(
                cascade_batch, batch_format="pyarrow",
                fn_kwargs={"unit_s": tier.unit_s, "measures": cfg.measures}
            )
        # Spans (per-key bucket domain) are only needed for gap-filled
        # tiers. The raw tier is not gap-filled, so it streams straight
        # through (read -> combine -> shuffle -> kernel -> write in ONE
        # pipeline, no input-sized materialization); spans are then
        # derived from its small points parquet. Materialize partials
        # only when the FIRST tier itself needs gap-fill.
        tier_gap_fill = cfg.gap_fill and tier.gap_fill
        if spans is None and tier_gap_fill:
            partials = ds.materialize()
            spans = spans_from_partials(partials, key_col=cfg.series_key)
            ckpt.save_spans(out_dir, spans, lineage)
        else:
            partials = ds
        points = run_tier(
            partials, tier.name, tier.unit_s, cfg.segment_points,
            spans or {}, gap_fill=tier_gap_fill,
            blobs_dir=str(blobs_dir) if encode else None,
            key_col=cfg.series_key,
            single_block=(k > 0 and single),
            measures=cfg.measures,
        )
        # The next tier re-reads this tier's parquet. Measured:
        # materializing points for in-memory reuse UN-fuses the write
        # from the tier kernel (extra barrier + second pass), ~5 s/tier
        # at 12M docs, while the parquet read-back of a post-raw tier is
        # ~1 s — streaming write + re-read wins (and is the resume path
        # anyway). Every tier is time-partitioned (seg_part dirs) so the
        # selective ingest rewrites O(touched) partitions at every tier
        # and range reads prune whole dirs.
        write_tier_points(points, points_dir, cfg, tier.unit_s)
        if spans is None:
            # first (non-gap-filled) tier just wrote: derive spans from
            # its points parquet — a 2-column scan of the rolled output,
            # tiny next to the input the old materialize() path held
            spans = spans_from_partials(
                ray.data.read_parquet(str(points_dir),
                                      columns=[cfg.series_key, "bucket"]),
                key_col=cfg.series_key)
            ckpt.save_spans(out_dir, spans, lineage)
        rows, watermark = _points_stats(points_dir)
        blob_bytes = ckpt.dir_bytes(blobs_dir) if encode else 0
        wall = time.perf_counter() - t0
        m = {
            "tier": tier.name,
            "lineage": lineage,
            "rows_in": _input_rows(input_path if k == 0 else str(prev_points)),
            "rows_out": rows,
            "points": rows,
            "bytes_blobs": blob_bytes,
            "watermark": watermark,
            "wall_s": wall,
            "input": input_path if k == 0 else str(prev_points),
            "n_sources": len(spans),
        }
        ckpt.save_manifest(points_dir.parent, m)
        metrics[tier.name] = ckpt.load_manifest(points_dir.parent)
        prev_points = points_dir
    if token_features and token_archive:
        # both per-doc stages need the tokens column: one fused scan
        metrics.update(
            run_token_features_and_archive(input_path, out_dir, lineage))
    elif token_features:
        metrics["features"] = run_token_features(input_path, out_dir, lineage)
    elif token_archive:
        metrics["tokens_archive"] = run_token_archive(input_path, out_dir, lineage)
    # record the processed file set so a later run_rollup_incremental can
    # diff inventories and fold in only the files added since this run
    from .incremental import save_ingest_state

    save_ingest_state(out_dir, inventory, lineage)
    # retention follows the watermark: horizons recorded by a prior
    # enforce_retention re-apply at the NEW watermark, so neither a full
    # rebuild nor an ingest resurrects expired partitions. Runs after the
    # cascade so every coarser tier derives from the full finer tier
    # before that tier is pruned by its own (shorter) horizon.
    from .retention import reenforce_retention

    for name, r in reenforce_retention(out_dir, cfg).items():
        if name in metrics:
            metrics[name] = dict(metrics[name], retention=r)
    return metrics
