"""Quality-canonical dedup: one representative per near-duplicate
cluster, chosen by quality score (the LLM-corpus curation policy of
"keep the best copy", not "keep an arbitrary copy").

Composition of existing verified stages: MinHash+LSH candidate pairs
with exact-Jaccard verify (dedup/minhash.py) -> distributed connected
components (dedup/cluster.py, min-label propagation + pointer jumping)
-> per-doc quality heuristics (text/analysis.add_quality) -> hash join
on doc_id -> per-cluster argmax with a deterministic tie-break
(highest quality_score, then lowest doc_id — near-dup clusters often
contain byte-identical texts whose scores tie exactly).

Scale shape: after the pair/clustering stages, everything that moves is
fixed-width scalars — (doc_id, cluster_id, quality_score) rows,
~40 B/doc through one hash join keyed on doc_id and one bounded-group
shuffle keyed on cluster_id (group size = near-dup cluster size).
Document text is scanned once for quality and never re-enters an
exchange. Output is one row per cluster: singleton docs appear as their
own cluster, so `n_members == 1` filters to the unduplicated corpus and
`keep_id` enumerates exactly the retained documents.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

import ray.data

from ..text.analysis import add_quality
from .cluster import minhash_dedup_docs


def _pick_best(group: pa.Table, id_col: str) -> pa.Table:
    """One output row per cluster: argmax quality, min-id tie-break."""
    q = group["quality_score"].to_numpy(zero_copy_only=False)
    mx = q.max()
    ids = group[id_col].to_numpy(zero_copy_only=False)
    keep = ids[q == mx].min()  # lexicographic == SQL ORDER BY doc_id ASC
    return pa.table({
        "cluster_id": group["cluster_id"].slice(0, 1),
        "keep_id": pa.array([keep], type=group.schema.field(id_col).type),
        "keep_quality": pa.array([float(mx)], type=pa.float64()),
        "n_members": pa.array([len(group)], type=pa.int64()),
    })


def _attach_quality(batch: pa.Table, *, lut_ref, id_col: str) -> pa.Table:
    """Broadcast-join kernel: quality lookup by sorted-id searchsorted."""
    from ..state.broadcast import resolve_broadcast

    ids_sorted, scores = resolve_broadcast(lut_ref)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    pos = np.searchsorted(ids_sorted, ids)
    if np.any(ids_sorted[np.minimum(pos, len(ids_sorted) - 1)] != ids):
        raise KeyError("doc id missing from broadcast quality table")
    return batch.append_column(
        "quality_score", pa.array(scores[pos], type=pa.float64()))


def dedup_keep_best(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_partitions: int | None = None,
    broadcast_budget: int = 256 << 20,
    assignments: "ray.data.Dataset | None" = None,
    **kwargs,
) -> "ray.data.Dataset":
    """(cluster_id, keep_id, keep_quality, n_members) per near-dup
    cluster at the given exact-Jaccard threshold.

    ``assignments`` short-circuits the clustering: pass a precomputed
    (id_col, cluster_id) Dataset — e.g. one persisted/reloaded via
    cluster.persist_assignments/load_assignments — and only the quality
    scan + join + per-cluster argmax run. At corpus scale the clustering
    is the expensive half and is computed once, then consumed by many
    dedup policies; the precomputed path is pinned bit-identical to the
    fused path in tests/test_keep_best.py.

    The quality⋈assignment join is adaptive (the same explicit-budget
    pattern as dedup/minhash.py): the per-doc quality table is
    materialized once and, while its MEASURED arrow bytes (x5 for the
    driver-side pandas/lut/put copies) fit ``broadcast_budget``, it is
    ray.put ONCE as a sorted-id lookup and attached inside map_batches
    with zero shuffle; past the budget the distributed hash join runs,
    ``num_partitions`` sized like dedup_exact (default cpus/2 — one
    aggregator actor per partition must fit the CPU count).
    """
    import ray as _ray

    from ..state.broadcast import put_once

    assign = assignments if assignments is not None else minhash_dedup_docs(
        ds, text_col=text_col, id_col=id_col, threshold=threshold, **kwargs)
    quality = ds.map_batches(
        add_quality, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
    ).select_columns([id_col, "quality_score"]).materialize()
    # plan by MEASURED arrow bytes of the materialized quality table
    # (never an extra lineage execution — both paths reuse the
    # materialization); x5 covers the pandas object-string + sorted-lut
    # + ray.put copies the broadcast path holds on the driver at once
    if quality.size_bytes() * 5 <= broadcast_budget:
        qdf = quality.to_pandas()
        order = np.argsort(qdf[id_col].to_numpy(), kind="mergesort")
        lut = (qdf[id_col].to_numpy()[order],
               qdf["quality_score"].to_numpy(dtype=np.float64)[order])
        joined = assign.map_batches(
            _attach_quality, batch_format="pyarrow",
            fn_kwargs={"lut_ref": put_once(lut), "id_col": id_col})
    else:
        if num_partitions is None:
            cpus = (int(_ray.cluster_resources().get("CPU", 8))
                    if _ray.is_initialized() else 8)
            num_partitions = max(2, cpus // 2)
        joined = assign.join(quality, "inner", num_partitions, on=(id_col,))
    return joined.groupby("cluster_id").map_groups(
        partial(_pick_best, id_col=id_col), batch_format="pyarrow")
