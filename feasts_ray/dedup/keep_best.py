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


def dedup_keep_best(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_partitions: int | None = None,
    **kwargs,
) -> "ray.data.Dataset":
    """(cluster_id, keep_id, keep_quality, n_members) per near-dup
    cluster at the given exact-Jaccard threshold.

    ``num_partitions`` sizes the doc_id hash join (default cpus/2, the
    same deadlock-safe bound dedup_exact uses: one aggregator actor per
    partition must fit the CPU count).
    """
    import ray as _ray

    if num_partitions is None:
        cpus = (int(_ray.cluster_resources().get("CPU", 8))
                if _ray.is_initialized() else 8)
        num_partitions = max(2, cpus // 2)
    assign = minhash_dedup_docs(ds, text_col=text_col, id_col=id_col,
                                threshold=threshold, **kwargs)
    quality = ds.map_batches(
        add_quality, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
    ).select_columns([id_col, "quality_score"])
    joined = assign.join(quality, "inner", num_partitions, on=(id_col,))
    return joined.groupby("cluster_id").map_groups(
        partial(_pick_best, id_col=id_col), batch_format="pyarrow")
