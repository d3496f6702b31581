"""Exact deduplication: content hash -> hash-partitioned survivor pick.

Scale shape: the shuffle key is the 128-bit content digest (fixed-width
string), never the document body — at 100 TB only ~48 bytes/doc move
through the exchange, and the per-batch digest map is embarrassingly
parallel. Survivor = min(doc_id) per digest group (deterministic).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Min


def add_content_hash(batch: pa.Table, text_col: str = "text",
                     out_col: str = "text_md5") -> pa.Table:
    """MD5 hex digest per row (hashing is inherently per-row; the loop body
    is C). For UTF-8 text the digest matches SQL ``md5(text)``.

    The digest reads each row's bytes straight off the Arrow string
    values buffer (memoryview slices) — Arrow strings ARE UTF-8, so no
    Python str materialization or re-encode happens per row."""
    import numpy as np

    arr = batch[text_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.fill_null("")
    bufs = arr.buffers()
    off_width = 8 if pa.types.is_large_string(arr.type) else 4
    offs = np.frombuffer(bufs[1], dtype=np.int64 if off_width == 8 else np.int32,
                         count=arr.offset + len(arr) + 1)[arr.offset:]
    mv = memoryview(bufs[2])
    digests = [hashlib.md5(mv[offs[i]:offs[i + 1]]).hexdigest()
               for i in range(len(arr))]
    return batch.append_column(out_col, pa.array(digests, type=pa.string()))


def exact_groups(ds: "ray.data.Dataset", text_col: str = "text",
                 id_col: str = "doc_id") -> "ray.data.Dataset":
    """One row per distinct content: (text_md5, survivor_id, n_copies)."""
    hashed = ds.map_batches(
        add_content_hash, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
    ).select_columns(["text_md5", id_col])
    return hashed.groupby("text_md5").aggregate(
        Min(id_col, alias_name="survivor_id"),
        Count(alias_name="n_copies"),
    )


def dedup_exact(ds: "ray.data.Dataset", text_col: str = "text",
                id_col: str = "doc_id",
                num_partitions: int | None = None) -> "ray.data.Dataset":
    """Keep one row per distinct content (the min-id survivor).

    Fully distributed — no driver-side survivor set: rows are re-hashed
    and semi-joined on the digest against the (digest, survivor_id)
    aggregate (Ray Data hash join), then filtered to id == survivor_id.
    Only fixed-width digest/id columns cross the survivor shuffle; the
    document bodies move once, co-partitioned by digest in the join.
    At cluster scale, size ``num_partitions`` to the aggregate survivor
    cardinality (~#distinct docs x 48 B / target block size). The default
    is half the cluster's CPUs — the join operator holds one aggregator
    actor per partition, so a partition count above the CPU count
    deadlocks the streaming executor.
    """
    import ray as _ray

    if num_partitions is None:
        cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
        num_partitions = max(2, cpus // 2)
    hashed = ds.map_batches(
        add_content_hash, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
    )
    survivors = hashed.select_columns(["text_md5", id_col]).groupby(
        "text_md5").aggregate(Min(id_col, alias_name="survivor_id"))
    joined = hashed.join(survivors, "inner", num_partitions, on=("text_md5",))

    def _filter(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        surv = batch["survivor_id"].to_numpy(zero_copy_only=False)
        keep = batch.filter(pa.array(ids == surv))
        return keep.drop_columns(["text_md5", "survivor_id"])

    return joined.map_batches(_filter, batch_format="pyarrow")
