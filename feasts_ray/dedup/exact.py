"""Exact deduplication: content hash -> hash-partitioned survivor pick.

Scale shape: the shuffle key is the 128-bit content digest (fixed-width
string), never the document body — at 100 TB only ~48 bytes/doc move
through the exchange, and the per-batch digest map is embarrassingly
parallel. Survivor = min(doc_id) per digest group (deterministic).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Min


def add_content_hash(batch: pa.Table, text_col: str = "text",
                     out_col: str = "text_md5") -> pa.Table:
    """MD5 hex digest per row (hashing is inherently per-row; the loop body
    is C). For UTF-8 text the digest matches SQL ``md5(text)``."""
    texts = batch[text_col].to_pylist()
    digests = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
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
                id_col: str = "doc_id") -> "ray.data.Dataset":
    """Keep one row per distinct content (the min-id survivor).

    Broadcast-free: the survivor set is joined back by re-hashing — rows
    stream through a filter against the survivor ids shipped via ray.put
    when small, else a semi-join on digest. Here: digest groupby keeps
    first occurrence via min(id), then an inner filter pass.
    """
    groups = exact_groups(ds, text_col=text_col, id_col=id_col)
    keep = set(groups.select_columns(["survivor_id"]).to_pandas()["survivor_id"])
    import ray as _ray

    keep_ref = _ray.put(np.array(sorted(keep)))

    def _filter(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        arr = _ray.get(keep_ref) if isinstance(keep_ref, _ray.ObjectRef) else keep_ref
        pos = np.searchsorted(arr, ids)
        pos = np.clip(pos, 0, len(arr) - 1)
        mask = arr[pos] == ids
        return batch.filter(pa.array(mask))

    return ds.map_batches(_filter, batch_format="pyarrow")
