"""Bucketize stage: derive event-time and tier bucket per doc.

Zero-copy Arrow map_batches kernel (SURVEY.md §2.3 floor_tsibble_date,
reference R/utils.R:122-174: numeric flooring (x // unit) * unit). The
event-time is a pure function of (doc index, source) — see timebase.py —
so no timestamp column needs to exist in the input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..timebase import SOURCE_INDEX, derive_ts_seconds, floor_bucket


def _doc_index(doc_id: pa.ChunkedArray | pa.Array) -> np.ndarray:
    # 'doc-%08d' -> int index; vectorized arrow slice + cast
    num = pc.utf8_slice_codeunits(doc_id, 4)
    return pc.cast(num, pa.int64()).to_numpy(zero_copy_only=False)


def _source_idx(source: pa.ChunkedArray | pa.Array) -> np.ndarray:
    # dictionary-encode then map the tiny dictionary through SOURCE_INDEX
    d = pc.dictionary_encode(source)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    dic = d.dictionary.to_pylist()
    lut = np.array([SOURCE_INDEX[s] for s in dic], dtype=np.int64)
    return lut[d.indices.to_numpy(zero_copy_only=False)]


def add_time_columns(batch: pa.Table) -> pa.Table:
    """Append ts_s (epoch seconds) derived deterministically per doc."""
    i = _doc_index(batch["doc_id"])
    sidx = _source_idx(batch["source"])
    ts = derive_ts_seconds(i, sidx)
    return batch.append_column("ts_s", pa.array(ts, type=pa.int64()))


def bucketize_batch(batch: pa.Table, unit_s: int, ts_col: str = "ts_s") -> pa.Table:
    b = floor_bucket(batch[ts_col].to_numpy(zero_copy_only=False), unit_s)
    return batch.append_column("bucket", pa.array(b, type=pa.int64()))
