"""Token-stream archival: per-doc delta-of-delta compression of the raw
token arrays into binary blobs (north-rule input_hint invariant:
decompressed token arrays == input tokens, enforced PER ROW at write
time, not just sampled in tests).

Stage shape: stateless map_batches over zero-copy Arrow list columns.
Each doc's int32 token array goes through the dod-int codec; with
``verify=True`` (default) the kernel immediately decodes the blob and
asserts bitwise equality against the source array before the blob is
allowed downstream — a failed roundtrip fails the task (and the job),
so an archive that completes IS the proof of the invariant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..codecs.intcodec import (
    decode_ints_batch_packed,
    encode_ints_batch_packed,
)


def archive_tokens_batch(batch: pa.Table, tokens_col: str = "tokens",
                         verify: bool = True) -> pa.Table:
    toks = batch[tokens_col]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values.to_numpy(zero_copy_only=False).astype(np.int64)
    # lockstep vectorized encode of the whole batch, PACKED form: one
    # shared buffer + doc boundaries (byte-identical to encode_ints per
    # doc); the verify decode and the Arrow binary column reuse the same
    # buffer — no per-doc slicing, no re-join
    buf, dstart = encode_ints_batch_packed(
        flat[offs[0]:offs[-1]] if len(batch) else flat, offs - offs[0])
    raw_bytes = 4 * (int(offs[-1]) - int(offs[0])) if len(batch) else 0
    if verify and len(batch):
        # lockstep vectorized decode of the whole batch: flat values AND
        # per-doc boundaries must both match the source exactly
        dec_flat, dec_offs = decode_ints_batch_packed(buf, dstart)
        src = flat[offs[0]:offs[-1]]
        if (not np.array_equal(dec_offs, offs - offs[0])
                or not np.array_equal(dec_flat, src)):
            raise AssertionError("token-array roundtrip mismatch in batch")
    keep = [c for c in batch.column_names if c != tokens_col]
    out = batch.select(keep)
    n = len(batch)
    # zero-copy Arrow binary column straight off the packed buffer
    if int(dstart[-1]) >= 2**31:  # pa.binary() offsets are int32
        raise ValueError("archive batch exceeds 2 GiB of blobs; "
                         "lower batch_size")
    blob_arr = pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(dstart.astype(np.int32)), pa.py_buffer(buf)])
    out = out.append_column("tokens_blob", blob_arr)
    blob_bytes = int(dstart[-1])
    out = out.append_column("blob_bytes",
                            pa.array([blob_bytes] * n if n else [], type=pa.int64()))
    return out.append_column("raw_bytes",
                             pa.array([raw_bytes] * n if n else [], type=pa.int64()))


def _binary_packed(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(binary array) -> (packed uint8 buffer slice, (S+1,) boundaries)
    without a per-blob to_pylist: reads the Arrow offsets/data buffers
    directly (handles a sliced array via arr.offset)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # A null blob has a zero-length offsets slot the decoder would
    # happily decode into a wrong EMPTY doc — surface the corruption
    # instead of silently absorbing it (the validity buffer is otherwise
    # ignored below).
    if arr.null_count:
        raise ValueError(
            f"{arr.null_count} null blob row(s) in archive column; "
            "token blobs must be non-null")
    # offsets width depends on the Arrow type — reading large_binary's
    # int64 offsets as int32 would silently produce garbage boundaries
    if arr.type == pa.binary():
        odt = np.int32
    elif arr.type == pa.large_binary():
        odt = np.int64
    else:
        raise TypeError(f"expected (large_)binary blobs, got {arr.type}")
    nbuf, obuf, dbuf = arr.buffers()
    offs = np.frombuffer(obuf, dtype=odt)[
        arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(dbuf, dtype=np.uint8)[offs[0]:offs[-1]]
    return data, offs - offs[0]


def restore_tokens_batch(batch: pa.Table, blob_col: str = "tokens_blob") -> pa.Table:
    buf, base = _binary_packed(batch[blob_col])
    flat64, offs64 = decode_ints_batch_packed(buf, base)
    flat = flat64.astype(np.int32)
    offs = offs64.astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offs, type=pa.int32()),
                                      pa.array(flat, type=pa.int32()))
    keep = [c for c in batch.column_names
            if c not in (blob_col, "blob_bytes", "raw_bytes")]
    return batch.select(keep).append_column("tokens", tokens)


def archive_tokens(ds: "ray.data.Dataset", tokens_col: str = "tokens",
                   verify: bool = True, batch_size: int = 4096) -> "ray.data.Dataset":
    """tokens list column -> verified per-doc compressed blobs."""
    return ds.map_batches(archive_tokens_batch, batch_format="pyarrow",
                          batch_size=batch_size,
                          fn_kwargs={"tokens_col": tokens_col, "verify": verify})


def restore_tokens(ds: "ray.data.Dataset",
                   blob_col: str = "tokens_blob") -> "ray.data.Dataset":
    return ds.map_batches(restore_tokens_batch, batch_format="pyarrow",
                          fn_kwargs={"blob_col": blob_col})
