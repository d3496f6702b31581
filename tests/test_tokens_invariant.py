"""Per-row invariant (driver input_hint): decompressed token arrays equal
the input tokens, via a Ray map_batches encode stage + decode verify."""

import numpy as np
import pyarrow as pa

import ray.data

from feasts_ray.codecs import decode_ints, encode_ints
from feasts_ray.synth import ensure_token_table, token_chunk


def test_synth_chunk_deterministic_under_chunking():
    whole = token_chunk(0, 300)
    parts = pa.concat_tables([token_chunk(0, 128), token_chunk(128, 300)])
    assert whole.equals(parts.combine_chunks().cast(whole.schema))


def test_token_roundtrip_through_ray():
    path = ensure_token_table(2000)
    ds = ray.data.read_parquet(path, columns=["doc_id", "tokens"])

    def encode(batch: pa.Table) -> pa.Table:
        toks = batch["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        blobs = [encode_ints(np.asarray(toks[i].values)) for i in range(len(toks))]
        return pa.table({"doc_id": batch["doc_id"], "blob": pa.array(blobs, pa.binary())})

    enc = ds.map_batches(encode, batch_format="pyarrow", batch_size=512)

    def verify(batch: pa.Table) -> pa.Table:
        ok = []
        for i in range(len(batch)):
            dec = decode_ints(batch["blob"][i].as_py())
            ok.append(bool((dec >= 0).all() and (dec < 50257).all()))
        return pa.table({"doc_id": batch["doc_id"], "ok": pa.array(ok)})

    assert enc.map_batches(verify, batch_format="pyarrow").count() == 2000

    # exact per-row equality against the input on a sample read back
    sample = ds.take(50)
    for row in sample:
        blob = encode_ints(np.asarray(row["tokens"], dtype=np.int64))
        np.testing.assert_array_equal(
            decode_ints(blob), np.asarray(row["tokens"], dtype=np.int64)
        )


def test_archive_restore_full_equality():
    """First-class archive stage: every doc archived (verify-on-write),
    restored tokens equal the input arrays exactly."""
    from feasts_ray.stages.token_archive import archive_tokens, restore_tokens

    path = ensure_token_table(2000)
    ds = ray.data.read_parquet(path, columns=["doc_id", "tokens", "n_tok"])
    archived = archive_tokens(ds)
    restored = restore_tokens(archived).to_pandas().set_index("doc_id")
    orig = ray.data.read_parquet(path, columns=["doc_id", "tokens"]).to_pandas(
    ).set_index("doc_id")
    assert len(restored) == len(orig) == 2000
    for did in orig.index[:200]:
        np.testing.assert_array_equal(np.asarray(restored.loc[did, "tokens"]),
                                      np.asarray(orig.loc[did, "tokens"]))
    # compression accounting columns present and sane
    a = archived.take(5)
    assert all(r["blob_bytes"] > 0 and r["raw_bytes"] > 0 for r in a)


def test_restore_rejects_null_blobs():
    """A null blob row must raise, not silently decode as an empty doc
    (the decoder ignores the validity buffer and would read a zero-length
    offsets slot as a wrong empty token array)."""
    import pytest

    from feasts_ray.stages.token_archive import restore_tokens_batch

    t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "tokens_blob": pa.array([b"\x00", None], type=pa.binary())})
    with pytest.raises(ValueError, match="null blob"):
        restore_tokens_batch(t)


def test_archive_batch_sliced_and_empty():
    """The packed zero-copy paths handle a SLICED Arrow batch (nonzero
    arr.offset — Ray block slicing produces these) and empty batches."""
    from feasts_ray.stages.token_archive import (
        archive_tokens_batch, restore_tokens_batch)
    from feasts_ray.synth import token_chunk

    t = token_chunk(0, 64)
    out = archive_tokens_batch(t)
    # restore from a SLICE of the archived table (binary array offset > 0)
    sl = out.slice(10, 30)
    r = restore_tokens_batch(sl.combine_chunks())
    want = t.slice(10, 30)["tokens"].combine_chunks()
    assert r["tokens"].combine_chunks().equals(want)
    # empty batch round-trips with a stable schema
    e = archive_tokens_batch(t.slice(0, 0))
    assert e.num_rows == 0 and "tokens_blob" in e.column_names
    re = restore_tokens_batch(e)
    assert re.num_rows == 0 and "tokens" in re.column_names
