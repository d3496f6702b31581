"""Property-based tests (hypothesis) for the batched text-hashing
kernels: the Arrow tokenizer must equal str.split() tokenization for
ARBITRARY unicode text (incl. exotic whitespace), and the flat batched
shingle / fingerprint folds must be bit-identical to their per-doc
scalar definitions for arbitrary doc mixes."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from feasts_ray.dedup.hashing import (
    shingle_hashes,
    shingle_hashes_batch,
    tokenize_batch,
    tokenize_arrow,
)

# arbitrary printable + whitespace-heavy unicode text (no surrogates —
# Arrow strings are UTF-8)
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),
    min_size=0, max_size=40)
_texts = st.lists(_text, min_size=0, max_size=12)


def test_tokenize_trailing_multibyte_whitespace_buffer_tail():
    """Regression: pyarrow 16.1's utf8_split_whitespace mis-decodes a
    multi-byte whitespace codepoint at the very END of the values
    buffer (reads past the buffer; outcome depends on allocator
    padding, so the same input flipped nondeterministically across
    process states — found by the property test below under a full
    suite run). split_whitespace_safe pins the buffer tail with an
    ASCII space; this input must now tokenize identically always."""
    texts = ['00\x80\U00010000', '00\x80\x80\x80\U00010000',
             '000\x80\x80\x80\x80ࠀ\U00010000\U00010000',
             '000\x80\x80\x80ࠀ\U00010000\U00010000\xa0']
    for _ in range(50):  # repeated fresh allocations of the same input
        w1, o1, c1 = tokenize_batch(texts)
        w2, o2, c2 = tokenize_arrow(pa.array(texts, type=pa.string()))
        np.testing.assert_array_equal(w1, w2)
        np.testing.assert_array_equal(o1, o2)
        np.testing.assert_array_equal(c1, c2)


@settings(max_examples=60, deadline=None)
@given(_texts)
def test_tokenize_arrow_equals_str_split(texts):
    w1, o1, c1 = tokenize_batch(texts)
    w2, o2, c2 = tokenize_arrow(pa.array(texts, type=pa.string()))
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(c1, c2)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(st.integers(0, 30), min_size=0, max_size=15),
                min_size=0, max_size=10),
       st.integers(2, 6))
def test_shingle_batch_equals_scalar(word_ids, k):
    # word-id lists -> synthetic word-hash streams (values arbitrary;
    # only the fold arithmetic is under test)
    arrs = [np.array(w, dtype=np.uint64) * np.uint64(0x9E37)
            for w in word_ids]
    flat = (np.concatenate(arrs) if arrs
            else np.array([], dtype=np.uint64))
    offs = np.concatenate(
        [[0], np.cumsum([len(a) for a in arrs])]).astype(np.int64)
    got, gofs = shingle_hashes_batch(flat, offs, k)
    assert gofs[-1] == len(got)
    for i, a in enumerate(arrs):
        np.testing.assert_array_equal(
            got[gofs[i]:gofs[i + 1]], shingle_hashes(a, k))


@settings(max_examples=40, deadline=None)
@given(_texts)
def test_fingerprint_equals_scalar_fold(texts):
    from feasts_ray.text.analysis import add_fingerprint

    batch = pa.table({"doc_id": pa.array(range(len(texts))),
                      "text": pa.array(texts, type=pa.string())})
    got = add_fingerprint(batch)["fingerprint"].to_numpy()
    whash, offsets, _ = tokenize_batch(texts)
    MASK = (1 << 64) - 1
    for i in range(len(texts)):
        acc = 0xCBF29CE484222325
        for h in whash[offsets[i]:offsets[i + 1]].tolist():
            acc = ((acc * 0x100000001B3) & MASK) ^ h
        assert got[i] == np.uint64(acc).astype(np.int64)
