"""Exact round-trip properties of the Gorilla / delta-of-delta codecs
(FIXTURES.md F4: repeats, -0.0, regular + jittered ids, NaN payloads)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from feasts_ray.codecs import (
    decode_floats,
    decode_ints,
    decode_nullable_floats,
    encode_floats,
    encode_ints,
    encode_nullable_floats,
)


def _roundtrip_ints(v):
    out = decode_ints(encode_ints(np.asarray(v, dtype=np.int64)))
    np.testing.assert_array_equal(out, np.asarray(v, dtype=np.int64))


def _roundtrip_floats(v):
    v = np.asarray(v, dtype=np.float64)
    out = decode_floats(encode_floats(v))
    assert out.view(np.uint64).tolist() == v.view(np.uint64).tolist()  # bit-exact


def test_int_empty_and_small():
    _roundtrip_ints([])
    _roundtrip_ints([7])
    _roundtrip_ints([7, -3])
    _roundtrip_ints([0, 0, 0, 0])


def test_int_regular_series_is_tiny():
    v = np.arange(0, 60 * 4096, 60, dtype=np.int64)  # gap-filled 1m buckets
    blob = encode_ints(v)
    assert len(blob) < len(v) * 8 / 40  # ~1 bit per point + header
    _roundtrip_ints(v)


def test_int_jittered_and_wide():
    rng = np.random.default_rng(42)
    v = np.cumsum(rng.integers(-5, 500, size=5000))
    _roundtrip_ints(v)
    _roundtrip_ints([0, 2**62, -(2**62), 5, 5])


def test_float_basic():
    _roundtrip_floats([])
    _roundtrip_floats([1.5])
    _roundtrip_floats([1.5, 1.5, 1.5])
    _roundtrip_floats([0.0, -0.0, 1.0, -1.0, np.pi])


def test_float_nan_payload_preserved():
    v = np.array([1.0, np.nan, 2.0, np.nan])
    out = decode_floats(encode_floats(v))
    assert out.view(np.uint64).tolist() == v.view(np.uint64).tolist()


def test_float_smooth_series_compresses():
    t = np.arange(8192)
    v = 100.0 + np.sin(t / 60.0)
    blob = encode_floats(v)
    assert len(blob) < v.nbytes  # better than raw
    _roundtrip_floats(v)


def test_nullable_floats():
    v = np.array([1.0, np.nan, 3.0, np.nan, 5.0])
    valid = ~np.isnan(v)
    vals, mask = decode_nullable_floats(encode_nullable_floats(v, valid))
    np.testing.assert_array_equal(mask, valid)
    np.testing.assert_array_equal(vals[mask], v[valid])
    assert np.isnan(vals[~mask]).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**60), max_value=2**60), max_size=200))
def test_int_roundtrip_property(v):
    _roundtrip_ints(v)


def test_int64_min_dod_regression():
    """dod == INT64_MIN (second difference of [0, 2^62, 0]) used to be
    misclassified as class 4 via an np.abs overflow, polluting the
    '11110' control prefix — scalar + batch encode/decode all agree."""
    from feasts_ray.codecs.intcodec import (
        decode_ints, decode_ints_batch, encode_ints, encode_ints_batch)

    for xs in ([0, 2**62, 0], [0, -(2**62), 0], [5, 2**62, -(2**62), 7],
               [0, 2**31, 0], [0, -(2**31), 0]):  # class-4/5 boundary
        a = np.array(xs, dtype=np.int64)
        blob = encode_ints(a)
        np.testing.assert_array_equal(decode_ints(blob), a)
        bb = encode_ints_batch(a, np.array([0, len(a)]))
        assert bb[0] == blob
        flat, offs = decode_ints_batch([blob])
        np.testing.assert_array_equal(flat, a)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=True, width=64), max_size=200
    )
)
def test_float_roundtrip_property(v):
    _roundtrip_floats(v)


def test_decode_ints_batch_matches_scalar():
    import numpy as np
    from feasts_ray.codecs.intcodec import decode_ints, decode_ints_batch, encode_ints

    rng = np.random.default_rng(3)
    arrs = [rng.integers(-10**12, 10**12, int(rng.integers(0, 60))).astype(np.int64)
            for _ in range(80)]
    arrs += [np.arange(0, 900, 3, dtype=np.int64)[:int(rng.integers(0, 250))]
             for _ in range(80)]
    arrs += [np.array([], dtype=np.int64), np.array([5]), np.array([5, -7]),
             rng.integers(-2**62, 2**62, 40).astype(np.int64)]
    blobs = [encode_ints(a) for a in arrs]
    flat, offs = decode_ints_batch(blobs)
    assert offs[-1] == sum(len(a) for a in arrs)
    for i, (a, b) in enumerate(zip(arrs, blobs)):
        np.testing.assert_array_equal(flat[offs[i]:offs[i + 1]], a)
        np.testing.assert_array_equal(decode_ints(b), a)


try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=300))
    def test_int_roundtrip_property(xs):
        import numpy as np
        from feasts_ray.codecs import decode_ints, encode_ints

        a = np.array(xs, dtype=np.int64)
        np.testing.assert_array_equal(decode_ints(encode_ints(a)), a)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.floats(allow_nan=True, allow_infinity=True,
                              width=64), max_size=200))
    def test_float_roundtrip_property(xs):
        import numpy as np
        from feasts_ray.codecs.gorilla import decode_floats, encode_floats

        a = np.array(xs, dtype=np.float64)
        out = a.view(np.uint64)
        got = decode_floats(encode_floats(a)).view(np.uint64)
        np.testing.assert_array_equal(got, out)  # bitwise, incl NaN payloads
except ImportError:  # pragma: no cover
    pass


def test_encode_ints_batch_byte_identical():
    """Lockstep batch encoder must produce byte-identical blobs to the
    scalar encoder for every class incl. the 64-bit spill fallback."""
    from feasts_ray.codecs.intcodec import decode_ints, encode_ints, encode_ints_batch

    rng = np.random.default_rng(42)
    docs = [
        np.array([], dtype=np.int64),
        np.array([5], dtype=np.int64),
        np.array([5, -9], dtype=np.int64),
        np.zeros(7, dtype=np.int64),
        np.arange(64, dtype=np.int64) * 3600,          # dod == 0 run
        np.array([0, 2**31 - 1, 0, 2**31 - 1], dtype=np.int64),  # spill
    ]
    for _ in range(30):
        docs.append(rng.integers(-10**6, 10**6,
                                 rng.integers(3, 200)).astype(np.int64))
    flat = np.concatenate(docs)
    offs = np.concatenate([[0], np.cumsum([len(d) for d in docs])])
    blobs = encode_ints_batch(flat, offs)
    for i, d in enumerate(docs):
        assert blobs[i] == encode_ints(d)
        np.testing.assert_array_equal(decode_ints(blobs[i]), d)


def test_encode_tile_byte_identity():
    """Encode tiling is a pure perf knob: any tile_docs yields the same
    packed bytes and boundaries (each doc's stream depends only on its
    own values)."""
    import numpy as np

    from feasts_ray.codecs.intcodec import encode_ints_batch_packed
    from feasts_ray.synth import token_chunk

    batch = token_chunk(0, 700)
    toks = batch["tokens"].combine_chunks()
    offs = toks.offsets.to_numpy().astype(np.int64)
    flat = toks.values.to_numpy().astype(np.int64)
    ref_buf, ref_ds = encode_ints_batch_packed(flat, offs, tile_docs=1 << 30)
    for td in (1, 7, 256, 699, 700):
        buf, ds = encode_ints_batch_packed(flat, offs, tile_docs=td)
        assert np.array_equal(buf, ref_buf), td
        assert np.array_equal(ds, ref_ds), td
