"""Multimodal stage plumbing tests (decode is stubbed; schema/batching real)."""

import numpy as np
import pytest

import ray.data

from feasts_ray.multimodal import (
    MEDIA_SCHEMA,
    AudioFeatureExtractor,
    FrameSampler,
    ImageDecoder,
    ImageResizer,
    make_fake_media_table,
)


def _media_ds(n=10, kind="image"):
    return ray.data.from_arrow(make_fake_media_table(n, kind=kind))


def test_schema_contract():
    t = make_fake_media_table(5)
    assert t.schema.equals(MEDIA_SCHEMA)


def test_real_decoder_rejects_codec_formats():
    """Formats that need a system codec still raise with an explicit
    pointer to the library that would plug in."""
    import pyarrow as pa

    jpeg_like = make_fake_media_table(1).set_column(
        2, "payload", pa.array([b"\xff\xd8\xff\xe0 fake jpeg"], type=pa.binary()))
    with pytest.raises(NotImplementedError, match="Pillow"):
        ImageDecoder(decoder="real")(jpeg_like)
    with pytest.raises(NotImplementedError, match="PyAV"):
        FrameSampler(decoder="real")(jpeg_like)
    with pytest.raises(NotImplementedError, match="soundfile"):
        AudioFeatureExtractor(decoder="real")(jpeg_like)


def test_image_decode_resize_pipeline(ray_session):
    ds = _media_ds(12)
    out = ds.map_batches(ImageDecoder, batch_format="pyarrow", batch_size=4,
                         concurrency=2)
    out = out.map_batches(ImageResizer, fn_constructor_args=(16, 16),
                          batch_format="pyarrow", batch_size=4, concurrency=2)
    pdf = out.to_pandas()
    assert len(pdf) == 12
    assert (pdf["width"] == 16).all() and (pdf["height"] == 16).all()
    assert all(len(p) == 16 * 16 * 3 for p in pdf["pixels"])


def test_decode_deterministic(ray_session):
    a = _media_ds(6).map_batches(ImageDecoder, batch_format="pyarrow",
                                 batch_size=2, concurrency=1).to_pandas()
    b = _media_ds(6).map_batches(ImageDecoder, batch_format="pyarrow",
                                 batch_size=3, concurrency=2).to_pandas()
    a = a.sort_values("media_id", ignore_index=True)
    b = b.sort_values("media_id", ignore_index=True)
    for i in range(6):
        assert np.array_equal(np.asarray(a["pixels"][i]), np.asarray(b["pixels"][i]))


def test_frame_sampler_expands_rows(ray_session):
    ds = _media_ds(4, kind="video")
    out = ds.map_batches(FrameSampler, fn_constructor_args=(2.0, 8, 8),
                         batch_format="pyarrow", batch_size=2,
                         concurrency=1).to_pandas()
    # 5000ms at 2 fps -> 10 frames per video
    assert len(out) == 40
    assert set(out["media_id"]) == {0, 1, 2, 3}
    assert all(len(p) == 8 * 8 * 3 for p in out["pixels"])


def test_audio_features_fixed_width(ray_session):
    ds = _media_ds(8, kind="audio")
    out = ds.map_batches(AudioFeatureExtractor, fn_constructor_args=(16,),
                         batch_format="pyarrow", batch_size=4,
                         concurrency=1).to_pandas()
    assert len(out) == 8
    assert all(len(f) == 16 for f in out["features"])
    assert np.isfinite(np.concatenate([np.asarray(f) for f in out["features"]])).all()


class TestRealCodecs:
    """decoder='real' genuinely decodes dependency-free formats
    (pure-numpy PPM / WAV / PPM-stream codecs)."""

    def test_ppm_roundtrip(self):
        from feasts_ray.multimodal.codecs import decode_ppm, encode_ppm

        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
        dec, _ = decode_ppm(encode_ppm(img))
        np.testing.assert_array_equal(dec, img)
        # comments + extra whitespace in the header are spec-legal
        hacked = b"P6 # a comment\n 23\t17 # wxh\n255\n" + img.tobytes()
        dec2, _ = decode_ppm(hacked)
        np.testing.assert_array_equal(dec2, img)

    def test_wav_roundtrip(self):
        from feasts_ray.multimodal.codecs import decode_wav, encode_wav

        rng = np.random.default_rng(2)
        pcm = rng.integers(-2**15, 2**15, 1000).astype(np.int16)
        out, rate = decode_wav(encode_wav(pcm, 8000))
        assert rate == 8000
        np.testing.assert_array_equal(out, pcm)

    def test_real_image_decode_pipeline(self, ray_session):
        from feasts_ray.multimodal.codecs import decode_ppm

        t = make_fake_media_table(6, kind="image", real_format=True)
        ds = ray.data.from_arrow(t)
        out = ds.map_batches(ImageDecoder, fn_constructor_kwargs={"decoder": "real"},
                             batch_format="pyarrow", batch_size=3,
                             concurrency=2).to_pandas().sort_values("media_id")
        for i in range(6):
            expect, _ = decode_ppm(t["payload"][i].as_py())
            got = np.asarray(out["pixels"].iloc[i], dtype=np.uint8)
            np.testing.assert_array_equal(got, expect.reshape(-1))

    def test_real_video_frame_sampling(self, ray_session):
        t = make_fake_media_table(3, kind="video", real_format=True)
        ds = ray.data.from_arrow(t)
        out = ds.map_batches(FrameSampler,
                             fn_constructor_kwargs={"decoder": "real", "fps": 1.0},
                             batch_format="pyarrow", batch_size=2,
                             concurrency=2).to_pandas()
        # 5s @ 1 fps native -> 5 frames per video
        assert len(out) == 15
        assert set(out["media_id"]) == {0, 1, 2}
        assert sorted(out[out["media_id"] == 0]["frame_ts_ms"]) == [
            0, 1000, 2000, 3000, 4000]

    def test_real_audio_features(self, ray_session):
        t = make_fake_media_table(4, kind="audio", real_format=True)
        ds = ray.data.from_arrow(t)
        out = ds.map_batches(AudioFeatureExtractor,
                             fn_constructor_kwargs={"decoder": "real"},
                             batch_format="pyarrow", batch_size=2,
                             concurrency=2).to_pandas()
        assert len(out) == 4
        feats = np.stack([np.asarray(f) for f in out["features"]])
        assert feats.shape == (4, 16)
        assert (feats > 0).all()  # RMS of real random PCM
