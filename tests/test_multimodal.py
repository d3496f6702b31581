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


def test_real_decoder_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError, match="Pillow"):
        ImageDecoder(decoder="real")
    with pytest.raises(NotImplementedError):
        FrameSampler(decoder="real")
    with pytest.raises(NotImplementedError):
        AudioFeatureExtractor(decoder="real")


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
