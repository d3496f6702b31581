"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Decode/feature kernels are actor-pool map_batches stages. The actual
codec libraries (Pillow/ffmpeg/torchaudio) are NOT in this environment,
so decoding is stubbed behind ``decoder="fake"`` (deterministic,
hash-derived payloads) / ``decoder="real"`` (raises NotImplementedError
with the import it would need); the Ray-side plumbing — schema, batch
sizing, actor signatures, output layout — is real and tested.
"""

from .stages import (
    MEDIA_SCHEMA,
    AudioFeatureExtractor,
    FrameSampler,
    ImageDecoder,
    ImageResizer,
    make_fake_media_table,
)

__all__ = [
    "MEDIA_SCHEMA",
    "ImageDecoder",
    "ImageResizer",
    "FrameSampler",
    "AudioFeatureExtractor",
    "make_fake_media_table",
]
