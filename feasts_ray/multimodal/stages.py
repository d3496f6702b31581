"""Actor-pool stages over binary media columns.

Design for 100 TB: media payloads are large (`binary` column dominates
block size), so stages run with SMALL batch_size (default 16) and
actor pools sized by ``concurrency``; decoded arrays are emitted as
fixed-shape list columns so downstream stages stay zero-copy Arrow.
Any real decoder state (codec contexts, model weights) belongs in
__init__ — once per actor, never per batch.

``decoder='real'`` genuinely decodes the dependency-free formats in
multimodal/codecs.py (binary PPM images, RIFF PCM WAV audio,
concatenated-PPM video streams) with pure numpy; formats that need a
system codec (JPEG/PNG/MP3/H.264) raise NotImplementedError naming the
library that would plug in. ``decoder='fake'`` derives deterministic
pixels/samples from the payload digest (plumbing-only path).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),       # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),          # -1 when unknown/not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def make_fake_media_table(n: int, kind: str = "image", seed: int = 0,
                          real_format: bool = False) -> pa.Table:
    """Deterministic synthetic media rows.

    ``real_format=False``: payload = seeded random bytes (opaque stub).
    ``real_format=True``: payload is a genuinely-encoded dependency-free
    format — P6 PPM (image), RIFF PCM WAV (audio), or a concatenated
    P6 frame stream (video) — decodable by the stages' ``decoder='real'``
    path with pure numpy."""
    rng = np.random.default_rng(seed)
    w = h = 64
    dur_ms = 0 if kind == "image" else 5000
    payloads, mimes = [], []
    for _ in range(n):
        if not real_format:
            payloads.append(rng.integers(0, 256, size=int(rng.integers(256, 2048)),
                                         dtype=np.uint8).tobytes())
            mimes.append("application/octet-stream")
        elif kind == "image":
            from .codecs import encode_ppm

            payloads.append(encode_ppm(
                rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)))
            mimes.append("image/x-portable-pixmap")
        elif kind == "audio":
            from .codecs import encode_wav

            rate = 16000
            payloads.append(encode_wav(
                rng.integers(-2**15, 2**15, size=rate * dur_ms // 1000,
                             dtype=np.int64).astype(np.int16), rate))
            mimes.append("audio/wav")
        else:  # video: concatenated P6 frames at 1 fps
            from .codecs import encode_ppm

            n_frames = max(1, dur_ms // 1000)
            payloads.append(b"".join(
                encode_ppm(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
                for _ in range(n_frames)))
            mimes.append("video/x-ppm-stream")
    return pa.table({
        "media_id": pa.array(range(n), type=pa.int64()),
        "kind": pa.array([kind] * n),
        "payload": pa.array(payloads, type=pa.binary()),
        "mime": pa.array(mimes),
        "width": pa.array([w] * n, type=pa.int32()),
        "height": pa.array([h] * n, type=pa.int32()),
        "duration_ms": pa.array([dur_ms] * n, type=pa.int32()),
    }, schema=MEDIA_SCHEMA)


def _fake_pixels(payload: bytes, w: int, h: int, c: int = 3) -> np.ndarray:
    """Deterministic pixels derived from the payload digest (stub decode)."""
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(digest, "little"))
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


class ImageDecoder:
    """payload -> pixels:list<uint8> (+shape cols).

    decoder='real' decodes dependency-free formats with pure numpy
    (currently binary PPM / P6); formats needing a system codec (JPEG,
    PNG) raise NotImplementedError with the library that would plug in.
    decoder='fake' derives deterministic pixels from the payload digest
    (plumbing exercise only)."""

    def __init__(self, decoder: str = "fake"):
        self.decoder = decoder

    def _decode_real(self, payload: bytes) -> np.ndarray:
        if payload[:2] == b"P6":
            from .codecs import decode_ppm

            img, _ = decode_ppm(payload)
            return img
        raise NotImplementedError(
            "real decode implemented for binary PPM (P6) only; JPEG/PNG "
            "need Pillow (`from PIL import Image`), unavailable here")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        ws = batch["width"].to_numpy(zero_copy_only=False)
        hs = batch["height"].to_numpy(zero_copy_only=False)
        if self.decoder == "real":
            pix = [self._decode_real(p).reshape(-1) for p in payloads]
        else:
            pix = [
                _fake_pixels(p, int(w), int(h)).reshape(-1)
                for p, w, h in zip(payloads, ws, hs)
            ]
        flat = np.concatenate(pix) if pix else np.array([], dtype=np.uint8)
        offsets = np.concatenate([[0], np.cumsum([len(x) for x in pix])]).astype(np.int64)
        pixels = pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(flat))
        out = batch.drop_columns(["payload"])
        out = out.append_column("pixels", pixels)
        return out.append_column("channels", pa.array([3] * len(batch), type=pa.int32()))


class ImageResizer:
    """pixels (h,w,3) -> resized (th,tw,3) via vectorized nearest-neighbor
    (numpy index grid; no codec needed, works on decoded arrays)."""

    def __init__(self, target_w: int = 32, target_h: int = 32):
        self.tw, self.th = target_w, target_h
        # index grids are built once per actor for the common source shape
        self._grid_cache: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}

    def _grid(self, w: int, h: int):
        key = (w, h)
        if key not in self._grid_cache:
            xs = (np.arange(self.tw) * w // self.tw).astype(np.int64)
            ys = (np.arange(self.th) * h // self.th).astype(np.int64)
            self._grid_cache[key] = (ys[:, None], xs[None, :])
        return self._grid_cache[key]

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["pixels"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.values.to_numpy(zero_copy_only=False)
        offs = col.offsets.to_numpy(zero_copy_only=False)
        ws = batch["width"].to_numpy(zero_copy_only=False)
        hs = batch["height"].to_numpy(zero_copy_only=False)
        out_rows = []
        for i in range(len(batch)):
            w, h = int(ws[i]), int(hs[i])
            img = flat[offs[i]:offs[i + 1]].reshape(h, w, 3)
            gy, gx = self._grid(w, h)
            out_rows.append(img[gy, gx].reshape(-1))
        nflat = np.concatenate(out_rows) if out_rows else np.array([], dtype=np.uint8)
        noffs = np.concatenate([[0], np.cumsum([len(x) for x in out_rows])]).astype(np.int64)
        resized = pa.LargeListArray.from_arrays(pa.array(noffs), pa.array(nflat))
        out = batch.drop_columns(["pixels"])
        out = out.append_column("pixels", resized)
        out = out.set_column(out.column_names.index("width"),
                             "width", pa.array([self.tw] * len(batch), type=pa.int32()))
        return out.set_column(out.column_names.index("height"),
                              "height", pa.array([self.th] * len(batch), type=pa.int32()))


class FrameSampler:
    """video payload -> every-nth-frame pixel rows (flat_map-style expand:
    one input row -> n_frames output rows)."""

    def __init__(self, fps: float = 1.0, frame_w: int = 32, frame_h: int = 32,
                 decoder: str = "fake"):
        self.decoder = decoder
        self.fps = fps
        self.fw, self.fh = frame_w, frame_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ts_ms, frames = [], [], []
        payloads = batch["payload"].to_pylist()
        durs = batch["duration_ms"].to_numpy(zero_copy_only=False)
        mids = batch["media_id"].to_numpy(zero_copy_only=False)
        for i in range(len(batch)):
            if self.decoder == "real":
                if payloads[i][:2] != b"P6":
                    raise NotImplementedError(
                        "real video decode implemented for concatenated-PPM "
                        "streams only; containers (mp4/webm) need PyAV/ffmpeg")
                from .codecs import decode_ppm_stream

                # the stream's native rate is 1 frame/s (writer contract);
                # sample every round(1/fps)-th stored frame
                stored = decode_ppm_stream(payloads[i])
                step = max(1, round(1.0 / self.fps))
                for f in range(0, len(stored), step):
                    ids.append(mids[i])
                    ts_ms.append(int(f * 1000.0))
                    frames.append(stored[f].reshape(-1))
                continue
            n_frames = max(1, int(durs[i] / 1000.0 * self.fps))
            for f in range(n_frames):
                ids.append(mids[i])
                ts_ms.append(int(f * 1000.0 / self.fps))
                frames.append(_fake_pixels(payloads[i] + f.to_bytes(4, "little"),
                                           self.fw, self.fh).reshape(-1))
        flat = np.concatenate(frames) if frames else np.array([], dtype=np.uint8)
        offs = np.concatenate([[0], np.cumsum([len(x) for x in frames])]).astype(np.int64)
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "frame_ts_ms": pa.array(ts_ms, type=pa.int64()),
            "pixels": pa.LargeListArray.from_arrays(pa.array(offs), pa.array(flat)),
        })


class AudioFeatureExtractor:
    """audio payload -> fixed-width feature vector (stub: windowed energy
    over hash-derived samples; real path would decode PCM + FFT)."""

    def __init__(self, n_features: int = 16, decoder: str = "fake"):
        self.decoder = decoder
        self.n_features = n_features

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["payload"].to_pylist():
            if self.decoder == "real":
                if p[:4] != b"RIFF":
                    raise NotImplementedError(
                        "real audio decode implemented for RIFF PCM WAV only; "
                        "mp3/ogg need soundfile/torchaudio")
                from .codecs import decode_wav

                pcm, _rate = decode_wav(p)
                samples = pcm.astype(np.float64)
            else:
                samples = np.frombuffer(p, dtype=np.uint8).astype(np.float64)
            samples = samples - samples.mean() if len(samples) else samples
            chunks = np.array_split(samples, self.n_features)
            feats.append(np.array([float(np.sqrt(np.mean(c * c))) if len(c) else 0.0
                                   for c in chunks]))
        arr = np.stack(feats) if feats else np.zeros((0, self.n_features))
        return pa.table({
            "media_id": batch["media_id"],
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(arr.reshape(-1), type=pa.float32()), self.n_features),
        })
