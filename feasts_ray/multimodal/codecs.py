"""Pure-numpy media codecs for dependency-free formats.

The sandbox has no Pillow/PyAV/soundfile, but several REAL formats are
parseable with numpy alone, which lets the multimodal stages run a
genuine decode path end-to-end:

- PPM (P6, binary RGB): full reader/writer incl. comments/whitespace
  per the netpbm spec.
- WAV (RIFF PCM 16-bit): chunk walk + frombuffer.
- "PPM stream" video: concatenated P6 frames (the netpbm convention for
  multi-image files; what `ffmpeg -f image2pipe -vcodec ppm` emits).

Codecs still missing a system library (JPEG/PNG/MP3/H.264) raise
NotImplementedError in the stages with an explicit message.
"""

from __future__ import annotations

import numpy as np


# ------------------------------------------------------------------ PPM

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 PPM."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("P6 PPM is RGB (3 channels)")
    header = f"P6\n{w} {h}\n255\n".encode("ascii")
    return header + np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def _read_token(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Next whitespace-delimited token, skipping '#' comments (netpbm)."""
    n = len(buf)
    while pos < n:
        ch = buf[pos:pos + 1]
        if ch in b" \t\r\n":
            pos += 1
        elif ch == b"#":
            while pos < n and buf[pos:pos + 1] != b"\n":
                pos += 1
        else:
            break
    start = pos
    while pos < n and buf[pos:pos + 1] not in b" \t\r\n":
        pos += 1
    return buf[start:pos], pos


def decode_ppm(payload: bytes, pos: int = 0) -> tuple[np.ndarray, int]:
    """Binary P6 PPM -> ((h, w, 3) uint8, next offset). Raises ValueError
    on a non-P6 payload."""
    magic, pos = _read_token(payload, pos)
    if magic != b"P6":
        raise ValueError(f"not a binary PPM (P6) payload: magic={magic!r}")
    wtok, pos = _read_token(payload, pos)
    htok, pos = _read_token(payload, pos)
    mtok, pos = _read_token(payload, pos)
    w, h, maxval = int(wtok), int(htok), int(mtok)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pos += 1  # exactly one whitespace byte after maxval (spec)
    need = w * h * 3
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return raster.reshape(h, w, 3).copy(), pos + need


def decode_ppm_stream(payload: bytes) -> list[np.ndarray]:
    """Concatenated P6 frames -> list of (h, w, 3) uint8 arrays."""
    frames: list[np.ndarray] = []
    pos = 0
    while pos < len(payload):
        # tolerate trailing whitespace between/after frames
        tok, peek = _read_token(payload, pos)
        if not tok:
            break
        frame, pos = decode_ppm(payload, pos)
        frames.append(frame)
    return frames


# ------------------------------------------------------------------ WAV

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM bytes."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    data = s.tobytes()
    n = len(data)
    hdr = b"RIFF" + (36 + n).to_bytes(4, "little") + b"WAVE"
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little")           # PCM
           + (1).to_bytes(2, "little")           # mono
           + rate.to_bytes(4, "little")
           + (rate * 2).to_bytes(4, "little")    # byte rate
           + (2).to_bytes(2, "little")           # block align
           + (16).to_bytes(2, "little"))         # bits/sample
    return hdr + fmt + b"data" + n.to_bytes(4, "little") + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> (int16 samples flattened across channels, rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate, bits, data = None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag = int.from_bytes(body[0:2], "little")
            if fmt_tag != 1:
                raise ValueError(f"only PCM WAV supported (fmt={fmt_tag})")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"only 16-bit PCM supported (bits={bits})")
    return np.frombuffer(data, dtype="<i2").copy(), rate
