"""Delta-of-delta int64 codec (Gorilla §4.1.1 timestamp scheme, widened).

Used for bucket ids (regular spacing -> ~1 bit/point after gap-fill),
counts, integer sums, and raw token arrays (the per-row token-array
equality invariant round-trips each doc's tokens through this codec).

Stream layout (big-endian bit stream):
  [n:64][zigzag(v0):64]                 -- n >= 1
  [zigzag(d0):64]                       -- n >= 2, d0 = v1 - v0
  then (n-2) delta-of-delta codes:
    '0'                                 dod == 0
    '10'   + 7  bits (dod + 63)         dod in [-63, 64]
    '110'  + 9  bits (dod + 255)        dod in [-255, 256]
    '1110' + 12 bits (dod + 2047)       dod in [-2047, 2048]
    '11110'+ 32 bits zigzag(dod)        |dod| < 2^31
    '11111'+ 64 bits zigzag(dod)        anything else

Constraint: consecutive deltas must fit int64 (always true for bucket ids,
counts and int32 token streams).
"""

from __future__ import annotations

import numpy as np

from .bitio import BitReader, BitWriter

_U64 = np.uint64


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def encode_ints(values: np.ndarray) -> bytes:
    v = np.asarray(values, dtype=np.int64)
    n = len(v)
    bw = BitWriter()
    bw.write(n, 64)
    if n == 0:
        return bw.getvalue()
    bw.write(_zigzag(int(v[0])), 64)
    if n == 1:
        return bw.getvalue()
    d = np.diff(v)
    bw.write(_zigzag(int(d[0])), 64)
    if n == 2:
        return bw.getvalue()
    dod = np.diff(d)
    # vectorized range classification: smallest class wins
    a = np.abs(dod)
    cls = np.where(dod == 0, 0,
          np.where((dod >= -63) & (dod <= 64), 1,
          np.where((dod >= -255) & (dod <= 256), 2,
          np.where((dod >= -2047) & (dod <= 2048), 3,
          np.where(a < (1 << 31), 4, 5)))))
    dodl = dod.tolist()
    for c, x in zip(cls.tolist(), dodl):
        if c == 0:
            bw.write(0, 1)
        elif c == 1:
            bw.write((0b10 << 7) | (x + 63), 9)
        elif c == 2:
            bw.write((0b110 << 9) | (x + 255), 12)
        elif c == 3:
            bw.write((0b1110 << 12) | (x + 2047), 16)
        elif c == 4:
            bw.write(0b11110, 5)
            bw.write(_zigzag(x), 32)
        else:
            bw.write(0b11111, 5)
            bw.write(_zigzag(x), 64)
    return bw.getvalue()


def _wrap64(x: int) -> int:
    """Wrap to signed int64 (matches numpy int64 overflow semantics in encode)."""
    x &= (1 << 64) - 1
    return x - (1 << 64) if x >= (1 << 63) else x


def decode_ints(data: bytes) -> np.ndarray:
    br = BitReader(data)
    n = br.read(64)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    v = _unzigzag(br.read(64))
    out[0] = v
    if n == 1:
        return out
    d = _unzigzag(br.read(64))
    v = _wrap64(v + d)
    out[1] = v
    for i in range(2, n):
        if br.read(1) == 0:
            dod = 0
        elif br.read(1) == 0:
            dod = br.read(7) - 63
        elif br.read(1) == 0:
            dod = br.read(9) - 255
        elif br.read(1) == 0:
            dod = br.read(12) - 2047
        elif br.read(1) == 0:
            dod = _unzigzag(br.read(32))
        else:
            dod = _unzigzag(br.read(64))
        d = _wrap64(d + dod)
        v = _wrap64(v + d)
        out[i] = v
    return out
