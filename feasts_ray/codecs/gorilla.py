"""Gorilla XOR float64 codec (Pelkonen et al. VLDB'15 §4.1.2).

Per value, XOR with the previous value:
  '0'                                    xor == 0 (repeat)
  '10' + meaningful bits                 falls inside the previous
                                         (leading, meaningful) window
  '11' + 5 bits leading + 6 bits (len-1) + len meaningful bits

clz/ctz for the whole segment are computed vectorized (numpy unpackbits)
before the sequential packing loop; only the window-reuse decision (a true
scan) stays in Python. Exact round-trip including NaN payloads and -0.0.
"""

from __future__ import annotations

import numpy as np

from .bitio import BitReader, BitWriter


def _clz_ctz(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized count-leading/trailing-zeros for uint64 (0 -> 64, 64)."""
    n = len(u)
    bits = np.unpackbits(u.astype(">u8").view(np.uint8)).reshape(n, 64)
    any_set = bits.any(axis=1)
    first = bits.argmax(axis=1)  # index of first set bit (0 if none)
    last = 63 - bits[:, ::-1].argmax(axis=1)
    clz = np.where(any_set, first, 64)
    ctz = np.where(any_set, 63 - last, 64)
    return clz.astype(np.int64), ctz.astype(np.int64)


def encode_floats(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = len(v)
    bw = BitWriter()
    bw.write(n, 64)
    if n == 0:
        return bw.getvalue()
    u = v.view(np.uint64)
    bw.write(int(u[0]), 64)
    if n == 1:
        return bw.getvalue()
    xor = (u[1:] ^ u[:-1])
    clz, ctz = _clz_ctz(xor)
    clz = np.minimum(clz, 31)  # 5-bit leading field
    xl = xor.tolist()
    cl = clz.tolist()
    ct = ctz.tolist()
    prev_lead, prev_mean = -1, -1  # previous window (leading, meaningful len)
    write = bw.write
    for x, lead, trail in zip(xl, cl, ct):
        if x == 0:
            write(0, 1)
            continue
        meaningful = 64 - lead - trail
        if prev_lead >= 0 and lead >= prev_lead and (64 - prev_lead - prev_mean) <= trail:
            # fits the previous window: '10' + prev_mean bits
            write(0b10, 2)
            write(x >> (64 - prev_lead - prev_mean), prev_mean)
        else:
            write(0b11, 2)
            write(lead, 5)
            write(meaningful - 1, 6)
            write(x >> trail, meaningful)
            prev_lead, prev_mean = lead, meaningful
    return bw.getvalue()


def decode_floats(data: bytes) -> np.ndarray:
    br = BitReader(data)
    n = br.read(64)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    cur = br.read(64)
    out[0] = cur
    lead, mean = 0, 0
    read = br.read
    for i in range(1, n):
        if read(1) == 0:
            out[i] = cur
            continue
        if read(1) == 0:  # reuse window
            bits = read(mean)
            cur ^= bits << (64 - lead - mean)
        else:
            lead = read(5)
            mean = read(6) + 1
            bits = read(mean)
            cur ^= bits << (64 - lead - mean)
        out[i] = cur
    return out.view(np.float64)
