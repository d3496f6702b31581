"""Big-endian bit stream: vectorized variable-length packer + readers.

``pack_codes`` packs an array of (value, nbits<=64) codes into one
big-endian bitstream with NO per-code Python: byte positions come from a
cumsum of code widths, and each of the <=9 bytes a code can span is
filled in one vectorized pass (scatter-OR for shared boundary bytes).
The scalar BitWriter remains for tiny/irregular streams; BitReader is
the (test/verification-path) decoder.
"""

from __future__ import annotations

import numpy as np

_MASK64 = (1 << 64) - 1


def pack_codes(vals: "np.ndarray", nbits: "np.ndarray") -> bytes:
    """Pack codes big-endian: code i occupies bits [sum(nbits[:i]),
    sum(nbits[:i+1])). ``vals`` must carry each code in its LOW nbits
    (higher bits may be dirty — they are masked)."""
    nbits = np.asarray(nbits, dtype=np.int64)
    if len(nbits) == 0:
        return b""
    v = np.asarray(vals, dtype=np.uint64)
    full = nbits == 64
    keep = (np.uint64(1) << nbits.clip(0, 63).astype(np.uint64)) - np.uint64(1)
    v = np.where(full, v, v & keep)
    end = np.cumsum(nbits)
    start = end - nbits
    total = int(end[-1])
    nbytes = (total + 7) // 8
    first_byte = start >> 3
    last_byte = (end - 1) >> 3
    idx_parts, val_parts = [], []
    for k in range(9):
        b = first_byte + k
        active = b <= last_byte
        if not active.any():
            break
        ba = b[active]
        sh = end[active] - (ba + 1) * 8
        va = v[active]
        pos = sh >= 0
        byte = np.where(
            pos,
            va >> sh.clip(0, 63).astype(np.uint64),
            va << (-sh).clip(0, 63).astype(np.uint64),
        ) & np.uint64(0xFF)
        idx_parts.append(ba)
        val_parts.append(byte)
    # distinct codes own disjoint bit ranges of a shared byte, so OR == ADD:
    # one C-speed bincount replaces a slow scatter-OR
    acc = np.bincount(np.concatenate(idx_parts),
                      weights=np.concatenate(val_parts).astype(np.float64),
                      minlength=nbytes)
    out = acc.astype(np.uint8)
    # pad to whole 64-bit words (BitReader-compatible with BitWriter output)
    pad = (-len(out)) % 8
    if pad:
        out = np.concatenate([out, np.zeros(pad, dtype=np.uint8)])
    return out.tobytes()


def pack_codes_at(vals: "np.ndarray", nbits: "np.ndarray",
                  starts: "np.ndarray", nbytes: int) -> "np.ndarray":
    """Pack codes at EXPLICIT absolute bit positions into one zeroed
    buffer of ``nbytes`` (uint8). Codes must occupy disjoint bit ranges.

    Word strategy: a <=64-bit code spans at most two big-endian 64-bit
    words; each code contributes (word_idx, uint64 pattern) pairs, and
    disjointness makes OR == ADD, so accumulation is four exact float64
    bincounts over 16-bit chunks (each chunk sum stays <= 0xFFFF).
    ~15x faster than byte-level scatter for dense 37-bit code streams."""
    nbits = np.asarray(nbits, dtype=np.int64)
    if len(nbits) == 0:
        return np.zeros(nbytes, dtype=np.uint8)
    v = np.asarray(vals, dtype=np.uint64)
    starts = np.asarray(starts, dtype=np.int64)
    full = nbits == 64
    keep = (np.uint64(1) << nbits.clip(0, 63).astype(np.uint64)) - np.uint64(1)
    v = np.where(full, v, v & keep)
    nwords = (nbytes + 7) // 8
    w_idx = starts >> 6
    off = (starts & 63).astype(np.uint64)
    end_off = off + nbits.astype(np.uint64)
    over = end_off > 64
    sh0 = np.where(over, np.uint64(0), np.uint64(64) - end_off)
    with np.errstate(over="ignore"):
        sh_hi = np.where(over, end_off - np.uint64(64), np.uint64(0))
        sh_lo = np.where(over, np.uint64(128) - end_off, np.uint64(0))
        c0 = np.where(over, v >> sh_hi, v << sh0)
        c1 = np.where(over, v << sh_lo, np.uint64(0))
    idx = np.concatenate([w_idx, (w_idx + 1)[over]])
    contrib = np.concatenate([c0, c1[over]])
    words = np.zeros(nwords, dtype=np.uint64)
    for c in range(4):
        chunk = ((contrib >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.float64)
        acc = np.bincount(idx, weights=chunk, minlength=nwords)
        words |= acc.astype(np.uint64) << np.uint64(16 * c)
    return words.byteswap().view(np.uint8)[:nbytes].copy()


def or_codes_sorted(words: "np.ndarray", vals: "np.ndarray",
                    nbits: "np.ndarray", starts: "np.ndarray") -> None:
    """OR codes into an existing big-endian uint64 ``words`` buffer, in
    place. Requires: ``starts`` sorted ascending, codes disjoint, and
    each val CLEAN in its low nbits (no dirty high bits — the
    encode-side code constructors guarantee this). Sortedness makes each
    word's contributions CONTIGUOUS, so accumulation is one
    np.bitwise_or.reduceat instead of pack_codes_at's four float64
    bincount rounds — ~2x faster for dense small-code streams."""
    n = len(vals)
    if n == 0:
        return
    U = np.uint64
    starts = np.asarray(starts, dtype=np.int64)
    w_idx = starts >> 6
    end_off = (starts & 63).astype(np.uint64) + nbits.astype(np.uint64)
    over = end_off > 64
    nover = int(over.sum())
    with np.errstate(over="ignore"):
        c0 = np.where(over, vals >> (end_off - U(64)),
                      vals << ((U(64) - end_off) & U(63)))
    if nover:
        with np.errstate(over="ignore"):
            c1v = vals << ((U(128) - end_off) & U(63))
        pos = np.arange(n) + np.cumsum(over) - over
        idx = np.empty(n + nover, dtype=np.int64)
        contrib = np.empty(n + nover, dtype=np.uint64)
        idx[pos] = w_idx
        contrib[pos] = c0
        idx[pos[over] + 1] = w_idx[over] + 1
        contrib[pos[over] + 1] = c1v[over]
    else:
        idx, contrib = w_idx, c0
    bounds = np.concatenate([[0], np.flatnonzero(np.diff(idx)) + 1])
    words[idx[bounds]] |= np.bitwise_or.reduceat(contrib, bounds)


class BitWriter:
    __slots__ = ("_words", "_cur", "_nbits")

    def __init__(self) -> None:
        self._words: list[int] = []
        self._cur = 0  # partial word, low _nbits bits valid
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        """Append the low ``nbits`` bits of ``value`` (0 <= nbits <= 64)."""
        value &= (1 << nbits) - 1 if nbits < 64 else _MASK64
        total = self._nbits + nbits
        if total >= 64:
            over = total - 64
            self._words.append(((self._cur << (nbits - over)) | (value >> over)) & _MASK64)
            self._cur = value & ((1 << over) - 1)
            self._nbits = over
        else:
            self._cur = (self._cur << nbits) | value
            self._nbits = total

    def getvalue(self) -> bytes:
        nwords = len(self._words)
        out = bytearray((nwords + (1 if self._nbits else 0)) * 8)
        for i, w in enumerate(self._words):
            out[i * 8 : i * 8 + 8] = w.to_bytes(8, "big")
        if self._nbits:
            w = self._cur << (64 - self._nbits)
            out[nwords * 8 : nwords * 8 + 8] = w.to_bytes(8, "big")
        return bytes(out)


class BitReader:
    __slots__ = ("_data", "_pos")

    def __init__(self, data: bytes, bit_offset: int = 0) -> None:
        self._data = data
        self._pos = bit_offset  # absolute bit position

    def read(self, nbits: int) -> int:
        """Read ``nbits`` (0 <= nbits <= 64) as an unsigned int."""
        if nbits == 0:
            return 0
        pos = self._pos
        self._pos = pos + nbits
        byte0 = pos >> 3
        byte1 = (pos + nbits - 1) >> 3
        chunk = int.from_bytes(self._data[byte0 : byte1 + 1], "big")
        shift = 7 - ((pos + nbits - 1) & 7)
        return (chunk >> shift) & ((1 << nbits) - 1)

    @property
    def bit_pos(self) -> int:
        return self._pos
