"""Minimal big-endian bit stream writer/reader.

Packing runs as a plain Python loop over 64-bit words (the control-code
decisions in Gorilla are inherently sequential); all per-value analysis
(XOR, clz, ctz, bucket classification) is vectorized in numpy by the
callers so the loop body stays tiny. Segments are bounded
(config.SEGMENT_POINTS) and encoded in parallel across (source, segment)
groups, so the sequential inner loop is never the scale bottleneck.
"""

from __future__ import annotations

_MASK64 = (1 << 64) - 1


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
