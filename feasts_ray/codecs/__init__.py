"""Bit-level codecs for rolled-up point columns (north rule).

- ``gorilla``: Gorilla XOR compression of float64 columns (Pelkonen et al.,
  "Gorilla: A Fast, Scalable, In-Memory Time Series Database", VLDB 2015,
  §4.1.2 value scheme).
- ``intcodec``: delta-of-delta compression of monotone-ish int64 columns
  (same paper §4.1.1 timestamp scheme, widened to arbitrary int64 via a
  zigzag 64-bit escape) — used for bucket ids, counts, sums and raw token
  arrays (per-row token-array equality invariant).

Encoders/decoders are exact: decode(encode(x)) == x bit-for-bit, including
NaN payloads and -0.0 for floats. Nulls are carried in a separate validity
bitmap (``nullable`` helpers).
"""

from .gorilla import decode_floats, encode_floats
from .intcodec import decode_ints, encode_ints
from .nullable import (
    decode_nullable_floats,
    decode_nullable_ints,
    encode_nullable_floats,
    encode_nullable_ints,
)

__all__ = [
    "encode_floats",
    "decode_floats",
    "encode_ints",
    "decode_ints",
    "encode_nullable_floats",
    "decode_nullable_floats",
    "encode_nullable_ints",
    "decode_nullable_ints",
]
