"""DuckDB oracle generators for the md5-word-hash text fingerprints:
SimHash near-dup pairs and the FNV-1 rolling document fingerprint.

Both mirror the kernels exactly because every operation is exact
integer arithmetic — no IEEE-float ordering concerns:

- word hash (dedup/hashing.hash_words): first 8 bytes of md5(word),
  little-endian -> rebuilt in SQL by concatenating the hex pairs in
  reverse order and casting '0x…'::UBIGINT.
- tokenization: str.split() == regex-split on \\s+ with empty tokens
  dropped (corpus verified ASCII-whitespace-only).
- SimHash (dedup/simhash.simhash64_batch): per-(doc, word) term
  frequency, per-bit vote sum cnt*(2*bit-1), bit set iff vote > 0.
  Emitted as 64 integer SUM aggregates + a signed per-bit literal sum
  (bit 63 contributes int64-min, matching the kernel's uint64->int64
  view). Pair set = brute-force bit_count(xor) <= max_hamming join —
  the kernel's chunk banding has exact recall by pigeonhole
  (n_chunks > max_hamming), so banding == brute force as long as no
  (chunk, chunk_val) bucket overflows max_bucket (asserted in suite).
- fingerprint (text/analysis.add_fingerprint): acc = (acc * FNV_PRIME
  mod 2^64) xor h, seeded FNV offset, folded left-to-right via
  list_reduce over the ordered word-hash list (seed prepended; an
  empty doc folds to the seed, as in the kernel). The 40-bit prime
  keeps acc*prime < 2^104, inside HUGEINT.
"""

from __future__ import annotations

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_TWO64 = 1 << 64

# '0x' || md5 hex pairs reversed (bytes 8..1) -> little-endian uint64
_H = ("('0x' || " + " || ".join(
    f"substr(md5({{w}}), {2 * b - 1}, 2)" for b in range(8, 0, -1))
    + ")::UBIGINT")


def word_hash_expr(w: str) -> str:
    return _H.format(w=w)


_WORDS = r"""
words AS (
  SELECT doc_id,
    unnest(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS w
  FROM documents)"""


def simhash_pairs_sql(max_hamming: int = 4) -> str:
    votes = ",\n    ".join(
        f"SUM(cnt * (2 * CAST((h >> {b}) & 1 AS BIGINT) - 1)) AS v{b}"
        for b in range(64))
    bit_terms = " + ".join(
        [f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(63)]
        + ["CASE WHEN v63 > 0 THEN (-9223372036854775807 - 1) ELSE 0 END"])
    return f"""
WITH {_WORDS},
tf AS (SELECT doc_id, w, COUNT(*) AS cnt FROM words GROUP BY doc_id, w),
wh AS (SELECT doc_id, cnt, {word_hash_expr('w')} AS h FROM tf),
votes AS (
  SELECT doc_id,
    {votes}
  FROM wh GROUP BY doc_id),
sh AS (
  SELECT d.doc_id, COALESCE({bit_terms}, 0) AS simhash
  FROM documents d LEFT JOIN votes v ON v.doc_id = d.doc_id)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def fingerprint_sql() -> str:
    h = word_hash_expr("w")
    return f"""
WITH fp AS (
  SELECT doc_id,
    list_reduce(
      list_prepend({_FNV_OFFSET}::UBIGINT,
        list_transform(
          list_filter(string_split_regex(text, '\\s+'), w -> w <> ''),
          w -> {h})),
      (acc, h) -> xor(
        CAST((CAST(acc AS HUGEINT) * {_FNV_PRIME}) % {_TWO64}::HUGEINT
             AS UBIGINT), h)) AS v
  FROM documents)
SELECT doc_id,
  CASE WHEN v >= 9223372036854775808::UBIGINT
       THEN CAST(CAST(v AS HUGEINT) - {_TWO64}::HUGEINT AS BIGINT)
       ELSE CAST(v AS BIGINT) END AS fingerprint
FROM fp
"""
