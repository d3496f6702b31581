"""Per-document text analysis as zero-copy Arrow map_batches stages.

- token counting: whitespace words (pa.compute, fully vectorized) and a
  BPE-ish regex token count (compiled once per actor);
- quality scoring: length / punctuation / stopword / alpha ratios with a
  composite score;
- language ID: stopword-profile n-gram heuristic over a small built-in
  profile table (no model download);
- fingerprinting: 64-bit rolling polynomial hash of the word sequence.

All counts that have ANSI-SQL equivalents keep exact integer outputs so
the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# tiny public-knowledge stopword profiles (top function words per language)
_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "zu", "mit", "den"},
    "fr": {"le", "la", "et", "les", "des", "un", "une", "est", "pour", "que"},
    "es": {"el", "la", "de", "que", "y", "los", "un", "es", "en", "por"},
}

_PUNCT = set(".,;:!?'\"()[]{}-")


def _n_words_vec(t: pa.Array) -> pa.Array:
    """str.split() word counts, vectorized: trim, count whitespace runs
    (= separators), +1 for non-empty text. Regex split would keep empty
    edge tokens ('' or ' a ' -> ['','a','']), inflating the count."""
    trimmed = pc.utf8_trim_whitespace(t)
    n_sep = pc.count_substring_regex(trimmed, r"\s+").cast(pa.int64())
    nonempty = pc.not_equal(trimmed, "").cast(pa.int64())
    return pc.multiply(pc.add(n_sep, pa.scalar(1, pa.int64())), nonempty)


def add_token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_words (whitespace split, vectorized arrow kernels) + n_chars_calc."""
    t = batch[text_col]
    n_words = _n_words_vec(t)
    n_chars = pc.utf8_length(t).cast(pa.int64())
    batch = batch.append_column("n_words", n_words)
    return batch.append_column("n_chars_calc", n_chars)


class BpeishTokenCounter:
    """Actor-pool kernel: GPT-2-style pre-tokenizer regex count.

    The count is DEFINED by ``PATTERN`` under RE2 (``pc.count_substring_
    regex`` — vectorized C, the same engine DuckDB's oracle uses, so
    kernel and oracle agree by construction on every input). This is the
    lookahead-free variant of the GPT-2 pattern: the ``\\s+(?!\\S)``
    branch RE2 lacks only changes COUNTS for whitespace runs >= 2 whose
    last char is a non-space whitespace (e.g. ``"a \\tb"``: GPT-2 splits
    the run in two), plus RE2's ``\\s`` is ASCII while Python's is
    Unicode — both deviations documented and pinned by test against the
    DuckDB oracle on adversarial strings."""

    PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            col = col.fill_null("")
        counts = pc.count_substring_regex(col, self.PATTERN)
        return batch.append_column(
            "n_bpe_tokens", pc.cast(counts, pa.int64()))


def _stopword_hits(words: pa.ListArray, profile: set[str]) -> tuple[np.ndarray, np.ndarray]:
    """(n_words, n_profile_hits) per doc from a list<string> of lowered
    words — vectorized: is_in over the flat values + add.reduceat."""
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n_words = np.diff(offsets)
    flat = words.flatten()
    hits = pc.is_in(flat, value_set=pa.array(sorted(profile))).to_numpy(
        zero_copy_only=False).astype(np.int64)
    starts = offsets[:-1]
    csum = np.concatenate([[0], np.cumsum(hits)])
    n_stop = csum[offsets[1:]] - csum[starts]
    return n_words, n_stop


def add_quality(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality heuristics per doc.

    Every ratio is derived from exact integer counts (ASCII character
    classes, whitespace words) via a fixed double expression tree, so the
    DuckDB oracle in ``__ray_entry__`` reproduces the values bit-for-bit:
      punct_ratio   = CAST(n_punct AS DOUBLE) / n_chars
      alpha_ratio   = CAST(n_alpha AS DOUBLE) / n_chars
      stopword_ratio= CAST(n_stop  AS DOUBLE) / n_words
      mean_word_len = CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words
                      (single-space text: word chars = chars - separators)
      quality_score = 0.4*min(n_chars/500.0, 1) + 0.2*(1 - min(punct*5, 1))
                      + 0.2*min(stop*4, 1) + 0.2*alpha
    """
    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    n_chars = pc.utf8_length(t).to_numpy(zero_copy_only=False).astype(np.int64)
    # character-class counts via vectorized RE2 kernels (same classes as
    # the oracle's regexp_replace character sets)
    n_punct = pc.count_substring_regex(
        t, r"[.,;:!?'\"()\[\]{}-]").to_numpy(zero_copy_only=False).astype(np.int64)
    n_alpha = pc.count_substring_regex(
        t, r"[A-Za-z]").to_numpy(zero_copy_only=False).astype(np.int64)
    # words: str.split() semantics (trim first; empty text -> 0 words —
    # regex split alone keeps empty edge tokens and inflates the count);
    # stopword hits via is_in over the flattened word values + reduceat
    # (empty tokens never match a profile word, so n_stop is unaffected)
    trimmed = pc.utf8_trim_whitespace(t)
    words = pc.split_pattern_regex(pc.utf8_lower(trimmed), r"\s+")
    _, n_stop = _stopword_hits(words, _PROFILES["en"])
    n_words = _n_words_vec(t).to_numpy(zero_copy_only=False).astype(np.int64)
    Lc = np.maximum(n_chars, 1).astype(np.float64)
    Lw = np.maximum(n_words, 1).astype(np.float64)
    punct = n_punct.astype(np.float64) / Lc
    alpha = n_alpha.astype(np.float64) / Lc
    stop = n_stop.astype(np.float64) / Lw
    mean_wl = (n_chars - (n_words - 1)).astype(np.float64) / Lw
    score = (0.4 * np.minimum(n_chars.astype(np.float64) / 500.0, 1.0)
             + 0.2 * (1.0 - np.minimum(punct * 5.0, 1.0))
             + 0.2 * np.minimum(stop * 4.0, 1.0) + 0.2 * alpha)
    for name, arr in [("punct_ratio", punct), ("stopword_ratio", stop),
                      ("alpha_ratio", alpha), ("mean_word_len", mean_wl),
                      ("quality_score", score)]:
        batch = batch.append_column(name, pa.array(arr, type=pa.float64()))
    return batch


def add_langid(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-vote language ID; 'und' when no profile word seen.

    Vectorized: one RE2 presence test per profile word over the lowered
    text column (40 C-speed passes, no per-row Python). Votes count
    DISTINCT profile words present (same as the set-intersection oracle);
    ties break in profile order en > de > fr > es."""
    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    low = pc.utf8_lower(t)
    n = len(batch)
    lang_names = list(_PROFILES)
    votes = np.zeros((len(lang_names), n), dtype=np.int64)
    for li, lang in enumerate(lang_names):
        for w in _PROFILES[lang]:
            present = pc.match_substring_regex(
                low, rf"(^|\s){re.escape(w)}(\s|$)").to_numpy(zero_copy_only=False)
            votes[li] += present.astype(np.int64)
    best = np.argmax(votes, axis=0)  # first max wins = profile order
    langs = np.array(lang_names, dtype=object)[best]
    langs[votes.max(axis=0) == 0] = "und"
    return batch.append_column("lang_pred", pa.array(langs, type=pa.string()))


def add_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit rolling polynomial fingerprint of the word-hash sequence."""
    from ..dedup.hashing import tokenize_arrow

    whash, offsets, counts = tokenize_arrow(batch[text_col])
    nd = len(offsets) - 1
    # the FNV fold runs j-ascending across ALL docs at once: uint64
    # wraparound IS the `& MASK` of the scalar fold, so each doc's value
    # is bit-identical to the sequential Python-int version (and to the
    # SQL oracle's HUGEINT-mod fold)
    fps = np.full(nd, 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    starts = offsets[:-1]
    with np.errstate(over="ignore"):
        for j in range(int(counts.max()) if nd else 0):
            m = counts > j
            fps[m] = (fps[m] * prime) ^ whash[starts[m] + j]
    return batch.append_column(
        "fingerprint", pa.array(fps.astype(np.int64), type=pa.int64()))


# RE2-safe PII patterns (no lookarounds). DuckDB's regexp functions run
# the SAME RE2 engine as pc.*_substring_regex, so kernel and oracle
# agree on every input by construction.
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def add_pii_scrub(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """PII scrubbing (the redaction step of a curation pipeline): count
    and redact email addresses and IPv4 literals. Counts are over the
    ORIGINAL text (leftmost non-overlapping RE2 matches); redaction
    replaces emails with <EMAIL> first, then IPs with <IP> — the same
    two regexp_replace('g') calls the SQL oracle issues, so
    text_redacted matches bit-for-bit. One corpus scan, zero shuffles,
    all vectorized C kernels."""
    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    n_email = pc.count_substring_regex(t, PII_EMAIL).cast(pa.int64())
    n_ip = pc.count_substring_regex(t, PII_IPV4).cast(pa.int64())
    red = pc.replace_substring_regex(t, PII_EMAIL, "<EMAIL>")
    red = pc.replace_substring_regex(red, PII_IPV4, "<IP>")
    batch = batch.append_column("n_emails", n_email)
    batch = batch.append_column("n_ipv4", n_ip)
    return batch.append_column("text_redacted", red)


def dedup_lines(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Within-document line dedup (the C4/Gopher boilerplate step: keep
    each exact line's FIRST occurrence, preserve order). Emits
    (doc_id..., n_lines, n_lines_removed, text_dedup). Line identity in
    the kernel is the 64-bit md5-LE line hash (collision-free at this
    scale — the same equivalence every dedup oracle relies on); the SQL
    dedups on the line string itself. Pure per-document: one scan, zero
    shuffles, vectorized (one split kernel + one lexsort)."""
    from ..dedup.hashing import hash_words_arrow

    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    lines = pc.split_pattern(t, "\n")
    offsets = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    flat = lines.values
    nd = len(counts)
    if len(flat):
        h = hash_words_arrow(flat).view(np.int64)
        doc_of = np.repeat(np.arange(nd), counts)
        idx = np.arange(len(h))
        order = np.lexsort((idx, h, doc_of))
        d_s, h_s = doc_of[order], h[order]
        first = np.ones(len(h), dtype=bool)
        first[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
        keep = np.zeros(len(h), dtype=bool)
        keep[order[first]] = True
        kept_counts = np.bincount(doc_of[keep], minlength=nd)
        kept = flat.filter(pa.array(keep))
        new_off = np.concatenate([[0], np.cumsum(kept_counts)])
        rebuilt = pa.ListArray.from_arrays(
            pa.array(new_off, type=pa.int32()), kept)
        joined = pc.binary_join(rebuilt, "\n")
    else:
        kept_counts = counts
        joined = pa.array([""] * nd, type=pa.string())
    batch = batch.append_column("n_lines",
                                pa.array(counts, type=pa.int64()))
    batch = batch.append_column(
        "n_lines_removed",
        pa.array(counts - kept_counts, type=pa.int64()))
    return batch.append_column("text_dedup", joined)
