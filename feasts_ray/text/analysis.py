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


def add_token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_words (whitespace split, vectorized arrow kernels) + n_chars_calc."""
    t = batch[text_col]
    words = pc.split_pattern_regex(t, r"\s+")
    n_words = pc.list_value_length(words).cast(pa.int64())
    n_chars = pc.utf8_length(t).cast(pa.int64())
    batch = batch.append_column("n_words", n_words)
    return batch.append_column("n_chars_calc", n_chars)


class BpeishTokenCounter:
    """Actor-pool kernel: GPT-2-style pre-tokenizer regex count (the regex
    is compiled once per actor in __init__)."""

    PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.rx = re.compile(self.PATTERN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        counts = np.fromiter((len(self.rx.findall(t)) for t in texts),
                             dtype=np.int64, count=len(texts))
        return batch.append_column("n_bpe_tokens", pa.array(counts, type=pa.int64()))


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
    n_chars = pc.utf8_length(t).to_numpy(zero_copy_only=False).astype(np.int64)
    texts = t.to_pylist()
    n = len(texts)
    n_punct = np.empty(n, dtype=np.int64)
    n_alpha = np.empty(n, dtype=np.int64)
    n_words = np.empty(n, dtype=np.int64)
    n_stop = np.empty(n, dtype=np.int64)
    stops = _PROFILES["en"]
    for i, s in enumerate(texts):
        n_punct[i] = sum(c in _PUNCT for c in s)
        n_alpha[i] = sum(("a" <= c <= "z") or ("A" <= c <= "Z") for c in s)
        w = s.split()
        n_words[i] = len(w)
        n_stop[i] = sum(x.lower() in stops for x in w)
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
    """Stopword-vote language ID; 'und' when no profile word seen."""
    texts = batch[text_col].to_pylist()
    langs = []
    for s in texts:
        words = set(w.lower() for w in s.split())
        best, best_n = "und", 0
        for lang, prof in _PROFILES.items():
            hits = len(words & prof)
            if hits > best_n:
                best, best_n = lang, hits
        langs.append(best)
    return batch.append_column("lang_pred", pa.array(langs, type=pa.string()))


def add_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit rolling polynomial fingerprint of the word-hash sequence."""
    from ..dedup.hashing import tokenize_batch

    texts = batch[text_col].to_pylist()
    whash, offsets, _ = tokenize_batch(texts)
    MASK = (1 << 64) - 1
    fps = np.empty(len(texts), dtype=np.uint64)
    for i in range(len(texts)):
        acc = 0xCBF29CE484222325
        for h in whash[offsets[i]:offsets[i + 1]].tolist():  # Python ints: no overflow
            acc = ((acc * 0x100000001B3) & MASK) ^ h
        fps[i] = np.uint64(acc)
    return batch.append_column(
        "fingerprint", pa.array(fps.astype(np.int64), type=pa.int64()))
