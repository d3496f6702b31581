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
    """Quality heuristics per doc (vectorized where arrow kernels exist)."""
    t = batch[text_col]
    n_chars = pc.utf8_length(t).cast(pa.float64()).to_numpy(zero_copy_only=False)
    texts = t.to_pylist()
    n = len(texts)
    punct = np.empty(n)
    stop = np.empty(n)
    alpha = np.empty(n)
    mean_wl = np.empty(n)
    for i, s in enumerate(texts):
        L = len(s) or 1
        punct[i] = sum(c in _PUNCT for c in s) / L
        alpha[i] = sum(c.isalpha() for c in s) / L
        w = s.split()
        mean_wl[i] = (sum(len(x) for x in w) / len(w)) if w else 0.0
        stop[i] = (sum(x.lower() in _PROFILES["en"] for x in w) / len(w)) if w else 0.0
    # composite score in [0,1]: length sweet spot, low punct, some stopwords
    length_score = np.clip(n_chars / 500.0, 0, 1)
    score = 0.4 * length_score + 0.2 * (1 - np.clip(punct * 5, 0, 1)) \
        + 0.2 * np.clip(stop * 4, 0, 1) + 0.2 * np.clip(alpha, 0, 1)
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
