"""Corpus-level text operators (feasts_ray/text/corpus.py): word-freq
top-k, blocklist decontamination, deterministic stratified sampling —
each checked bitwise against an in-suite DuckDB oracle on a synthetic
frame with deliberate edge cases (ties, multi-space text, empty docs,
short docs, unknown strata)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from feasts_ray.text.corpus import (build_blocklist, decontaminate,
                                    sample_stratified, word_freq_topk)

DOCS = pd.DataFrame({
    "doc_id": np.arange(606, dtype=np.int64),
    "text": (
        # doc 0: a blocklist source (>= 8 words); appears verbatim in 3, 5
        ["alpha beta gamma delta epsilon zeta eta theta tail0"]
        + ["  multi   space\tand\nnewline words here  "]      # 1: odd ws
        + [""]                                                 # 2: empty
        + ["x alpha beta gamma delta epsilon zeta eta theta y"]  # 3: hit
        + ["short doc"]                                        # 4: <8 words
        + ["alpha beta gamma delta epsilon zeta eta theta"]    # 5: hit
        + [f"filler common word{u % 7} unique{u}" for u in range(600)]
    ),
    "lang": (["en", "en", "de", "fr", "zz", "es"]
             + ["en" if u % 2 == 0 else "fr" for u in range(600)]),
    "source": ["s0"] * 606,
})
# doc 101, 202, ...: more blocklist sources (only those with >= 8 words
# qualify; the filler docs have 5 words so they do NOT)


@pytest.fixture()
def docs_ds(ray_session):
    return ray.data.from_pandas(DOCS.copy()).repartition(4)


def _con():
    con = duckdb.connect()
    con.register("documents", DOCS)
    return con


class TestWordFreqTopK:
    def test_matches_duckdb(self, docs_ds):
        got = word_freq_topk(docs_ds, k=20)
        exp = _con().execute("""
            WITH words AS (SELECT unnest(list_filter(
              string_split_regex(text, '\\s+'), w -> w <> '')) AS word
              FROM documents)
            SELECT word, CAST(COUNT(*) AS BIGINT) AS total FROM words
            GROUP BY word ORDER BY total DESC, word ASC LIMIT 20
        """).df()
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)

    def test_tie_break_deterministic(self, docs_ds):
        # word0..word6 all appear ~86 times — ties must break on word ASC
        got = word_freq_topk(docs_ds, k=10)
        totals = got["total"].to_numpy()
        assert (totals[:-1] >= totals[1:]).all()
        for t in np.unique(totals):
            ws = got.loc[got["total"] == t, "word"].tolist()
            assert ws == sorted(ws)


class TestDecontaminate:
    def test_blocklist_contents(self, docs_ds):
        bl = build_blocklist(docs_ds, every=101, n_words=8)
        # docs 0, 101, 202, 303, 404, 505 selected; filler docs have
        # 5 words so only doc 0 qualifies
        assert bl == ["alpha beta gamma delta epsilon zeta eta theta"]

    def test_matches_duckdb(self, docs_ds):
        got = (decontaminate(docs_ds, every=101, n_words=8)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        exp = _con().execute("""
            WITH ws AS (SELECT doc_id, list_filter(
                string_split_regex(text, '\\s+'), w -> w <> '') AS ws
              FROM documents),
            bl AS (SELECT DISTINCT array_to_string(ws[1:8], ' ') AS phrase
                   FROM ws WHERE doc_id % 101 = 0 AND len(ws) >= 8)
            SELECT d.doc_id, CAST((SELECT COUNT(*) FROM bl
              WHERE strpos(d.text, bl.phrase) > 0) AS BIGINT) AS n_hits
            FROM documents d ORDER BY d.doc_id
        """).df()
        pd.testing.assert_frame_equal(got, exp)
        hits = got.set_index("doc_id")["n_hits"]
        assert hits[0] == 1 and hits[3] == 1 and hits[5] == 1  # planted
        assert hits[4] == 0 and hits[2] == 0


class TestSampleStratified:
    def test_matches_duckdb(self, docs_ds):
        from feasts_ray.oracle.simhash_sql import word_hash_expr

        got = (sample_stratified(docs_ds, rates={"en": 5}, default_rate=25)
               .to_pandas().sort_values("doc_id").reset_index(drop=True)
               [["doc_id", "lang", "source"]])
        exp = _con().execute(f"""
            SELECT doc_id, lang, source FROM documents
            WHERE {word_hash_expr("CAST(doc_id AS VARCHAR)")} % 100 <
              CASE WHEN lang = 'en' THEN 5 ELSE 25 END
            ORDER BY doc_id
        """).df()
        pd.testing.assert_frame_equal(got, exp)

    def test_rates_and_determinism(self, docs_ds):
        s1 = sample_stratified(docs_ds, rates={"en": 5}, default_rate=25
                               ).to_pandas().sort_values("doc_id")
        s2 = sample_stratified(docs_ds, rates={"en": 5}, default_rate=25
                               ).to_pandas().sort_values("doc_id")
        pd.testing.assert_frame_equal(s1.reset_index(drop=True),
                                      s2.reset_index(drop=True))
        n_en = len(DOCS[DOCS.lang == "en"])
        n_rest = len(DOCS) - n_en
        k_en = (s1.lang == "en").sum()
        k_rest = len(s1) - k_en
        # loose binomial bounds — deterministic, so these never flake
        assert 0 < k_en < 0.15 * n_en
        assert 0.12 * n_rest < k_rest < 0.40 * n_rest
