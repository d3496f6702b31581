"""Tests for dedup / ANN / text-analysis operators (training-data ops)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from feasts_ray.ann import topk_cosine, topk_cosine_lsh
from feasts_ray.dedup import (
    dedup_exact,
    embedding_dup_pairs,
    embedding_dup_pairs_exact,
    exact_groups,
    minhash_dedup_pairs,
    simhash_dedup_pairs,
)
from feasts_ray.dedup.hashing import (
    minhash_signature,
    perm_params,
    shingle_hashes,
    tokenize_batch,
)
from feasts_ray.text.analysis import (
    BpeishTokenCounter,
    add_fingerprint,
    add_langid,
    add_quality,
    add_token_counts,
)


def _doc_ds(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                                         "text": pa.array(texts)}))


BASE = ("the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark forest tonight").split()


def _mutate(words, n_swap, seed):
    rng = np.random.default_rng(seed)
    w = list(words)
    for _ in range(n_swap):
        i = int(rng.integers(0, len(w)))
        w[i] = f"tok{int(rng.integers(0, 1000))}"
    return w


class TestExactDedup:
    def test_groups_and_filter(self, ray_session):
        texts = ["aa bb cc", "dd ee ff", "aa bb cc", "gg hh", "aa bb cc"]
        ds = _doc_ds(texts)
        g = exact_groups(ds).to_pandas().sort_values("survivor_id")
        assert len(g) == 3
        row = g[g["n_copies"] == 3].iloc[0]
        assert row["survivor_id"] == 0
        kept = dedup_exact(ds).to_pandas()
        assert sorted(kept["doc_id"]) == [0, 1, 3]


class TestMinHash:
    def test_signature_jaccard_estimate(self):
        a, b = perm_params(256)
        w1, o1, _ = tokenize_batch([" ".join(BASE * 3)])
        w2, o2, _ = tokenize_batch([" ".join(_mutate(BASE * 3, 6, 1))])
        s1 = shingle_hashes(w1, 3)
        s2 = shingle_hashes(w2, 3)
        true_j = len(set(s1.tolist()) & set(s2.tolist())) / len(set(s1.tolist()) | set(s2.tolist()))
        sig1 = minhash_signature(s1, a, b)
        sig2 = minhash_signature(s2, a, b)
        est = float(np.mean(sig1 == sig2))
        assert abs(est - true_j) < 0.15

    def test_batch_signature_matches_scalar_with_empty_docs(self):
        """Empty docs anywhere in a batch (incl. trailing) must not
        perturb neighbours: reduceat runs over nonempty starts only."""
        from feasts_ray.dedup.hashing import minhash_signature_batch

        a, b = perm_params(64)
        texts = ["aa bb cc dd ee", "", "ff gg hh ii", "", ""]
        whash, offsets, _ = tokenize_batch(texts)
        shingle_lists = []
        for i in range(len(texts)):
            shingle_lists.append(shingle_hashes(whash[offsets[i]:offsets[i + 1]], 3))
        flat = np.concatenate(shingle_lists) if shingle_lists else np.array([], dtype=np.uint64)
        starts = np.concatenate([[0], np.cumsum([len(s) for s in shingle_lists])])
        batch_sigs = minhash_signature_batch(flat, starts, a, b)
        for i, s in enumerate(shingle_lists):
            np.testing.assert_array_equal(batch_sigs[i], minhash_signature(s, a, b))

    def test_tokenize_arrow_matches_split(self):
        """tokenize_arrow (utf8_split_whitespace + empty-drop) must equal
        tokenize_batch (str.split) — including leading/trailing/interior
        whitespace runs, exotic Unicode whitespace, nulls-as-empty, and
        chunked columns. The full-BMP codepoint sweep was run offline
        (zero diffs); this pins the regimes + a codepoint sample."""
        import pyarrow as pa

        from feasts_ray.dedup.hashing import tokenize_arrow

        ws_sample = ["\t", "\n", "\x0b", "\x1c", "\x85", "\xa0",
                     " ", " ", "　"]
        texts = ["", "  ", " a", "a ", "  a  b  ", "\r\na b\r\n", "one"]
        texts += [f"a{w}b{w}{w}c" for w in ws_sample]
        rng = np.random.default_rng(9)
        words = [f"w{i}" for i in range(7)]
        texts += [" ".join(rng.choice(words, size=int(rng.integers(0, 9))))
                  for _ in range(40)]
        w1, o1, c1 = tokenize_batch(texts)
        for col in (pa.array(texts),
                    pa.chunked_array([pa.array(texts[:11]),
                                      pa.array(texts[11:])])):
            w2, o2, c2 = tokenize_arrow(col)
            np.testing.assert_array_equal(w1, w2)
            np.testing.assert_array_equal(o1, o2)
            np.testing.assert_array_equal(c1, c2)
        # null text behaves as empty doc
        w3, o3, _ = tokenize_arrow(pa.array(["a b", None, "c"]))
        wr, orr, _ = tokenize_batch(["a b", "", "c"])
        np.testing.assert_array_equal(w3, wr)
        np.testing.assert_array_equal(o3, orr)

    def test_batch_shingles_match_scalar(self):
        """shingle_hashes_batch must be bit-identical to the per-doc
        kernel for every doc length regime: empty, shorter-than-k (the
        k=n whole-doc fallback), exactly k, and long."""
        from feasts_ray.dedup.hashing import shingle_hashes_batch

        rng = np.random.default_rng(3)
        words = [f"w{i}" for i in range(9)]
        texts = ["", "one", "one two", " ".join(BASE * 2)] + [
            " ".join(rng.choice(words, size=int(rng.integers(0, 14))))
            for _ in range(60)
        ]
        whash, offsets, _ = tokenize_batch(texts)
        for k in (2, 3, 5):
            flat, offs = shingle_hashes_batch(whash, offsets, k)
            assert offs[-1] == len(flat)
            for i in range(len(texts)):
                np.testing.assert_array_equal(
                    flat[offs[i]:offs[i + 1]],
                    shingle_hashes(whash[offsets[i]:offsets[i + 1]], k))

    def test_shingle_set_batch_blobs_sorted_unique(self):
        """shingle_set_batch's lexsort+from_buffers path must emit exactly
        np.unique(shingle_hashes(doc)) little-endian bytes per doc."""
        import pyarrow as pa

        from feasts_ray.dedup.minhash import shingle_set_batch

        rng = np.random.default_rng(5)
        words = [f"w{i}" for i in range(6)]
        texts = [" ".join(rng.choice(words, size=int(rng.integers(0, 12))))
                 for _ in range(80)]
        ids = np.arange(80, dtype=np.int64)
        wanted = np.sort(ids[::2])
        batch = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
        out = shingle_set_batch(batch, text_col="text", id_col="doc_id", k=3,
                                wanted_ref=wanted)
        sel = [int(i) for i in ids if int(i) in set(wanted.tolist())]
        whash, offsets, _ = tokenize_batch([texts[i] for i in sel])
        ref = [np.unique(shingle_hashes(whash[offsets[j]:offsets[j + 1]], 3))
               .astype("<i8").tobytes() for j in range(len(sel))]
        assert out["doc_id"].to_pylist() == sel
        assert out["shingles"].to_pylist() == ref

    def test_batch_signature_all_empty(self):
        from feasts_ray.dedup.hashing import MERSENNE31, minhash_signature_batch

        a, b = perm_params(16)
        starts = np.array([0, 0, 0], dtype=np.int64)
        out = minhash_signature_batch(np.array([], dtype=np.uint64), starts, a, b)
        assert (out == MERSENNE31).all()

    def test_pairs_found(self, ray_session):
        texts = [" ".join(BASE * 4)]
        texts.append(" ".join(_mutate(BASE * 4, 3, 2)))   # near-dup of 0
        texts += [" ".join(f"w{i}x{j}" for j in range(60)) for i in range(8)]
        out = minhash_dedup_pairs(_doc_ds(texts), threshold=0.5)
        assert isinstance(out, ray.data.Dataset)  # distributed end-to-end
        pairs = out.to_pandas()
        assert {(0, 1)} == set(zip(pairs["id_a"], pairs["id_b"]))
        assert pairs["jaccard"].iloc[0] > 0.5

    def test_exact_dup_full_jaccard(self, ray_session):
        texts = [" ".join(BASE * 4)] * 2 + [" ".join(f"q{i}" for i in range(50))]
        pairs = minhash_dedup_pairs(_doc_ds(texts), threshold=0.9).to_pandas()
        assert len(pairs) == 1 and pairs["jaccard"].iloc[0] == 1.0

    def test_no_pairs_empty_result(self, ray_session):
        """All-distinct corpus: empty result, no crash. (Ray 2.49 drops
        empty blocks, so the empty Dataset cannot carry its schema
        through to_pandas — only emptiness is asserted.)"""
        texts = [" ".join(f"u{i}v{j}" for j in range(40)) for i in range(6)]
        out = minhash_dedup_pairs(_doc_ds(texts), threshold=0.5)
        assert isinstance(out, ray.data.Dataset)
        assert len(out.to_pandas()) == 0

    def test_broadcast_and_attach_paths_agree(self, ray_session):
        """The bounded-candidate broadcast verify (default) and the
        fully distributed co-group attach verify (broadcast_budget=0
        forces it) return the identical pair set and jaccard values."""
        texts = [" ".join(BASE * 4), " ".join(_mutate(BASE * 4, 3, 2)),
                 " ".join(BASE * 4)]  # 0~1 near-dup, 0==2 exact
        texts += [" ".join(f"z{i}y{j}" for j in range(60)) for i in range(6)]
        fast = minhash_dedup_pairs(_doc_ds(texts), threshold=0.4).to_pandas()
        slow = minhash_dedup_pairs(_doc_ds(texts), threshold=0.4,
                                   broadcast_budget=0).to_pandas()
        f = fast.sort_values(["id_a", "id_b"], ignore_index=True)
        s = slow.sort_values(["id_a", "id_b"], ignore_index=True)
        assert len(f) == len(s) >= 3
        assert (f["id_a"].to_numpy() == s["id_a"].to_numpy()).all()
        assert (f["id_b"].to_numpy() == s["id_b"].to_numpy()).all()
        assert (f["jaccard"].to_numpy() == s["jaccard"].to_numpy()).all()


class TestSimHash:
    def test_identical_docs_zero_hamming(self, ray_session):
        texts = [" ".join(BASE * 3)] * 2 + [" ".join(f"z{i}" for i in range(80))]
        pairs = simhash_dedup_pairs(_doc_ds(texts), max_hamming=3)
        assert {(0, 1)} == set(zip(pairs["id_a"], pairs["id_b"]))
        assert pairs["hamming"].iloc[0] == 0

    def test_near_dup_low_hamming(self, ray_session):
        texts = [" ".join(BASE * 6), " ".join(_mutate(BASE * 6, 2, 3))]
        texts += [" ".join(f"r{i}s{j}" for j in range(70)) for i in range(5)]
        pairs = simhash_dedup_pairs(_doc_ds(texts), max_hamming=10)
        assert (0, 1) in set(zip(pairs["id_a"], pairs["id_b"]))


class TestEmbeddingDedup:
    def test_planted_near_dupes(self, ray_session):
        rng = np.random.default_rng(0)
        base = rng.standard_normal((40, 64))
        dup = base[:5] + 0.02 * rng.standard_normal((5, 64))  # cosine ~0.999
        m = np.concatenate([base, dup]).astype(np.float32)
        tbl = pa.table({
            "vec_id": pa.array(range(45), type=pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  type=pa.list_(pa.float32())),
        })
        pairs = embedding_dup_pairs(ray.data.from_arrow(tbl), threshold=0.98,
                                    n_bits=8, n_tables=8)
        got = set(zip(pairs["id_a"], pairs["id_b"]))
        assert {(i, 40 + i) for i in range(5)} <= got
        assert (pairs["cosine"] >= 0.98).all()


class TestEmbeddingDedupExact:
    def test_bitwise_vs_duckdb(self, ray_session):
        """The exact all-pairs kernel's sim column is bit-identical to
        DuckDB list_cosine_similarity (float32 sequential fold), and the
        pair SET is exact (every id_a<id_b with sim >= t, no LSH miss)."""
        import duckdb

        rng = np.random.default_rng(3)
        base = rng.standard_normal((60, 48))
        dup = base[:6] + 0.4 * rng.standard_normal((6, 48))
        m = np.concatenate([base, dup]).astype(np.float32)
        tbl = pa.table({
            "vec_id": pa.array(range(66), type=pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  type=pa.list_(pa.float32())),
        })
        got = embedding_dup_pairs_exact(
            ray.data.from_arrow(tbl), threshold=0.5,
            batch_size=17).to_pandas()  # odd batch: multi-batch path
        con = duckdb.connect()
        con.register("emb", tbl)
        want = con.execute(
            "SELECT a.vec_id id_a, b.vec_id id_b, "
            "list_cosine_similarity(a.embedding, b.embedding) sim "
            "FROM emb a JOIN emb b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.5e0"
        ).fetchdf()
        g = got.sort_values(["id_a", "id_b"], ignore_index=True)
        w = want.sort_values(["id_a", "id_b"], ignore_index=True)
        assert len(g) == len(w) and len(g) >= 6
        assert (g["id_a"].to_numpy() == w["id_a"].to_numpy()).all()
        assert (g["id_b"].to_numpy() == w["id_b"].to_numpy()).all()
        gs = g["sim"].to_numpy(np.float32).view(np.int32)
        ws = w["sim"].to_numpy(np.float32).view(np.int32)
        assert (gs == ws).all()

    def test_empty_and_no_pairs(self, ray_session):
        tbl = pa.table({
            "vec_id": pa.array([0, 1], type=pa.int64()),
            "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                                  type=pa.list_(pa.float32())),
        })
        out = embedding_dup_pairs_exact(ray.data.from_arrow(tbl),
                                        threshold=0.9)
        # schema is stable even with zero rows (to_pandas drops columns
        # of an all-empty Dataset — Ray quirk, so assert on the Dataset)
        assert out.schema().names == ["id_a", "id_b", "sim"]
        assert out.count() == 0


class TestANN:
    def _emb_ds(self, n=200, d=32, seed=1):
        rng = np.random.default_rng(seed)
        m = rng.standard_normal((n, d)).astype(np.float32)
        tbl = pa.table({
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  type=pa.list_(pa.float32())),
        })
        return ray.data.from_arrow(tbl), m

    def test_brute_matches_numpy(self, ray_session):
        ds, m = self._emb_ds()
        q = m[:3].astype(np.float64)
        out = topk_cosine(ds, q, k=5, batch_size=64)
        mn = m.astype(np.float64)
        mn /= np.linalg.norm(mn, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        sims = qn @ mn.T
        for qi in range(3):
            expect = np.argsort(-sims[qi], kind="stable")[:5]
            got = out[out["query_id"] == qi].sort_values("rank")["vec_id"].to_numpy()
            assert list(got) == list(expect)

    def test_lsh_recall_reasonable(self, ray_session):
        ds, m = self._emb_ds(400, 32)
        q = m[:5].astype(np.float64)
        exact = topk_cosine(ds, q, k=10, batch_size=128)
        approx = topk_cosine_lsh(ds, q, k=10, dim=32, n_bits=6, n_tables=12,
                                 batch_size=128)
        rec = []
        for qi in range(5):
            e = set(exact[exact["query_id"] == qi]["vec_id"])
            a = set(approx[approx["query_id"] == qi]["vec_id"])
            rec.append(len(e & a) / len(e))
        assert np.mean(rec) > 0.4  # self-match plus a sane fraction

    def test_lsh_finds_self(self, ray_session):
        ds, m = self._emb_ds(100, 32)
        out = topk_cosine_lsh(ds, m[:4].astype(np.float64), k=3, dim=32,
                              n_bits=8, n_tables=6, batch_size=64)
        for qi in range(4):
            top = out[(out["query_id"] == qi) & (out["rank"] == 1)]
            assert top["vec_id"].iloc[0] == qi


class TestTextAnalysis:
    def test_token_counts(self, ray_session):
        ds = _doc_ds(["a bb ccc", "one two", "x"])
        out = ds.map_batches(add_token_counts, batch_format="pyarrow").to_pandas()
        assert list(out.sort_values("doc_id")["n_words"]) == [3, 2, 1]
        assert list(out.sort_values("doc_id")["n_chars_calc"]) == [8, 7, 1]

    def test_token_counts_padded_and_empty(self, ray_session):
        """str.split() semantics: edge/extra whitespace and empty docs
        must not inflate n_words (regex split keeps empty edge tokens)."""
        ds = _doc_ds([" a  b ", "", "   ", "one\t two\n", "x"])
        out = ds.map_batches(add_token_counts, batch_format="pyarrow").to_pandas()
        got = list(out.sort_values("doc_id")["n_words"])
        assert got == [len(t.split()) for t in [" a  b ", "", "   ", "one\t two\n", "x"]]

    def test_quality_padded_docs_match_clean(self, ray_session):
        """Whitespace padding must not shift stopword_ratio via phantom
        empty words."""
        clean = "the cat is here"
        padded = "  the cat is here  "
        out = _doc_ds([clean, padded]).map_batches(
            add_quality, batch_format="pyarrow").to_pandas().sort_values("doc_id")
        assert out["stopword_ratio"].iloc[0] == out["stopword_ratio"].iloc[1]

    def test_bpeish_counter(self, ray_session):
        ds = _doc_ds(["hello world 123", "it's fine"])
        out = ds.map_batches(BpeishTokenCounter, fn_constructor_args=("text",),
                             batch_format="pyarrow", concurrency=1).to_pandas()
        assert (out["n_bpe_tokens"] > 0).all()
        assert out.sort_values("doc_id")["n_bpe_tokens"].iloc[0] == 3

    def test_bpe_count_matches_duckdb(self):
        """Kernel and DuckDB oracle share the same RE2 engine/pattern —
        counts must agree on adversarial whitespace/apostrophe strings
        (incl. the 'a \\tb' multi-whitespace case where the GPT-2
        lookahead variant would differ)."""
        import random
        import string

        import duckdb

        rng = random.Random(0)
        alpha = string.ascii_letters + string.digits + "  \t\n'.,!?-_#$%"
        texts = ["".join(rng.choice(alpha)
                         for _ in range(rng.randint(0, 200)))
                 for _ in range(500)]
        texts += ["", " ", "   ", "a  \tb", "x \t\ny", "it's we've i'll",
                  "trailing   ", "  leading", "'s", "a1b2 c3"]
        batch = pa.table({"doc_id": pa.array(range(len(texts))),
                          "text": pa.array(texts)})
        got = BpeishTokenCounter("text")(batch)["n_bpe_tokens"].to_pylist()
        con = duckdb.connect()
        con.register("documents", batch)
        ref = [r[0] for r in con.execute(
            "SELECT CAST(len(regexp_extract_all(text, "
            "'''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+"
            "| ?[^\\sA-Za-z0-9]+|\\s+')) AS BIGINT) "
            "FROM documents ORDER BY doc_id").fetchall()]
        assert got == ref

    def test_quality_and_langid(self, ray_session):
        en = "the cat is in the hat and it is a good day for the dog"
        de = "der hund ist nicht in das haus und die katze ist mit den"
        out = _doc_ds([en, de]).map_batches(add_quality, batch_format="pyarrow")
        out = out.map_batches(add_langid, batch_format="pyarrow").to_pandas()
        out = out.sort_values("doc_id")
        assert out["lang_pred"].tolist() == ["en", "de"]
        assert 0 <= out["quality_score"].iloc[0] <= 1
        assert out["stopword_ratio"].iloc[0] > 0.3

    def test_fingerprint_deterministic(self, ray_session):
        ds = _doc_ds(["alpha beta gamma", "alpha beta gamma", "other text"])
        out = ds.map_batches(add_fingerprint, batch_format="pyarrow").to_pandas()
        fp = out.sort_values("doc_id")["fingerprint"].tolist()
        assert fp[0] == fp[1] != fp[2]


class TestIVF:
    def test_ivf_recall_on_clusters(self, ray_session):
        """Clustered embeddings: IVF with enough probes finds the exact
        neighbors (cluster-mates live in probed cells)."""
        from feasts_ray.ann import topk_cosine_ivf

        rng = np.random.default_rng(5)
        centers = rng.standard_normal((8, 32)) * 4
        m = np.concatenate([c + 0.3 * rng.standard_normal((50, 32))
                            for c in centers]).astype(np.float32)
        tbl = pa.table({
            "vec_id": pa.array(range(len(m)), type=pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  type=pa.list_(pa.float32())),
        })
        ds = ray.data.from_arrow(tbl)
        q = m[[0, 50, 100]].astype(np.float64)
        exact = topk_cosine(ds, q, k=10, batch_size=128)
        approx = topk_cosine_ivf(ds, q, k=10, n_centroids=16, n_probe=4,
                                 batch_size=128)
        for qi in range(3):
            e = set(exact[exact["query_id"] == qi]["vec_id"])
            a = set(approx[approx["query_id"] == qi]["vec_id"])
            assert len(e & a) / len(e) >= 0.8
        for qi in range(3):
            top = approx[(approx["query_id"] == qi) & (approx["rank"] == 1)]
            assert top["vec_id"].iloc[0] == [0, 50, 100][qi]


class TestPersistedIndex:
    """Persisted IVF/LSH indexes: recall vs brute force + the read path
    actually prunes partitions (only probed cell/bucket dirs are read)."""

    @staticmethod
    def _clustered(n_centers=8, per=50, d=32, seed=5):
        rng = np.random.default_rng(seed)
        centers = rng.standard_normal((n_centers, d)) * 4
        m = np.concatenate([c + 0.3 * rng.standard_normal((per, d))
                            for c in centers]).astype(np.float32)
        tbl = pa.table({
            "vec_id": pa.array(range(len(m)), type=pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  type=pa.list_(pa.float32())),
        })
        return ray.data.from_arrow(tbl), m

    @staticmethod
    def _recall(approx, exact):
        rec = []
        for qi in sorted(exact["query_id"].unique()):
            e = set(exact[exact["query_id"] == qi]["vec_id"])
            a = set(approx[approx["query_id"] == qi]["vec_id"])
            rec.append(len(e & a) / len(e))
        return float(np.mean(rec))

    def test_ivf_index_recall_and_pruning(self, ray_session, tmp_path):
        import os

        from feasts_ray.ann import build_ivf_index, topk_cosine_ivf_index
        from feasts_ray.ann.index import _expand_partition_files

        ds, m = self._clustered()
        idx = str(tmp_path / "ivf")
        C = build_ivf_index(ds, idx, n_centroids=16, sample_size=400, seed=11)
        assert len(C) == 16
        cell_dirs = [d for d in os.listdir(f"{idx}/cells") if d.startswith("cell=")]
        assert len(cell_dirs) > 4  # clusters spread over many partitions
        q = m[[0, 50, 100]].astype(np.float64)
        exact = topk_cosine(ds, q, k=10, batch_size=128)
        approx = topk_cosine_ivf_index(idx, q, k=10, n_probe=4, batch_size=128)
        assert self._recall(approx, exact) >= 0.8
        # pruning: the probe touches fewer partition dirs than exist
        from feasts_ray.dedup.embedding import _normalize_rows
        qn = _normalize_rows(q)
        probes = np.argsort(-(qn @ C.T), axis=1)[:, :4]
        probed = {f"cell={c}" for c in np.unique(probes)}
        assert len(probed) < len(cell_dirs)
        all_files = _expand_partition_files(
            [f"{idx}/cells/{d}" for d in cell_dirs])
        probed_files = _expand_partition_files(
            [f"{idx}/cells/{d}" for d in sorted(probed)])
        assert 0 < len(probed_files) < len(all_files)

    def test_lsh_index_recall(self, ray_session, tmp_path):
        from feasts_ray.ann import build_lsh_index, topk_cosine_lsh_index

        ds, m = self._clustered()
        idx = str(tmp_path / "lsh")
        build_lsh_index(ds, idx, dim=32, n_bits=6, n_tables=8, seed=7)
        q = m[[0, 50, 100]].astype(np.float64)
        exact = topk_cosine(ds, q, k=10, batch_size=128)
        approx = topk_cosine_lsh_index(idx, q, k=10, batch_size=128)
        assert self._recall(approx, exact) >= 0.6
        for qi in range(3):
            top = approx[(approx["query_id"] == qi) & (approx["rank"] == 1)]
            assert top["vec_id"].iloc[0] == [0, 50, 100][qi]


class TestSkewAndEdges:
    def test_giant_duplicate_cluster_bounded(self, ray_session):
        """1000 identical docs: the per-bucket pair cap bounds the emitted
        candidate set (no quadratic blowup), exact dedup still keeps
        exactly one survivor, and every emitted pair verifies at 1.0."""
        texts = ["the exact same document body repeated many times over"] * 1000 \
            + ["something completely different here"]
        ds = _doc_ds(texts)
        groups = exact_groups(ds).to_pandas()
        assert len(groups) == 2
        big = groups[groups["n_copies"] == 1000]
        assert big["survivor_id"].iloc[0] == 0
        out = minhash_dedup_pairs(_doc_ds(texts), threshold=0.9,
                                  max_bucket=50)
        # the driver never holds the pair set: the verify is a
        # distributed join pipeline returning a Dataset
        assert isinstance(out, ray.data.Dataset)
        pairs = out.to_pandas()
        # cap: <= C(50,2) * n_bands pairs, deduped -> far below C(1000,2)
        assert 0 < len(pairs) < 25000
        assert (pairs["jaccard"] == 1.0).all()

    def test_dedup_exact_distributed_filter(self, ray_session):
        """The semi-join filter path keeps exactly the min-id survivors."""
        texts = ["a", "b", "a", "c", "b", "a", "d"]
        kept = dedup_exact(_doc_ds(texts)).to_pandas()
        assert sorted(kept["doc_id"]) == [0, 1, 3, 6]

    def test_cf_exact_path_short_series(self, ray_session):
        """Integer series shorter than lag_max: the exact-power-sum cf
        kernels cap lags at n-1 and stay finite."""
        import pandas as pd

        from feasts_ray.stages.cf import ACF, PACF

        df = pd.DataFrame({
            "key": ["k"] * 6,
            "t": range(6),
            "v": [3.0, 1.0, 4.0, 1.0, 5.0, 9.0],  # integral floats
        })
        ds = ray.data.from_pandas(df)
        acf_t = ACF(ds, "v", ["key"], time_col="t", lag_max=24).to_pandas()
        pacf_t = PACF(ds, "v", ["key"], time_col="t", lag_max=24).to_pandas()
        assert len(acf_t) == 5 and len(pacf_t) == 5  # capped at n-1
        assert np.isfinite(acf_t["acf"]).all()
        assert (acf_t["num_obs"] == 6).all()
        # lag-0-normalized: |acf| <= 1 for a real series
        assert (np.abs(acf_t["acf"]) <= 1.0 + 1e-12).all()


class TestNearDupClustering:
    def test_clique_and_isolated(self, ray_session):
        """3 identical docs cluster under the min id; distinct docs keep
        their own id as cluster."""
        from feasts_ray.dedup import minhash_dedup_docs

        texts = [" ".join(BASE * 4)] * 3 \
            + [" ".join(f"q{i}r{j}" for j in range(50)) for i in range(4)]
        out = minhash_dedup_docs(_doc_ds(texts), threshold=0.5).to_pandas()
        got = dict(zip(out["doc_id"], out["cluster_id"]))
        assert got[0] == got[1] == got[2] == 0
        for i in (3, 4, 5, 6):
            assert got[i] == i
        survivors = sorted(out[out["doc_id"] == out["cluster_id"]]["doc_id"])
        assert survivors == [0, 3, 4, 5, 6]

    def test_chain_needs_multiple_rounds(self, ray_session):
        """A~B and B~C near-dups with A!~C: one component {A,B,C} — the
        min label must propagate transitively (>1 round)."""
        from feasts_ray.dedup import connected_components

        import pyarrow as _pa
        edges = ray.data.from_arrow(_pa.table({
            "id_a": _pa.array([0, 1, 5], type=_pa.int64()),
            "id_b": _pa.array([1, 2, 6], type=_pa.int64()),
        }))
        nodes = ray.data.from_arrow(_pa.table({
            "doc_id": _pa.array([0, 1, 2, 5, 6, 9], type=_pa.int64())}))
        lab = connected_components(edges, nodes).to_pandas()
        got = dict(zip(lab["node"], lab["label"]))
        assert got[0] == got[1] == got[2] == 0  # chain collapses to min
        assert got[5] == got[6] == 5
        assert got[9] == 9  # isolated

    def test_embedding_clique_chain_isolated(self, ray_session):
        """embedding_dedup_docs: an identical-vector clique collapses to
        the min id; a cosine chain (0°/60°/120° in a plane: cos 60°=0.5
        links neighbours, cos 120°=-0.5 does not) clusters transitively;
        orthogonal vectors keep their own id."""
        from feasts_ray.dedup import embedding_dedup_docs

        import pyarrow as _pa

        dim = 8
        def vec(theta, axis=(0, 1)):
            v = np.zeros(dim, dtype=np.float32)
            v[axis[0]] = np.cos(theta)
            v[axis[1]] = np.sin(theta)
            return v

        base = vec(0.3)
        rows = [base, base, base,                       # ids 0-2: clique
                vec(0.0, (2, 3)), vec(np.pi / 3, (2, 3)),
                vec(2 * np.pi / 3, (2, 3)),             # ids 3-5: chain
                np.eye(dim, dtype=np.float32)[6],       # id 6: isolated
                np.eye(dim, dtype=np.float32)[7]]       # id 7: isolated
        ds = ray.data.from_arrow(_pa.table({
            "vec_id": _pa.array(range(8), type=_pa.int64()),
            "embedding": _pa.array([list(map(float, r)) for r in rows],
                                   type=_pa.list_(_pa.float32())),
        }))
        out = embedding_dedup_docs(ds, threshold=0.4).to_pandas()
        got = dict(zip(out["vec_id"], out["cluster_id"]))
        assert got[0] == got[1] == got[2] == 0
        assert got[3] == got[4] == got[5] == 3
        assert got[6] == 6 and got[7] == 7
        survivors = sorted(out[out["vec_id"] == out["cluster_id"]]["vec_id"])
        assert survivors == [0, 3, 6, 7]

    def test_long_chain_converges(self, ray_session):
        """Path graph: diameter >> 1 — pointer jumping converges in
        O(log diameter) rounds, not diameter rounds."""
        from feasts_ray.dedup import connected_components

        import pyarrow as _pa
        n = 9
        edges = ray.data.from_arrow(_pa.table({
            "id_a": _pa.array(list(range(n - 1)), type=_pa.int64()),
            "id_b": _pa.array(list(range(1, n)), type=_pa.int64()),
        }))
        nodes = ray.data.from_arrow(_pa.table({
            "doc_id": _pa.array(list(range(n)), type=_pa.int64())}))
        lab = connected_components(edges, nodes, max_rounds=6).to_pandas()
        assert (lab["label"] == 0).all()


class TestNgramJaccardExact:
    """Prefix-filtered exact all-pairs (dedup/ngram.py): recall must be
    exact BY CONSTRUCTION, including borderline pairs an LSH banding
    scheme catches only probabilistically."""

    @staticmethod
    def _corpus(n_base=40, n_borderline=12, seed=7):
        """Docs with planted pairs whose true 3-gram Jaccard straddles
        the 0.4 threshold (word-overlap fractions swept 0.35..0.75)."""
        rng = np.random.default_rng(seed)
        vocab = [f"w{i:04d}" for i in range(5000)]
        texts, ids = [], []
        did = 0
        for i in range(n_base):
            ws = rng.choice(vocab, size=60, replace=False)
            texts.append(" ".join(ws)); ids.append(did); did += 1
        for i in range(n_borderline):
            base = texts[i].split()
            keep = int(len(base) * (0.35 + 0.4 * i / max(n_borderline - 1, 1)))
            mut = list(base)
            repl = rng.choice(vocab, size=len(base) - keep, replace=False)
            for j, w in zip(range(keep, len(base)), repl):
                mut[j] = w
            texts.append(" ".join(mut)); ids.append(did); did += 1
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "text": pa.array(texts)})

    @staticmethod
    def _brute_pairs(tbl, threshold, k=3):
        from feasts_ray.dedup.hashing import (shingle_hashes_batch,
                                              tokenize_arrow)
        whash, offsets, _ = tokenize_arrow(tbl["text"].combine_chunks())
        sh, soffs = shingle_hashes_batch(whash, offsets, k)
        sets = [np.unique(sh[soffs[i]:soffs[i + 1]]) for i in range(len(tbl))]
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        out = []
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                ni = len(np.intersect1d(sets[i], sets[j], assume_unique=True))
                un = len(sets[i]) + len(sets[j]) - ni
                jac = ni / un if un else 0.0
                if jac >= threshold:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    out.append((a, b, jac))
        return sorted(out)

    def test_exact_recall_and_precision_borderline(self, ray_session):
        from feasts_ray.dedup.ngram import ngram_jaccard_pairs

        tbl = self._corpus()
        exp = self._brute_pairs(tbl, 0.4)
        assert len(exp) >= 4  # planted sweep must produce >=0.4 pairs
        got = (ngram_jaccard_pairs(ray.data.from_arrow(tbl), threshold=0.4)
               .to_pandas().sort_values(["id_a", "id_b"], ignore_index=True))
        assert [(a, b) for a, b, _ in exp] == list(
            zip(got["id_a"], got["id_b"]))
        for (_, _, j), gj in zip(exp, got["jaccard"]):
            assert np.float64(j).view(np.int64) == np.float64(gj).view(np.int64)

    def test_prefix_rows_bounded(self):
        """Prefix emission must emit ~(1 - t/(1+t)) of each doc's
        shingles, never the full set."""
        from feasts_ray.dedup.ngram import prefix_emit_batch

        tbl = self._corpus(n_base=10, n_borderline=0)
        out = prefix_emit_batch(tbl, text_col="text", id_col="doc_id", k=3,
                                threshold=0.5)
        n_sh = sum(len(t.split()) - 2 for t in tbl["text"].to_pylist())
        # t'=1/3 -> prefix ~= 2/3 of each set (+1); well under the total
        assert len(out) < 0.75 * n_sh
        assert len(out) > 0.5 * n_sh

    def test_overflow_error_not_silent_truncation(self, ray_session):
        from feasts_ray.dedup.ngram import ngram_jaccard_pairs

        texts = ["alpha beta gamma " + f"tail{i}" for i in range(40)]
        tbl = pa.table({"doc_id": pa.array(range(40), type=pa.int64()),
                        "text": pa.array(texts)})
        with pytest.raises(Exception, match="max_bucket"):
            ngram_jaccard_pairs(ray.data.from_arrow(tbl), threshold=0.4,
                                max_bucket=5).materialize()
