"""MinHash + LSH near-duplicate detection (shingle -> minhash -> band ->
bucket-groupby -> candidate pairs -> Jaccard verify).

Scale shape:
  1. signature stage — stateless map_batches over Arrow; per-batch work is
     vectorized (vocabulary-level digests + numpy shingle/perm grids).
     Only (doc_id, band_id, band_hash) rows leave the stage: 24 bytes per
     (doc, band), never the text or the full signature.
  2. ONE shuffle: groupby (band_id, band_hash); buckets with >1 doc emit
     candidate pairs (pair list is capped per bucket to bound giant-bucket
     blowup; cap documented in the output).
  3. verify stage — exact n-gram Jaccard per candidate pair. Pair texts
     are fetched via a broadcast id->shingle-set lookup built from a
     second pass over only the candidate doc ids (small side; ray.put
     once per run, read zero-copy in every task).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .hashing import (
    band_hashes_batch,
    minhash_signature_batch,
    perm_params,
    shingle_hashes,
    tokenize_batch,
)


class BandEmitter:
    """Actor-pool kernel: text -> (doc_id, band, band_hash) rows.

    Permutation parameters are built once per actor in __init__."""

    def __init__(self, text_col: str, id_col: str, k: int, num_perm: int,
                 n_bands: int, seed: int):
        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        self.a, self.b = perm_params(num_perm, seed)
        self.n_bands = n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n = len(texts)
        if n == 0:
            return pa.table({
                self.id_col: pa.array([], type=batch[self.id_col].type),
                "band": pa.array([], type=pa.int64()),
                "band_hash": pa.array([], type=pa.int64()),
            })
        whash, offsets, _ = tokenize_batch(texts)
        # per-doc shingle streams (vectorized inside), then ONE batch-wide
        # permutation grid + reduceat for all signatures and a vectorized
        # band mix — no per-doc Python in the hash math
        sh_list = [shingle_hashes(whash[offsets[i]:offsets[i + 1]], self.k)
                   for i in range(n)]
        counts = np.fromiter((len(s) for s in sh_list), dtype=np.int64, count=n)
        starts = np.concatenate([[0], np.cumsum(counts)])
        flat = (np.concatenate(sh_list) if starts[-1]
                else np.array([], dtype=np.uint64))
        sigs = minhash_signature_batch(flat, starts, self.a, self.b)
        bh = band_hashes_batch(sigs, self.n_bands)
        return pa.table({
            self.id_col: pa.array(np.repeat(ids, self.n_bands)),
            "band": pa.array(np.tile(np.arange(self.n_bands, dtype=np.int64), n)),
            "band_hash": pa.array(bh.reshape(-1).astype(np.int64)),
        })


class CandidateShingles:
    """Distributed verify pre-pass: emit (doc_id, shingle hashes) for
    candidate doc ids ONLY. The sorted candidate-id array (small) is
    broadcast once via ray.put and resolved once per actor in __init__ —
    the full corpus is scanned by the cluster, never by the driver."""

    def __init__(self, text_col: str, id_col: str, k: int, wanted_ref):
        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        self.wanted = (ray.get(wanted_ref)
                       if isinstance(wanted_ref, ray.ObjectRef) else wanted_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        if len(self.wanted):
            pos = np.clip(np.searchsorted(self.wanted, ids), 0,
                          len(self.wanted) - 1)
            mask = self.wanted[pos] == ids
        else:
            mask = np.zeros(len(ids), dtype=bool)
        empty = pa.table({
            self.id_col: pa.array([], type=batch[self.id_col].type),
            "shingles": pa.array([], type=pa.list_(pa.int64())),
        })
        if not mask.any():
            return empty
        texts = [t for t, m in zip(batch[self.text_col].to_pylist(), mask) if m]
        whash, offsets, _ = tokenize_batch(texts)
        sets = [
            np.unique(shingle_hashes(whash[offsets[j]:offsets[j + 1]], self.k))
            .astype(np.int64)
            for j in range(len(texts))
        ]
        return pa.table({
            self.id_col: pa.array(ids[mask]),
            "shingles": pa.array([s.tolist() for s in sets],
                                 type=pa.list_(pa.int64())),
        })


def _shingle_sets(ds, text_col, id_col, k, wanted: set,
                  batch_size: int = 1024, concurrency=(1, 8)) -> dict:
    """doc_id -> shingle set for candidate docs, via a distributed
    map_batches pass (only candidate rows come back to the driver)."""
    wanted_arr = np.array(sorted(int(w) for w in wanted), dtype=np.int64)
    shing = ds.select_columns([id_col, text_col]).map_batches(
        CandidateShingles,
        fn_constructor_args=(text_col, id_col, k, ray.put(wanted_arr)),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    sets: dict = {}
    for batch in shing.iter_batches(batch_format="pyarrow"):
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        for j, did in enumerate(ids):
            sets[int(did)] = set(batch["shingles"][j].as_py())
    return sets


def minhash_dedup_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 128,
    n_bands: int = 16,
    threshold: float = 0.5,
    seed: int = 1,
    max_bucket: int = 200,
    batch_size: int = 256,
    concurrency=(1, 8),
) -> pd.DataFrame:
    """Near-dup pairs (id_a < id_b) with exact n-gram Jaccard >= threshold.

    Returns a pandas DataFrame (pair sets are small relative to input).
    """
    from .pairs import emit_candidate_pairs

    bands = ds.map_batches(
        BandEmitter,
        fn_constructor_args=(text_col, id_col, k, num_perm, n_bands, seed),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    pdf = emit_candidate_pairs(bands, ["band", "band_hash"], id_col,
                               max_bucket=max_bucket)
    if len(pdf) == 0:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64"),
                             "jaccard": pd.Series(dtype="float64")})
    wanted = set(pdf["id_a"]).union(pdf["id_b"])
    sets = _shingle_sets(ds, text_col, id_col, k, wanted)
    jac = np.empty(len(pdf))
    for i, (a_, b_) in enumerate(zip(pdf["id_a"], pdf["id_b"])):
        sa, sb = sets.get(int(a_), set()), sets.get(int(b_), set())
        u = len(sa | sb)
        jac[i] = (len(sa & sb) / u) if u else 0.0
    pdf["jaccard"] = jac
    out = pdf[pdf["jaccard"] >= threshold].reset_index(drop=True)
    return out.sort_values(["id_a", "id_b"], ignore_index=True)


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    **kwargs,
) -> pd.DataFrame:
    """Exact word-n-gram Jaccard near-dup pairs. Candidate generation is
    MinHash+LSH (recall tuned by num_perm/n_bands kwargs); every candidate
    is verified with the EXACT shingle-set Jaccard, so precision is exact
    and the returned `jaccard` column is the true similarity."""
    return minhash_dedup_pairs(ds, text_col=text_col, id_col=id_col, k=k,
                               threshold=threshold, **kwargs)
