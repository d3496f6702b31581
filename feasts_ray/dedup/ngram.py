"""Exact n-gram Jaccard near-dup pairs with EXACT recall by construction.

Candidate generation is prefix filtering (Chaudhuri/Ganti/Kaushik,
SSJoin ICDE'06; Bayardo/Ma/Srikant "Scaling Up All Pairs", WWW'07):
fix ANY global total order on shingles (here: the 64-bit shingle hash,
ascending) and let every doc emit only the first

    ell = m - ceil(t' * m) + 1,   t' = threshold / (1 + threshold)

of its m sorted-unique shingles. Any pair with Jaccard >= threshold
MUST share an emitted shingle:

  J(A,B) >= t  =>  |A n B| >= t/(1+t) * (|A| + |B|)  (union <= |A|+|B|-O).
  If the prefixes were disjoint, every common shingle would sit in A's
  suffix or in B's suffix, so |A n B| <= (ceil(t'|A|)-1) + (ceil(t'|B|)-1)
  < t'(|A|+|B|) <= |A n B| — contradiction.

So the candidate set (pairs sharing a prefix shingle, found with the
same bounded-group bucket machinery as LSH — bucket = shingle hash) has
recall 1 with NO probabilistic caveat, unlike MinHash banding. Every
candidate is then verified with the exact shingle-set Jaccard (shared
verify tail with dedup/minhash.py), so precision is exact too: the
output IS the true pair set at the threshold.

Scale shape: one corpus scan emits ~(1-t')·|shingles| prefix rows; the
pair stage is the bounded-group shuffle of dedup/pairs.py. A pathological
shingle shared by d docs costs O(d^2) pairs — the prefix filter bounds
this in practice (a doc's COMMONEST shingles are the ones most likely
outside its prefix only under a rarity order; with hash order the cap is
`max_bucket`, and oversized buckets RAISE instead of silently truncating
so exactness can never quietly degrade). The size filter
t·|B| <= |A| <= |B|/t prunes candidates in-kernel before the verify.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .hashing import shingle_hashes_batch, tokenize_arrow
from .minhash import exact_jaccard_verify
from .pairs import emit_candidate_pairs_ds


def prefix_emit_batch(batch: pa.Table, *, text_col: str, id_col: str, k: int,
                      threshold: float) -> pa.Table:
    """Task-pool kernel: (id, text) rows -> (sh, id) prefix rows.

    Per doc: sorted-unique shingle-hash set (ONE batch lexsort +
    adjacent dedupe, same kernel shape as minhash.shingle_set_batch),
    then the first ``m - ceil(t'*m) + 1`` hashes in ascending order
    (the global total order) are emitted. No per-doc Python. A plain
    function (its only state is two scalars), so the corpus scan is an
    elastic task pool, never capped by an actor-pool size."""
    tp = threshold / (1.0 + threshold)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    nd = len(ids)
    if nd == 0:
        return pa.table({
            "sh": pa.array([], type=pa.int64()),
            id_col: pa.array([], type=batch[id_col].type),
        })
    whash, offsets, _ = tokenize_arrow(batch[text_col])
    sh, soffs = shingle_hashes_batch(whash, offsets, k)
    doc_of = np.repeat(np.arange(nd), np.diff(soffs))
    order = np.lexsort((sh, doc_of))
    sh_s, doc_s = sh[order], doc_of[order]
    keep = np.ones(len(sh_s), dtype=bool)
    keep[1:] = (sh_s[1:] != sh_s[:-1]) | (doc_s[1:] != doc_s[:-1])
    sh_u, doc_u = sh_s[keep], doc_s[keep]
    m = np.bincount(doc_u, minlength=nd)             # set sizes
    ell = m - np.ceil(tp * m).astype(np.int64) + 1
    u_offs = np.concatenate([[0], np.cumsum(m)])
    intra = np.arange(len(sh_u)) - u_offs[:-1][doc_u]
    pref = intra < ell[doc_u]                        # first ell per doc
    return pa.table({
        "sh": pa.array(sh_u[pref].astype(np.int64)),
        id_col: pa.array(ids[doc_u[pref]]),
    })


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 100_000,
    batch_size: int = 256,
    concurrency: int | None = None,
    broadcast_budget: int = 256 << 20,
) -> "ray.data.Dataset":
    """All pairs (id_a < id_b) with exact word-``k``-gram Jaccard >=
    ``threshold`` — recall AND precision exact (module docstring).

    corpus scan (prefix_emit_batch) -> bounded-group shared-shingle
    pairs (overflow=error: never silently truncates) -> shared adaptive
    exact-Jaccard verify (dedup/minhash.py)."""
    prefix = ds.select_columns([id_col, text_col]).map_batches(
        prefix_emit_batch,
        fn_kwargs=dict(text_col=text_col, id_col=id_col, k=k,
                       threshold=threshold),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
    # dedup=False: the verify tail dedups where it is cheapest
    pairs = emit_candidate_pairs_ds(prefix, ["sh"], id_col,
                                    max_bucket=max_bucket, dedup=False,
                                    overflow="error").materialize()
    return exact_jaccard_verify(pairs, ds, text_col=text_col, id_col=id_col,
                                k=k, threshold=threshold,
                                batch_size=batch_size,
                                concurrency=concurrency,
                                broadcast_budget=broadcast_budget)
