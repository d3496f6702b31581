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
  3. verify stage — exact n-gram Jaccard per candidate pair, ADAPTIVE:
     when the candidate docs' shingle payload fits a broadcast budget
     (default 256 MB) the pack rides ONE ray.put and every pair verifies
     in a single map_batches (zero attach shuffles; only a tiny
     post-verify dedup groupby remains). Past the budget — heavy
     duplication at 100 TB — the fully distributed path runs: two
     bounded-group hash co-groups attach sh_a/sh_b to each pair, then
     in-kernel Jaccard. Either way no unbounded pair list or shingle map
     ever materializes on the driver (the budget is the explicit bound).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..state.broadcast import put_once, resolve_broadcast
from .hashing import (
    band_hashes_batch,
    minhash_signature_batch,
    perm_params,
    shingle_hashes_batch,
    tokenize_arrow,
)


def band_emit_batch(batch: pa.Table, *, text_col: str, id_col: str, k: int,
                    a: np.ndarray, b: np.ndarray, n_bands: int) -> pa.Table:
    """Task-pool kernel: text -> (doc_id, band, band_hash) rows.

    A plain function, not an actor class: the permutation parameters
    (two ~1 KB uint64 arrays) ride fn_kwargs, so the stage scales
    elastically with the cluster instead of being capped by an actor
    pool — on a 256-node cluster an actor cap WOULD be the bottleneck,
    and on small runs pool spin-up dominated the stage wall."""
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    n = len(ids)
    if n == 0:
        return pa.table({
            id_col: pa.array([], type=batch[id_col].type),
            "band": pa.array([], type=pa.int64()),
            "band_hash": pa.array([], type=pa.int64()),
        })
    whash, offsets, _ = tokenize_arrow(batch[text_col])
    # ONE flat batched shingle fold, then ONE batch-wide permutation
    # grid + reduceat for all signatures and a vectorized band mix —
    # no per-doc Python in the hash math
    flat, starts = shingle_hashes_batch(whash, offsets, k)
    sigs = minhash_signature_batch(flat, starts, a, b)
    bh = band_hashes_batch(sigs, n_bands)
    return pa.table({
        id_col: pa.array(np.repeat(ids, n_bands)),
        "band": pa.array(np.tile(np.arange(n_bands, dtype=np.int64), n)),
        "band_hash": pa.array(bh.reshape(-1).astype(np.int64)),
    })


def shingle_set_batch(batch: pa.Table, *, text_col: str, id_col: str, k: int,
                      wanted_ref) -> pa.Table:
    """Verify pre-pass kernel: (id, text) rows -> (id, sorted unique
    shingle-hash set packed as little-endian int64 bytes) for CANDIDATE
    docs only. The sorted candidate-id array (8 B/id, small) is broadcast
    once via ray.put and resolved once per worker process — the corpus
    is scanned (never shuffled) and non-candidate rows are dropped at the
    batch with a vectorized searchsorted."""
    wanted = resolve_broadcast(wanted_ref)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    if len(wanted):
        pos = np.clip(np.searchsorted(wanted, ids), 0, len(wanted) - 1)
        mask = wanted[pos] == ids
    else:
        mask = np.zeros(len(ids), dtype=bool)
    if not mask.any():
        return pa.table({
            id_col: pa.array([], type=batch[id_col].type),
            "shingles": pa.array([], type=pa.large_binary()),
        })
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    whash, offsets, _ = tokenize_arrow(col.filter(pa.array(mask)))
    nd = int(mask.sum())
    # flat batched shingles -> per-doc sorted-unique via ONE lexsort
    # over (doc, hash) + adjacent-dedupe (identical values/order to
    # np.unique per doc), then the large_binary column is built from
    # the flat "<i8" buffer + byte offsets — zero per-doc Python
    sh, soffs = shingle_hashes_batch(whash, offsets, k)
    doc_of = np.repeat(np.arange(nd), np.diff(soffs))
    order = np.lexsort((sh, doc_of))
    sh_s, doc_s = sh[order], doc_of[order]
    keep = np.ones(len(sh_s), dtype=bool)
    keep[1:] = (sh_s[1:] != sh_s[:-1]) | (doc_s[1:] != doc_s[:-1])
    sh_u, doc_u = sh_s[keep], doc_s[keep]
    u_offs = np.concatenate(
        [[0], np.cumsum(np.bincount(doc_u, minlength=nd))])
    blobs = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), nd,
        [None, pa.py_buffer((u_offs * 8).astype(np.int64).tobytes()),
         pa.py_buffer(sh_u.astype("<i8").tobytes())])
    return pa.table({id_col: pa.array(ids[mask]),
                     "shingles": blobs})


_MIX = np.uint64(0x9E3779B97F4A7C15)


def _collect_shingle_pack(shingles: "ray.data.Dataset", id_col: str,
                          budget_bytes: int):
    """Stream the (id, blob) shingle Dataset into (sorted ids, offsets,
    packed int64 values) for the broadcast fast path. Returns None when
    the payload exceeds ``budget_bytes`` — the caller then takes the
    fully distributed attach path. Cheap pre-check first: ``shingles``
    is materialized, so size_bytes() answers without pulling a single
    block to the driver; the in-stream check is the exact backstop.
    Transient driver memory on the accepted path is ~2x the payload
    (chunk views + the sorted gather output)."""
    if shingles.size_bytes() > budget_bytes:
        return None
    ids_c, blobs_c, total = [], [], 0
    for b in shingles.iter_batches(batch_format="pyarrow"):
        ids_c.append(b[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
        col = b["shingles"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # large_binary buffers: int64 byte offsets + packed blob data —
        # every blob is a multiple of 8 bytes (sorted int64 hashes), so
        # the data buffer is one contiguous int64 view
        _, obuf, dbuf = col.buffers()
        boffs = np.frombuffer(obuf, dtype=np.int64)[
            col.offset:col.offset + len(col) + 1]
        lens = np.diff(boffs) // 8
        vals = np.frombuffer(dbuf, dtype="<i8", count=int(lens.sum()),
                             offset=int(boffs[0]))
        blobs_c.append((vals, lens))
        total += vals.nbytes
        if total > budget_bytes:
            return None
    if not ids_c:
        return (np.array([], dtype=np.int64), np.array([0], dtype=np.int64),
                np.array([], dtype=np.int64))
    ids = np.concatenate(ids_c)
    lens = np.concatenate([l for _, l in blobs_c])
    packed = np.concatenate([v for v, _ in blobs_c])
    del ids_c, blobs_c
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    starts = np.concatenate([[0], np.cumsum(lens)])
    offs = np.concatenate([[0], np.cumsum(lens[order])])
    # vectorized gather into sorted-id order: element i of blob j maps to
    # packed[starts[order[j]] + i] — one C-speed fancy index, no per-doc
    # Python loop (O(#candidate docs) interpreter iterations otherwise)
    lo = lens[order]
    idx = (np.repeat(starts[order] - offs[:-1], lo)
           + np.arange(int(offs[-1]), dtype=np.int64))
    return ids, offs, packed[idx]


def _attach_blobs(pairs: "ray.data.Dataset", shingles: "ray.data.Dataset",
                  key_col: str, out_col: str, id_col: str,
                  carry_cols: list[str], num_groups: int = 64,
                  dedup_pairs: bool = False) -> "ray.data.Dataset":
    """Distributed equi-attach of (doc_id, shingles-blob) rows onto pair
    rows via pairs[key_col] == shingles[doc_id] — a hash co-group with a
    BOUNDED group count (same trick as dedup/pairs.py), not Dataset.join:
    Ray 2.49's hash-join aggregator crashes on partitions that receive no
    blocks (zero-column empty tables), which small/skewed inputs hit.
    Inside each group the match is one vectorized argsort+searchsorted."""

    def _tag_pairs(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in carry_cols}
        cols["_k"] = batch[key_col]
        cols["_blob"] = pa.nulls(len(batch), pa.large_binary())
        cols["_kind"] = pa.array(np.zeros(len(batch), dtype=np.int8))
        return pa.table(cols)

    def _tag_shingles(batch: pa.Table) -> pa.Table:
        cols = {}
        for c in carry_cols:
            cols[c] = (pa.nulls(len(batch), pa.int64()) if c.startswith("id_")
                       else pa.nulls(len(batch), pa.large_binary()))
        cols["_k"] = batch[id_col]
        cols["_blob"] = batch["shingles"]
        cols["_kind"] = pa.array(np.ones(len(batch), dtype=np.int8))
        return pa.table(cols)

    def _add_group(batch: pa.Table) -> pa.Table:
        k = batch["_k"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = ((k.view(np.uint64) * _MIX) % np.uint64(num_groups)).astype(np.int64)
        return batch.append_column("_g", pa.array(g, type=pa.int64()))

    def _merge(group: pa.Table) -> pa.Table:
        kind = group["_kind"].to_numpy(zero_copy_only=False)
        keys = group["_k"].to_numpy(zero_copy_only=False)
        sh_idx = np.flatnonzero(kind == 1)
        pr_idx = np.flatnonzero(kind == 0)
        out_schema = pa.schema(
            [(c, pa.int64() if c.startswith("id_") else pa.large_binary())
             for c in carry_cols] + [(out_col, pa.large_binary())])
        if len(sh_idx) == 0 or len(pr_idx) == 0:
            return out_schema.empty_table()
        if dedup_pairs:
            # duplicate (id_a,id_b) rows from different bands share the
            # same group (key is a function of id_a) — dedup here instead
            # of a dedicated upstream groupby (saves one all-to-all)
            ab = np.stack([
                group["id_a"].to_numpy(zero_copy_only=False)[pr_idx],
                group["id_b"].to_numpy(zero_copy_only=False)[pr_idx],
            ], axis=1)
            _, first = np.unique(ab, axis=0, return_index=True)
            pr_idx = pr_idx[np.sort(first)]
        sk = keys[sh_idx]
        order = np.argsort(sk, kind="stable")
        sk_sorted = sk[order]
        pos = np.clip(np.searchsorted(sk_sorted, keys[pr_idx]), 0, len(sk_sorted) - 1)
        matched = sk_sorted[pos] == keys[pr_idx]
        take_pr = pr_idx[matched]
        take_sh = sh_idx[order[pos[matched]]]
        blob_col = group["_blob"]
        if isinstance(blob_col, pa.ChunkedArray):
            blob_col = blob_col.combine_chunks()
        cols = {c: group[c].take(pa.array(take_pr)) for c in carry_cols}
        cols[out_col] = blob_col.take(pa.array(take_sh))
        return pa.table(cols).cast(out_schema)

    tagged = (pairs.map_batches(_tag_pairs, batch_format="pyarrow")
              .union(shingles.map_batches(_tag_shingles, batch_format="pyarrow"))
              .map_batches(_add_group, batch_format="pyarrow"))
    return tagged.groupby("_g").map_groups(_merge, batch_format="pyarrow")


def _pairwise_jaccard(va: np.ndarray, a_lens: np.ndarray,
                      vb: np.ndarray, b_lens: np.ndarray) -> np.ndarray:
    """Exact Jaccard for N pairs of sorted-unique int64 sets stored as
    flat value arrays + per-pair lengths. Per pair this is one C-speed
    np.intersect1d over contiguous zero-copy slices.

    MEASURED AND REJECTED (don't retry): a fully vectorized batch-level
    lexsort((vals, pair)) + adjacent-duplicate count was 20x SLOWER at
    100k pairs (32 s vs 1.6 s) — one giant two-key indirect sort loses
    badly to many tiny cache-resident sorts. A per-pair searchsorted
    merge was a wash (0.95x): interpreter overhead, not the set math,
    is the per-pair cost, and it is already only ~15 us/pair."""
    n = len(a_lens)
    jac = np.empty(n)
    ao = np.concatenate([[0], np.cumsum(a_lens)])
    bo = np.concatenate([[0], np.cumsum(b_lens)])
    for i in range(n):
        a_ = va[ao[i]:ao[i + 1]]
        b_ = vb[bo[i]:bo[i + 1]]
        inter = len(np.intersect1d(a_, b_, assume_unique=True))
        union = len(a_) + len(b_) - inter
        jac[i] = inter / union if union else 0.0
    return jac


def _gather_slices(packed: np.ndarray, starts: np.ndarray,
                   lens: np.ndarray) -> np.ndarray:
    """Concatenate packed[starts[i]:starts[i]+lens[i]] for all i with one
    fancy index (no per-row Python)."""
    out_offs = np.concatenate([[0], np.cumsum(lens)])
    total = int(out_offs[-1])
    if total == 0:
        return np.empty(0, dtype=packed.dtype)
    idx = (np.repeat(starts - out_offs[:-1], lens)
           + np.arange(total, dtype=np.int64))
    return packed[idx]


def _blob_int64(col) -> tuple[np.ndarray, np.ndarray]:
    """large_binary column of packed little-endian int64 sets ->
    (flat values, per-row lengths) straight off the Arrow buffers."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty(0, dtype="<i8"), np.empty(0, dtype=np.int64)
    _, obuf, dbuf = col.buffers()
    boffs = np.frombuffer(obuf, dtype=np.int64)[
        col.offset:col.offset + len(col) + 1]
    lens = np.diff(boffs) // 8
    if dbuf is None or lens.sum() == 0:
        return np.empty(0, dtype="<i8"), lens
    vals = np.frombuffer(dbuf, dtype="<i8", count=int(lens.sum()),
                         offset=int(boffs[0]))
    return vals, lens


def _pack_rows(ids: np.ndarray, id_arr: np.ndarray) -> np.ndarray:
    pos = np.searchsorted(ids, id_arr)
    if (pos >= len(ids)).any() or (ids[pos] != id_arr).any():
        raise KeyError("candidate id missing from broadcast shingle pack")
    return pos


def broadcast_jaccard_batch(batch: pa.Table, *, pack_ref) -> pa.Table:
    """Verify kernel for the bounded-candidate fast path: the candidate
    docs' shingle sets ride ONE ray.put as (sorted ids, offsets, packed
    int64 values) and each pair batch verifies against zero-copy slices
    of the shared pack — no attach shuffle at all. Only used when the
    pack fits the broadcast budget; past that the distributed co-group
    attach path runs instead. Task-pool function: the pack resolves once
    per worker process (state/broadcast.py LRU), so the stage scales
    with the cluster instead of an actor-pool cap."""
    ids, offs, packed = resolve_broadcast(pack_ref)
    n = len(batch)
    if n == 0:
        return pa.table({"id_a": pa.array([], type=pa.int64()),
                         "id_b": pa.array([], type=pa.int64()),
                         "jaccard": pa.array([], type=pa.float64())})
    ia = batch["id_a"].to_numpy(zero_copy_only=False)
    ib = batch["id_b"].to_numpy(zero_copy_only=False)
    ra, rb = _pack_rows(ids, ia), _pack_rows(ids, ib)
    a_lens = offs[ra + 1] - offs[ra]
    b_lens = offs[rb + 1] - offs[rb]
    jac = _pairwise_jaccard(_gather_slices(packed, offs[ra], a_lens),
                            a_lens,
                            _gather_slices(packed, offs[rb], b_lens),
                            b_lens)
    return pa.table({"id_a": batch["id_a"], "id_b": batch["id_b"],
                     "jaccard": pa.array(jac, type=pa.float64())})


def _jaccard_verify_batch(batch: pa.Table, threshold: float) -> pa.Table:
    """(id_a, id_b, sh_a, sh_b) -> pairs with exact Jaccard >= threshold.
    Shingle blobs decode zero-copy off the Arrow buffers into flat
    sorted-unique int64 sets; the whole batch verifies in one vectorized
    lexsort merge (no per-pair Python)."""
    va, a_lens = _blob_int64(batch["sh_a"])
    vb, b_lens = _blob_int64(batch["sh_b"])
    jac = _pairwise_jaccard(va, a_lens, vb, b_lens)
    keep = jac >= threshold
    out = pa.table({
        "id_a": batch["id_a"],
        "id_b": batch["id_b"],
        "jaccard": pa.array(jac, type=pa.float64()),
    })
    return out.filter(pa.array(keep))


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
    concurrency: int | None = None,
    broadcast_budget: int = 256 << 20,
) -> "ray.data.Dataset":
    """Near-dup pairs (id_a < id_b) with exact n-gram Jaccard >= threshold.

    Shared front: bands -> bounded-group candidate pairs (Dataset)
      -> candidate-id array broadcast (ray.put; 8 B per candidate doc)
      -> corpus SCAN computes shingle sets for candidate docs only
         (vectorized searchsorted filter; the corpus is never shuffled).
    Adaptive verify (see module docstring):
      FAST PATH (shingle payload <= ``broadcast_budget``, default
      256 MB): pair-dedup groupby -> ray.put shingle pack -> single
      map_batches exact-Jaccard + threshold. The driver transiently
      holds ~2x the payload while building the pack — size driver
      memory for 2 * broadcast_budget, or lower the budget.
      SCALE PATH (payload over budget — detected via the materialized
      Dataset's size_bytes() before any block reaches the driver): two
      bounded-group hash co-groups attach sh_a / sh_b to pairs, then
      in-kernel verify; nothing shingle-sized ever lands on the driver.
    Either way the verified pair Dataset is the return value and the
    candidate pair set lives in the (spillable) object store.
    """
    from .pairs import emit_candidate_pairs_ds

    a, b = perm_params(num_perm, seed)
    bands = ds.map_batches(
        band_emit_batch,
        fn_kwargs=dict(text_col=text_col, id_col=id_col, k=k,
                       a=a, b=b, n_bands=n_bands),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    # materialize: `pairs` feeds the id sweep and the verify stage;
    # without it the band+shuffle pipeline re-executes per consumer.
    # dedup=False: each verify path dedups where it is cheapest (fast
    # path: int-pair groupby before the verify; scale path: in-group
    # during attach round A).
    pairs = emit_candidate_pairs_ds(bands, ["band", "band_hash"], id_col,
                                    max_bucket=max_bucket,
                                    dedup=False).materialize()
    return exact_jaccard_verify(pairs, ds, text_col=text_col, id_col=id_col,
                                k=k, threshold=threshold,
                                batch_size=batch_size,
                                concurrency=concurrency,
                                broadcast_budget=broadcast_budget)


def exact_jaccard_verify(
    pairs: "ray.data.Dataset",
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    batch_size: int = 256,
    concurrency: int | None = None,
    broadcast_budget: int = 256 << 20,
) -> "ray.data.Dataset":
    """Shared exact-Jaccard verify tail: a MATERIALIZED candidate-pair
    Dataset (id_a, id_b — possibly with duplicates) + the corpus ->
    verified pairs with the true n-gram Jaccard >= threshold. Candidate
    generation is the caller's (LSH bands, prefix filter, ...); the
    adaptive broadcast-vs-co-group strategy is documented on
    ``minhash_dedup_pairs``."""
    # distinct candidate ids: streamed per-batch uniques -> one sorted
    # array (ints only; the pair ROWS stay in the object store)
    chunks = [np.array([], dtype=np.int64)]
    for b in pairs.iter_batches(batch_format="pyarrow"):
        chunks.append(np.unique(np.concatenate([
            b["id_a"].to_numpy(zero_copy_only=False),
            b["id_b"].to_numpy(zero_copy_only=False)])).astype(np.int64))
    wanted = np.unique(np.concatenate(chunks))
    if len(wanted) == 0:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64()),
        }))
    shingles = ds.select_columns([id_col, text_col]).map_batches(
        shingle_set_batch,
        fn_kwargs=dict(text_col=text_col, id_col=id_col, k=k,
                       wanted_ref=put_once(wanted)),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    ).materialize()  # consumed by the verify path (either variant)
    # Adaptive verify. FAST PATH (candidate shingle payload fits the
    # broadcast budget): stream the (id, blob) rows into ONE packed
    # int64 buffer, ray.put it, and verify every pair in a single
    # map_batches — zero attach shuffles; the only remaining all-to-all
    # is a tiny post-verify dedup over the (near-dup-sized) survivor
    # set. SCALE PATH (payload exceeds the budget — heavy duplication at
    # 100 TB): the fully distributed two-co-group attach, where no node
    # ever holds more than its groups.
    pack = _collect_shingle_pack(shingles, id_col, broadcast_budget)
    if pack is not None:
        # bands emit up to n_bands duplicate rows per true pair (exact
        # dups collide in EVERY band), so dedup BEFORE the verify — one
        # light int-pair groupby — or the O(|A|+|B|) intersect would run
        # n_bands times per duplicate pair
        from ray.data.aggregate import Count

        uniq = pairs.groupby(["id_a", "id_b"]).aggregate(
            Count(alias_name="_nb")).drop_columns(["_nb"])

        def _thresh(b: pa.Table) -> pa.Table:
            keep = b["jaccard"].to_numpy(zero_copy_only=False) >= threshold
            return b.filter(pa.array(keep))

        return uniq.map_batches(
            broadcast_jaccard_batch, fn_kwargs=dict(pack_ref=put_once(pack)),
            batch_format="pyarrow", batch_size=4096,
            concurrency=concurrency,
        ).map_batches(_thresh, batch_format="pyarrow")
    ja = _attach_blobs(pairs, shingles, "id_a", "sh_a", id_col,
                       carry_cols=["id_a", "id_b"], dedup_pairs=True)
    jb = _attach_blobs(ja, shingles, "id_b", "sh_b", id_col,
                       carry_cols=["id_a", "id_b", "sh_a"])
    return jb.map_batches(_jaccard_verify_batch, batch_format="pyarrow",
                          fn_kwargs={"threshold": threshold})


def ngram_jaccard_pairs_lsh(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    **kwargs,
) -> "ray.data.Dataset":
    """n-gram Jaccard pairs with MinHash+LSH candidate generation
    (probabilistic recall tuned by num_perm/n_bands; exact precision via
    the verify). For recall EXACT by construction, use
    ``dedup.ngram.ngram_jaccard_pairs`` (prefix-filtered all-pairs)."""
    return minhash_dedup_pairs(ds, text_col=text_col, id_col=id_col, k=k,
                               threshold=threshold, **kwargs)
