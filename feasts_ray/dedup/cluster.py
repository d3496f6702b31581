"""Near-duplicate CLUSTERING: connected components over a verified
near-dup pair Dataset, and the cluster-dedup that keeps one doc per
component — the operation a training-data pipeline actually runs on the
pair output.

Algorithm: distributed min-label propagation (the classic hash-join
formulation of connected components, e.g. Kiveris et al. "Connected
Components in MapReduce and Beyond", SoCC'14 — the simple iterate-
to-fixpoint variant):

  label(v) <- min(label(v), min over neighbours' labels)

Each round is one bounded-group hash co-group over (node -> incident
edges + current labels); near-dup components are dense (duplicate
cliques), so the number of rounds is the component diameter — almost
always 1-2. Labels are integers, so the result is exactly reproducible
by an unrolled SQL propagation (no float semantics at all).

Scale shape: the iteration runs ONLY over edge-incident nodes — nodes
with no near-dup edge are split off in one up-front co-group and keep
their own id, so per-round shuffles move O(#duplicate docs) rows of
(node:int64, label:int64), not the whole corpus. Every materialized
round output is coalesced back to a bounded block count (Ray's
sort-based groupby cost is driven by input block COUNT, which otherwise
grows multiplicatively round over round), and convergence is a tiny
per-round `sum(chg)` aggregate over an int8 changed flag (no int64
label-sum overflow at corpus scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_MIX = np.uint64(0x9E3779B97F4A7C15)

_LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])


def _bound_blocks(ds: "ray.data.Dataset",
                  max_bytes_per_block: int = 32 << 20) -> "ray.data.Dataset":
    """Coalesce a MATERIALIZED dataset to ~max_bytes_per_block blocks.
    Without this, each groupby round's output inherits and multiplies
    the block count (64 -> 268 -> 1084 ... for constant-size data) and
    the next round's sort-based shuffle pays per-block scheduling cost."""
    n = ds.num_blocks()
    size = ds.size_bytes() or 0
    target = max(1, min(n, size // max_bytes_per_block + 1))
    if n > 2 * target:
        return ds.repartition(target).materialize()
    return ds


def _add_g_fn(num_groups: int):
    def _add_g(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = ((k.view(np.uint64) * _MIX) % np.uint64(num_groups)).astype(np.int64)
        return batch.append_column("_g", pa.array(g, type=pa.int64()))
    return _add_g


def _split_incident(edges: "ray.data.Dataset", nodes: "ray.data.Dataset",
                    id_col: str, num_groups: int = 64):
    """One bounded co-group splitting ``nodes`` into (incident, singleton)
    seed-label datasets: a node is incident iff it appears as either
    endpoint of an edge. Only incident nodes enter the propagation loop."""

    def _tag_node(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64())
        return pa.table({
            "k": ids,
            "kind": pa.array(np.ones(len(batch), dtype=np.int8)),
        })

    def _tag_incident(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        ids = np.unique(np.concatenate([a, b]).astype(np.int64))
        return pa.table({
            "k": pa.array(ids, type=pa.int64()),
            "kind": pa.array(np.zeros(len(ids), dtype=np.int8)),
        })

    def _split(group: pa.Table) -> pa.Table:
        kind = group["kind"].to_numpy(zero_copy_only=False)
        k = group["k"].to_numpy(zero_copy_only=False)
        node_ids = k[kind == 1]
        inc_sorted = np.unique(k[kind == 0])
        if len(inc_sorted) == 0:
            member = np.zeros(len(node_ids), dtype=bool)
        else:
            pos = np.clip(np.searchsorted(inc_sorted, node_ids),
                          0, len(inc_sorted) - 1)
            member = inc_sorted[pos] == node_ids
        return pa.table({
            "node": pa.array(node_ids, type=pa.int64()),
            "label": pa.array(node_ids, type=pa.int64()),
            "inc": pa.array(member.astype(np.int8)),
        })

    split = (nodes.map_batches(_tag_node, batch_format="pyarrow")
             .union(edges.map_batches(_tag_incident, batch_format="pyarrow"))
             .map_batches(_add_g_fn(num_groups), batch_format="pyarrow")
             .groupby("_g").map_groups(_split, batch_format="pyarrow")
             .materialize())

    def _take(want: int):
        def _f(batch: pa.Table) -> pa.Table:
            mask = pa.compute.equal(batch["inc"], want)
            sub = batch.filter(mask)
            return sub.select(["node", "label"])
        return _f

    incident = split.map_batches(_take(1), batch_format="pyarrow")
    singles = split.map_batches(_take(0), batch_format="pyarrow")
    return incident, singles


def _min_label_round(edges: "ray.data.Dataset", labels: "ray.data.Dataset",
                     num_groups: int = 64) -> "ray.data.Dataset":
    """One propagation round: for every node, new label = min(own label,
    labels of all neighbours). Implemented as a bounded-group co-group:
    rows are (node, other) half-edges plus (node, label) seeds, grouped
    by hash(node); inside a group the join of neighbour labels is
    vectorized. Neighbour labels come from the PREVIOUS round's label
    table broadcast-joined by the same co-group on the OTHER endpoint
    first (two bounded shuffles per round). Output carries ``own`` (the
    round-start label) so the pointer jump can emit a changed flag."""

    # half-edges both directions: (node, other)
    def _halves(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), type=pa.int64()),
            "other": pa.array(np.concatenate([b, a]), type=pa.int64()),
        })

    halves = edges.map_batches(_halves, batch_format="pyarrow")

    # stage 1: attach label(other) to each half-edge (co-group on other)
    def _tag_edge(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": batch["other"], "node": batch["node"],
            "lab": pa.nulls(len(batch), pa.int64()),
            "kind": pa.array(np.zeros(len(batch), dtype=np.int8)),
        })

    def _tag_label(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": batch["node"], "node": pa.nulls(len(batch), pa.int64()),
            "lab": batch["label"],
            "kind": pa.array(np.ones(len(batch), dtype=np.int8)),
        })

    def _join_other(group: pa.Table) -> pa.Table:
        kind = group["kind"].to_numpy(zero_copy_only=False)
        k = group["k"].to_numpy(zero_copy_only=False)
        lab_idx = np.flatnonzero(kind == 1)
        ed_idx = np.flatnonzero(kind == 0)
        out_schema = pa.schema([("node", pa.int64()), ("nlab", pa.int64())])
        if len(ed_idx) == 0:
            return out_schema.empty_table()
        lk = k[lab_idx]
        order = np.argsort(lk, kind="stable")
        lk_sorted = lk[order]
        pos = np.clip(np.searchsorted(lk_sorted, k[ed_idx]), 0, len(lk_sorted) - 1)
        matched = lk_sorted[pos] == k[ed_idx]
        labs = group["lab"].to_numpy(zero_copy_only=False)[lab_idx][order]
        return pa.table({
            "node": pa.array(group["node"].to_numpy(zero_copy_only=False)
                             [ed_idx[matched]], type=pa.int64()),
            "nlab": pa.array(labs[pos[matched]], type=pa.int64()),
        })

    neigh = (halves.map_batches(_tag_edge, batch_format="pyarrow")
             .union(labels.map_batches(_tag_label, batch_format="pyarrow"))
             .map_batches(_add_g_fn(num_groups), batch_format="pyarrow")
             .groupby("_g").map_groups(_join_other, batch_format="pyarrow"))

    # stage 2: per node, min(own, incoming neighbour labels); keep own
    def _tag_n(batch: pa.Table) -> pa.Table:
        return pa.table({"k": batch["node"], "lab": batch["nlab"],
                         "kind": pa.array(np.zeros(len(batch), dtype=np.int8))})

    def _tag_own(batch: pa.Table) -> pa.Table:
        return pa.table({"k": batch["node"], "lab": batch["label"],
                         "kind": pa.array(np.ones(len(batch), dtype=np.int8))})

    def _min_per_node(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        lab = group["lab"].to_numpy(zero_copy_only=False)
        kind = group["kind"].to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.schema([("node", pa.int64()), ("label", pa.int64()),
                              ("own", pa.int64())]).empty_table()
        # within a key, own (kind=1) rows sort last -> run end is the own row
        order = np.lexsort((kind, k))
        ks, labs = k[order], lab[order]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(ks)) - 1
        if not (kind[order][ends] == 1).all():
            # labels covers every edge-incident node by construction; a
            # keyed row with no own label means the invariant broke
            raise RuntimeError("propagation round saw a node with no label row")
        return pa.table({
            "node": pa.array(ks[starts], type=pa.int64()),
            "label": pa.array(np.minimum.reduceat(labs, starts), type=pa.int64()),
            "own": pa.array(labs[ends], type=pa.int64()),
        })

    return (neigh.map_batches(_tag_n, batch_format="pyarrow")
            .union(labels.map_batches(_tag_own, batch_format="pyarrow"))
            .map_batches(_add_g_fn(num_groups), batch_format="pyarrow")
            .groupby("_g").map_groups(_min_per_node, batch_format="pyarrow"))


def _pointer_jump(labels: "ray.data.Dataset",
                  num_groups: int = 64) -> "ray.data.Dataset":
    """label(v) <- label(label(v)). Labels are monotone non-increasing
    node ids, so the replacement is always <= the old label — one
    bounded-group co-group on (k = label(v)) doubles the compression
    per round (pointer jumping), turning path-diameter convergence into
    O(log diameter) rounds. Emits ``chg`` = 1 where the final label
    differs from the round-start label ``own`` (the convergence probe)."""

    def _tag_ptr(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": batch["label"], "node": batch["node"], "own": batch["own"],
            "lab": pa.nulls(len(batch), pa.int64()),
            "kind": pa.array(np.zeros(len(batch), dtype=np.int8)),
        })

    def _tag_lab(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": batch["node"], "node": pa.nulls(len(batch), pa.int64()),
            "own": pa.nulls(len(batch), pa.int64()),
            "lab": batch["label"],
            "kind": pa.array(np.ones(len(batch), dtype=np.int8)),
        })

    def _resolve(group: pa.Table) -> pa.Table:
        kind = group["kind"].to_numpy(zero_copy_only=False)
        k = group["k"].to_numpy(zero_copy_only=False)
        lab_idx = np.flatnonzero(kind == 1)
        ptr_idx = np.flatnonzero(kind == 0)
        out_schema = pa.schema([("node", pa.int64()), ("label", pa.int64()),
                                ("chg", pa.int8())])
        if len(ptr_idx) == 0:
            return out_schema.empty_table()
        lk = k[lab_idx]
        order = np.argsort(lk, kind="stable")
        lk_sorted = lk[order]
        pos = np.clip(np.searchsorted(lk_sorted, k[ptr_idx]), 0, len(lk_sorted) - 1)
        matched = lk_sorted[pos] == k[ptr_idx]
        labs = group["lab"].to_numpy(zero_copy_only=False)[lab_idx][order]
        nodes_ = group["node"].to_numpy(zero_copy_only=False)
        own = group["own"].to_numpy(zero_copy_only=False)
        # every label IS a node id, so every pointer row matches
        final = labs[pos[matched]]
        return pa.table({
            "node": pa.array(nodes_[ptr_idx[matched]], type=pa.int64()),
            "label": pa.array(final, type=pa.int64()),
            "chg": pa.array((final != own[ptr_idx[matched]]).astype(np.int8)),
        })

    return (labels.map_batches(_tag_ptr, batch_format="pyarrow")
            .union(labels.map_batches(_tag_lab, batch_format="pyarrow"))
            .map_batches(_add_g_fn(num_groups), batch_format="pyarrow")
            .groupby("_g").map_groups(_resolve, batch_format="pyarrow"))


def connected_components(edges: "ray.data.Dataset",
                         nodes: "ray.data.Dataset",
                         id_col: str = "doc_id",
                         max_rounds: int = 16) -> "ray.data.Dataset":
    """(node -> component label) for every node in ``nodes``; label =
    min node id of the component. Nodes without edges keep their own id
    and never enter the loop. Each round is one neighbour-min
    propagation plus one pointer jump (label-of-label), so convergence
    takes O(log diameter) rounds — near-dup cliques converge in 1-2, a
    path of length 2^k in ~k."""
    edges = _bound_blocks(edges.materialize())
    incident, singles = _split_incident(edges, nodes, id_col)
    labels = _bound_blocks(incident.materialize())

    def _strip(batch: pa.Table) -> pa.Table:
        return batch.select(["node", "label"])

    if labels.count() == 0:
        return singles
    for _ in range(max_rounds):
        stepped = _min_label_round(edges, labels)
        labels = _bound_blocks(_pointer_jump(stepped).materialize())
        # convergence probe: tiny driver aggregate over the int8 flag
        if not labels.sum("chg"):
            break
    else:
        # Non-converged labels are WRONG (not the component min), never
        # return them as if they were a correct assignment. With pointer
        # jumping, 16 rounds cover component diameters up to ~2^16.
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            "rounds (labels still changing); raise max_rounds")
    return labels.map_batches(_strip, batch_format="pyarrow").union(singles)


def minhash_dedup_docs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    **kwargs,
) -> "ray.data.Dataset":
    """(doc_id, cluster_id) for every doc: cluster_id = min doc id of
    its near-duplicate component at the given exact-Jaccard threshold
    (docs with no near-dup: cluster_id = own id). The dedup policy
    'keep one per cluster' is then `filter(doc_id == cluster_id)` —
    exposed in the output so the oracle checks the full assignment."""
    from .minhash import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(ds, text_col=text_col, id_col=id_col,
                                threshold=threshold, **kwargs)
    comp = connected_components(pairs, ds.select_columns([id_col]), id_col)

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b["node"], "cluster_id": b["label"]})

    return comp.map_batches(_rename, batch_format="pyarrow")


# ---------------- persisted cluster assignments ----------------
#
# At corpus scale the clustering is the expensive half of any dedup
# policy and is typically computed ONCE, then consumed by many
# downstream jobs (keep-best, keep-first, stats). These helpers persist
# the (id, cluster_id) assignment as partitioned parquet with a
# lineage-stamped manifest — the same checkpoint pattern the tier
# rollups use (state/checkpoint.py) — so a re-run with unchanged input
# and params reloads instead of re-clustering, and a changed input
# invalidates the cache instead of silently reusing a stale one.

ASSIGN_MANIFEST = "_ASSIGNMENTS.json"


def persist_assignments(assign: "ray.data.Dataset", cache_dir: str,
                        lineage: str) -> str:
    """Write an assignment Dataset under ``cache_dir`` atomically:
    parquet first into a tmp dir, dir-rename into place, manifest last
    (tmp + os.replace) — a crash anywhere leaves either the prior valid
    cache or no valid manifest, never a torn one. Returns the data dir."""
    import json
    import os
    import shutil
    from pathlib import Path

    out = Path(cache_dir)
    data = out / "assignments"
    tmp = out / ".assignments.tmp"
    out.mkdir(parents=True, exist_ok=True)
    shutil.rmtree(tmp, ignore_errors=True)
    rows = assign.write_parquet(str(tmp)) or None
    # invalidate before the swap so a crash between the two renames
    # can't pair the OLD manifest with the NEW data
    try:
        os.remove(out / ASSIGN_MANIFEST)
    except FileNotFoundError:
        pass
    shutil.rmtree(data, ignore_errors=True)
    os.replace(tmp, data)
    mtmp = str(out / ASSIGN_MANIFEST) + ".tmp"
    with open(mtmp, "w") as f:
        json.dump({"lineage": lineage, "status": "complete",
                   "rows": rows}, f)
    os.replace(mtmp, out / ASSIGN_MANIFEST)
    return str(data)


def load_assignments(cache_dir: str, lineage: str) -> "ray.data.Dataset | None":
    """Reload a persisted assignment if its manifest matches ``lineage``
    (else None — caller recomputes)."""
    import json
    from pathlib import Path

    p = Path(cache_dir) / ASSIGN_MANIFEST
    try:
        m = json.loads(p.read_text())
    except (OSError, json.JSONDecodeError):
        return None
    if m.get("lineage") != lineage or m.get("status") != "complete":
        return None
    return ray.data.read_parquet(str(Path(cache_dir) / "assignments"))


def minhash_dedup_docs_persistent(
    input_path: str,
    cache_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    **kwargs,
) -> "ray.data.Dataset":
    """minhash_dedup_docs over a parquet input with a persisted-
    assignment cache: lineage = input file inventory + params, computed
    at most once per (input, params). The clustering is deterministic
    (hash-seeded minhash, integer min-labels), so compute-then-reload
    and reload are bit-identical — pinned in tests/test_keep_best.py."""
    from ..state import checkpoint as ckpt

    inv = _parquet_inventory(input_path)
    lineage = ckpt.lineage_hash(input_path, {
        "op": "minhash_dedup_docs", "text_col": text_col, "id_col": id_col,
        "threshold": threshold,
        "kwargs": {k: kwargs[k] for k in sorted(kwargs)},
    }, inventory=inv)
    cached = load_assignments(cache_dir, lineage)
    if cached is not None:
        return cached
    ds = ray.data.read_parquet(input_path, columns=[id_col, text_col])
    assign = minhash_dedup_docs(ds, text_col=text_col, id_col=id_col,
                                threshold=threshold, **kwargs)
    persist_assignments(assign, cache_dir, lineage)
    out = load_assignments(cache_dir, lineage)
    assert out is not None
    return out


def _parquet_inventory(input_path: str) -> list[list]:
    """Sorted [name, size, mtime_ns] of the input's parquet file(s) —
    content-sensitive lineage for both single-file and directory inputs."""
    import os

    if os.path.isdir(input_path):
        names = [os.path.join(input_path, f) for f in os.listdir(input_path)
                 if f.endswith(".parquet")]
    else:
        names = [input_path]
    out = []
    for n in names:
        st = os.stat(n)
        out.append([os.path.basename(n), st.st_size, st.st_mtime_ns])
    return sorted(out)
