"""dedup_keep_best: the broadcast and distributed-join plans must
produce identical rows (the budget only picks the physical plan)."""

import pandas as pd

import ray.data

from feasts_ray.dedup import dedup_keep_best

SF_DIR = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].sort_values(
        list(sorted(df.columns)), ignore_index=True)


def test_keep_best_broadcast_equals_distributed_join(ray_session):
    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet",
                               columns=["doc_id", "text"])
    via_broadcast = dedup_keep_best(ds, threshold=0.35).to_pandas()
    # budget 0 forces the distributed hash join path
    via_join = dedup_keep_best(ds, threshold=0.35,
                               broadcast_budget=0).to_pandas()
    assert len(via_broadcast) > 0
    pd.testing.assert_frame_equal(_canon(via_broadcast), _canon(via_join))


def test_keep_best_persisted_assignments_bit_identical(ray_session, tmp_path):
    """Precomputed/persisted assignment path == fused path, and the
    second persistent call is a cache HIT (no recompute: manifest
    lineage unchanged, reload returns the identical integer labels)."""
    from feasts_ray.dedup import (load_assignments,
                                  minhash_dedup_docs_persistent)
    from feasts_ray.dedup.cluster import _parquet_inventory
    from feasts_ray.state import checkpoint as ckpt

    src = f"{SF_DIR}/documents.parquet"
    cache = str(tmp_path / "assign")
    assign1 = minhash_dedup_docs_persistent(src, cache, threshold=0.35)
    a1 = assign1.to_pandas().sort_values("doc_id", ignore_index=True)

    # cache hit: load_assignments resolves the same lineage directly
    lineage = ckpt.lineage_hash(src, {
        "op": "minhash_dedup_docs", "text_col": "text", "id_col": "doc_id",
        "threshold": 0.35, "kwargs": {}}, inventory=_parquet_inventory(src))
    hit = load_assignments(cache, lineage)
    assert hit is not None
    a2 = hit.to_pandas().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(a1, a2)

    ds = ray.data.read_parquet(src, columns=["doc_id", "text"])
    fused = dedup_keep_best(ds, threshold=0.35).to_pandas()
    via_persisted = dedup_keep_best(
        ds, threshold=0.35,
        assignments=minhash_dedup_docs_persistent(src, cache, threshold=0.35),
    ).to_pandas()
    pd.testing.assert_frame_equal(_canon(fused), _canon(via_persisted))

    # a changed inventory (mtime) invalidates: stale lineage returns None
    assert load_assignments(cache, "0" * 16) is None
