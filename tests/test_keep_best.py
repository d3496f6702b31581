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
