"""Engine configuration: retention tiers, series keys, codec constants.

The reference derives seasonal period from the index interval
(``/root/reference/R/utils.R:90-120`` interval->period); our engine makes the
tier ladder explicit config instead (raw 1s -> 1m -> 1h -> 1d), per the
north rule's cascading retention tiers.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Tier:
    name: str
    unit_s: int  # bucket width in seconds
    # explicit gap rows for this tier's bucket domain. The raw 1s tier
    # skips it: dense per-second zero rows would be ~60% of its volume at
    # realistic densities; every rolled-up tier (1m/1h/1d) densifies, so
    # the gap-fill contract holds at all retention tiers.
    gap_fill: bool = True


# Cascading retention ladder. Buckets are int64 epoch-seconds floored to the
# tier unit (numeric flooring semantics of R/utils.R:134-139:
# (x - origin) // unit * unit + origin, with origin = 0 epoch).
TIERS: tuple[Tier, ...] = (
    Tier("raw", 1, gap_fill=False),
    Tier("1m", 60),
    Tier("1h", 3600),
    Tier("1d", 86400),
)

TIER_BY_NAME = {t.name: t for t in TIERS}

# Rolled-up value columns produced at every tier for the measured var n_tok.
AGG_COLUMNS = ("count", "sum", "min", "max", "mean")

# Series key for rollups: one series per source.
SERIES_KEY = "source"
BUCKET_COL = "bucket"

# Encode stage: points per compressed segment blob. Segments are addressed
# by bucket id (segment = bucket // (SEGMENT_POINTS * unit_s)) so encoding is
# deterministic, parallel and resumable regardless of block boundaries.
# 16384 balances per-segment file overhead against group parallelism: the
# bounded (key, segment) group is also the anti-skew salt, and the kernel's
# per-group work is vectorized so bigger segments amortize fixed costs.
SEGMENT_POINTS = 16384

# Salting for skewed sources: number of salt partitions for the hot-key
# pre-aggregation pass (SURVEY.md §4.2). Partial aggregation inside
# map_batches already bounds per-key fan-in to #batches; SALT further splits
# a pathological (source,bucket) hot key at the doc level.
DEFAULT_SALT = 8


@dataclass
class RollupConfig:
    tiers: tuple[Tier, ...] = TIERS
    # ONE measure column (str, legacy bare sum/min/max/mean point names)
    # or SEVERAL (tuple -> sum_<m>/min_<m>/max_<m>/mean_<m> per measure
    # with one shared count; the tier kernel shares the grouping argsort
    # across measures so k measures cost one scan + one shuffle, not k)
    value_col: str | tuple[str, ...] = "n_tok"
    series_key: str = SERIES_KEY
    segment_points: int = SEGMENT_POINTS
    gap_fill: bool = True
    # batch size for the bucketize/partial-agg map_batches stage
    batch_size: int = 32768
    extra_agg_keys: tuple[str, ...] = field(default_factory=tuple)
    # RAW-tier points are written hive-partitioned by time range
    # (seg_part = bucket // (segment_points * unit_s * this)) so the
    # selective incremental merge rewrites only the partition dirs the
    # delta touches — untouched point FILES stay in place exactly like
    # the partition-addressed blob files. 16 segments/partition makes a
    # partition span ~3 days at 1s buckets (16 * 16384 s): a daily
    # ingest at 10^12 sequences touches O(1) partitions instead of
    # streaming every rolled point through a full rewrite.
    points_partition_segs: int = 16

    @property
    def measures(self) -> tuple[str, ...] | None:
        """None = legacy single-measure contract; tuple of measure names
        when value_col lists several columns (tier_kernel convention)."""
        return None if isinstance(self.value_col, str) else tuple(self.value_col)

    @property
    def value_cols(self) -> tuple[str, ...]:
        """Input measure columns as a tuple regardless of config form."""
        return (self.value_col,) if isinstance(self.value_col, str) \
            else tuple(self.value_col)

    @property
    def partial_cols(self) -> tuple[str, ...]:
        """Point/partial aggregate column names (after count)."""
        sfx = ("",) if isinstance(self.value_col, str) \
            else tuple(f"_{m}" for m in self.value_col)
        return tuple(f"{c}{x}" for x in sfx for c in ("sum", "min", "max"))

    @property
    def mean_cols(self) -> tuple[str, ...]:
        """Derived mean point column names (one per measure)."""
        return ("mean",) if isinstance(self.value_col, str) \
            else tuple(f"mean_{m}" for m in self.value_col)
