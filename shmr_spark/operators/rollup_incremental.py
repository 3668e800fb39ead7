"""Incremental rollup maintenance — a continuous aggregate kept
fresh by merging batch deltas, never by recomputing history.

The state table holds PARTIAL aggregates per (day, keys): count,
10⁶-scaled exact long sum (the dsum discipline from
functions/numeric.py — int64 partials re-sum exactly in any order and
any grouping), min, max. Partials are algebraic, so

    rollup(A ∪ B) == combine(rollup(A), rollup(B))

holds exactly — merging a delta is a re-aggregation of (touched state
rows ∪ delta partials), and the result is bit-identical to a full
recompute. That identity is what the driver gate checks.

100 TB shape: the state table is stored partitioned by day. A merge
1. aggregates ONLY the incoming batch (map-side partial combine, one
   shuffle over the batch's (day, keys) — days not in the batch move
   zero bytes);
2. broadcast-joins the batch's distinct days against the state so the
   touched-day read is a partition-pruned scan, not a full-state scan;
3. rewrites only the touched day partitions (dynamic partition
   overwrite on a day-partitioned table); the untouched partitions
   are never read or written. Here both halves are returned as one
   DataFrame (untouched ∪ merged) so the operator is self-contained.

The reference has no materialized-view/rollup surface (its datasets
are immutable file globs, /root/reference/shmr/partitions.py:13-24);
this extends the aggregation capability the way an always-ingesting
event pipeline needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shmr_spark.functions.numeric import _SCALE, _scaled_long


def rollup_events(
    events: DataFrame,
    keys: Sequence[str] = ("event_type",),
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily rollup state of an event batch: one row per (day, keys)
    with mergeable partials (cnt, sum_scaled, min_value, max_value).
    ``sum_scaled`` is the exact 10⁶-scaled int64 sum — store THIS, not
    a double, so merges stay order-insensitive and exact."""
    day = F.to_date(ts_col).alias("day")
    return events.groupBy(day, *keys).agg(
        F.count("*").alias("cnt"),
        F.sum(_scaled_long(F.col(value_col))).alias("sum_scaled"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def combine_rollups(
    parts: DataFrame, keys: Sequence[str] = ("event_type",)
) -> DataFrame:
    """Re-aggregate a union of rollup-state rows into one state row
    per (day, keys). Exact: long sums of long partials."""
    return parts.groupBy("day", *keys).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_scaled").alias("sum_scaled"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def merge_rollup(
    state: DataFrame,
    new_events: DataFrame,
    keys: Sequence[str] = ("event_type",),
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Updated rollup state after ingesting ``new_events``: days the
    batch touches are re-combined from (state partials ∪ batch
    partials); untouched days pass through UNREAD (anti-join on the
    broadcast day list — partition pruning when the state is stored
    day-partitioned). Bit-identical to rollup_events over the full
    event history."""
    delta = rollup_events(new_events, keys, value_col, ts_col)
    days = delta.select("day").distinct()
    touched = state.join(F.broadcast(days), "day")
    untouched = state.join(F.broadcast(days), "day", "left_anti")
    merged = combine_rollups(touched.unionByName(delta), keys)
    return untouched.unionByName(merged)


def rollup_readout(
    state: DataFrame, keys: Sequence[str] = ("event_type",)
) -> DataFrame:
    """User-facing view of a rollup state: (day, keys, cnt, sum_value,
    avg_value, min_value, max_value) with sum/avg materialized from
    the exact scaled partials — identical doubles to dsum/davg over
    the raw events."""
    sum_value = F.col("sum_scaled").cast("double") / F.lit(_SCALE)
    return state.select(
        "day",
        *keys,
        "cnt",
        sum_value.alias("sum_value"),
        (sum_value / F.col("cnt")).alias("avg_value"),
        "min_value",
        "max_value",
    )
