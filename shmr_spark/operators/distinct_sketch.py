"""Mergeable distinct-count sketches (Apache DataSketches HLL, via
Spark 4's ``hll_sketch_agg`` family).

The 100 TB pattern for "distinct users per X, updated continuously":
an exact COUNT(DISTINCT) must re-shuffle ALL history every refresh,
but an HLL sketch column is an algebraic aggregate — build one sketch
per shard/partition/day as data lands, PERSIST the binary sketches
(a few KB per group), and answer any coarser-grained distinct
question later by unioning sketches, never rescanning rows:

    daily   = build_distinct_sketches(events, ["day", "country"], "user_id")
    daily.write.parquet(...)                      # KBs per group
    monthly = rollup_distinct_sketches(spark.read.parquet(...), ["country"])

Standard error is ~1.04/sqrt(2^lg_k) (≈1.6 % at the lg_k=12 default);
estimates are deterministic for fixed input (the sketch hash is
seeded), but NOT bit-identical across engines — so the oracle gate
(queries/analytics.py::distinct_sketch_rollup) pins exact group keys
and counts and checks the estimate against an exact-count envelope,
the same tolerance-oracle discipline as approx_percentiles.

No reference analogue: the reference engine (/root/reference/shmr)
can only count distinct by sorting whole partitions; sketches are the
capability its users would need first at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12  # ~1.6 % standard error, 2^12 registers ≈ 4 KB


def build_distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """One HLL sketch (binary) + exact row count per group. The sketch
    column is persistable and mergeable; one shuffle, map-side
    partial aggregation applies (sketch union is associative)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, lg_k).alias("sketch"),
        F.count(value_col).alias("n_rows"),
    )


def rollup_distinct_sketches(
    sketches: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Union persisted sketches up to a coarser grouping and estimate.
    Input rows are (…, sketch, n_rows) from build_distinct_sketches;
    the union touches only the sketch bytes — never the base rows."""
    agg = [
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("distinct_est"),
        F.sum("n_rows").alias("n_rows"),
    ]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*agg)
    return sketches.agg(*agg)
