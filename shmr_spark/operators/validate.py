"""Data-quality validation: declarative row expectations, audited in
ONE pass.

`rules` maps rule name → predicate Column every row should satisfy.
The audit is a single aggregate over conditional sums (no per-rule
scans — at 100 TB the corpus is read once regardless of rule count),
unpivoted to one row per rule. NULL predicate results count as
violations (a rule that can't evaluate didn't pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def validate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Audit `df` against `rules`; returns (rule, n_violations,
    n_rows) — one output row per rule, computed in one scan."""
    if not rules:
        raise ValueError("validate() needs at least one rule")
    aggs = [
        F.sum(
            F.when(pred.isNull() | ~pred, F.lit(1)).otherwise(F.lit(0))
        ).alias(f"__v_{name}")
        for name, pred in rules.items()
    ] + [F.count("*").alias("__n")]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{name}', `__v_{name}`" for name in rules)
    return wide.select(
        F.expr(f"stack({len(rules)}, {stack}) AS (rule, n_violations)"),
        F.col("__n").alias("n_rows"),
    )


def schema_drift(actual: "DataFrame | object", expected: object) -> list[dict]:
    """Data-contract check: diff a DataFrame's schema (or any
    StructType) against the expected StructType. Returns one dict per
    drift — ``{"column", "kind", "expected", "actual"}`` with kind ∈
    {missing, extra, type_changed, nullability_tightened} — empty
    list = contract holds.

    Run it BEFORE a backfill or merge: at 100 TB a silently-widened
    column poisons every downstream partition before anyone looks.
    Metadata-only (schemas come from parquet footers) — zero data
    scan. nullability loosened (required -> nullable) is NOT flagged:
    readers that accepted nulls still work; the reverse direction is
    (a required column built from a nullable source can break the
    writer mid-job).
    """
    from pyspark.sql import DataFrame as _DF
    from pyspark.sql.types import StructType

    act: StructType = actual.schema if isinstance(actual, _DF) else actual
    exp: StructType = expected  # type: ignore[assignment]
    a = {f.name: f for f in act.fields}
    e = {f.name: f for f in exp.fields}
    drifts: list[dict] = []
    for name, ef in e.items():
        af = a.get(name)
        if af is None:
            drifts.append(
                {"column": name, "kind": "missing",
                 "expected": ef.dataType.simpleString(), "actual": None}
            )
            continue
        if af.dataType != ef.dataType:
            drifts.append(
                {"column": name, "kind": "type_changed",
                 "expected": ef.dataType.simpleString(),
                 "actual": af.dataType.simpleString()}
            )
        if ef.nullable and not af.nullable:
            drifts.append(
                {"column": name, "kind": "nullability_tightened",
                 "expected": "nullable", "actual": "required"}
            )
    for name, af in a.items():
        if name not in e:
            drifts.append(
                {"column": name, "kind": "extra",
                 "expected": None, "actual": af.dataType.simpleString()}
            )
    return drifts


def missing_ranges(df, key_col: str, num_partitions: int | None = None):
    """Contiguous ranges of MISSING integer keys between the observed
    min and max — sequence-gap detection (dropped batches, id holes)
    without a global sort.

    Partitioning is RANK-space, not value-space: the distinct keys go
    through ``repartitionByRange`` (sampled, equal-POPULATION range
    partitions), the lag window runs PARTITIONED per range partition,
    and cross-partition gaps are stitched from a partition-level
    (min, max) summary — the only unpartitioned window runs on that
    ≤ num_partitions-row summary. Value-space cells (fixed-width
    ``(key - min) / width`` buckets, the round-10 design) degenerate
    on exactly this operator's target inputs: one stray huge key
    stretches the span so nearly every real key lands in ONE cell and
    the "partitioned" window becomes a single-task funnel. Sampled
    range boundaries balance by population, so outlier keys cost one
    near-empty partition instead of all the parallelism.

    The sampled boundaries are not reproducible run-to-run, but the
    OUTPUT is placement-invariant: a gap between neighbours in the
    same partition is found by the lag; a gap straddling a boundary is
    found by the stitch; the union is the same gap set wherever the
    boundaries fall (cf. operators/ranking.py, which avoids
    repartitionByRange because there the shard ASSIGNMENT is the
    output — here it is internal).

    ``num_partitions`` defaults to spark.sql.shuffle.partitions capped
    at 4096 so the stitch summary stays bounded at any configured
    parallelism. Returns (gap_start, gap_end, n_missing), all BIGINT —
    exact integer arithmetic, hash-stable cross-engine.
    """
    k = F.col(key_col).cast("long")
    keys = df.select(k.alias("__k")).filter(k.isNotNull()).distinct()
    if num_partitions is None:
        try:
            conf = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):  # "auto" under some AQE setups
            conf = 256
        num_partitions = min(max(conf, 1), 4096)
    # spark_partition_id is monotone in the key here: RangePartitioner
    # assigns ascending key ranges to ascending partition ids, so
    # ordering the stitch by __b orders it by key range.
    bucketed = keys.repartitionByRange(num_partitions, "__k").withColumn(
        "__b", F.spark_partition_id().cast("long")
    )

    wb = Window.partitionBy("__b").orderBy("__k")
    within = (
        bucketed.withColumn("__prev", F.lag("__k").over(wb))
        .filter(F.col("__k") - F.col("__prev") > 1)
        .select(
            (F.col("__prev") + 1).alias("gap_start"),
            (F.col("__k") - 1).alias("gap_end"),
        )
    )

    summary = bucketed.groupBy("__b").agg(
        F.min("__k").alias("__mn"), F.max("__k").alias("__mx")
    )
    ws = Window.orderBy("__b")  # <= N_BUCKETS rows — bounded by design
    across = (
        summary.withColumn("__pmx", F.lag("__mx").over(ws))
        .filter(F.col("__mn") - F.col("__pmx") > 1)
        .select(
            (F.col("__pmx") + 1).alias("gap_start"),
            (F.col("__mn") - 1).alias("gap_end"),
        )
    )

    return (
        within.unionByName(across)
        .select(
            "gap_start",
            "gap_end",
            (F.col("gap_end") - F.col("gap_start") + 1).alias("n_missing"),
        )
    )
