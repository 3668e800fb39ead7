"""Interval (range) self-join — pairs of rows whose timestamps fall
within a tolerance, without a cross product.

The reference has no range/theta join at all (SURVEY.md §2.4: joins =
one per-partition equi-join, `/root/reference/shmr/partition.py:263`);
this is the standard Spark-scale pattern for the capability a training
pipeline needs constantly (event correlation, as-of windows, burst
detection).

Scale design: a naive `a JOIN b ON |a.ts - b.ts| <= tol` is a
cross-product per key (BroadcastNestedLoopJoin — O(n²) per key and a
planner trap). Instead each row is binned to `floor(ts / tol)`; the
LEFT side explodes to its bin and both neighbors (a bounded 3×
fan-out) and the join becomes a plain equi-join on (key, bin) — hash
shuffle, co-located, AQE-skew-handled — followed by the exact residual
predicate. Every qualifying pair differs by ≤ 1 bin, so the 3-bin
probe is complete; bins are distinct so no pair is emitted twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_self_join(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    tolerance_us: int,
    payload: list[str] | None = None,
) -> DataFrame:
    """All unordered pairs (a, b) with equal `key_col`, `a.id < b.id`
    and |a.ts - b.ts| <= tolerance (microseconds).

    Output columns: key, <id>_a, <id>_b, gap_us (b.ts - a.ts may be
    negative — gap_us is the absolute gap), plus `payload` columns
    suffixed _a/_b.
    """
    payload = payload or []
    us = F.unix_micros(F.col(ts_col))
    bin_ = F.floor(us / F.lit(tolerance_us))

    def side(suffix: str, bins: Column) -> DataFrame:
        cols = [
            F.col(key_col).alias("__key"),
            F.col(id_col).alias(f"{id_col}{suffix}"),
            us.alias(f"__us{suffix}"),
            bins.alias("__bin"),
        ] + [F.col(c).alias(f"{c}{suffix}") for c in payload]
        out = df.select(*cols)
        # left side fans out to its bin and both neighbours
        return out.withColumn("__bin", F.explode(F.col("__bin"))) if suffix == "_a" else out

    left = side("_a", F.array(bin_ - 1, bin_, bin_ + 1))
    right = side("_b", bin_)
    gap = F.abs(F.col("__us_b") - F.col("__us_a"))
    return (
        # both sides are the (SF-proportional) input — pin sort-merge:
        # Catalyst's size estimate otherwise broadcasts the whole
        # corpus-side at mid scales (the q9 failure mode)
        left.join(right.hint("merge"), ["__key", "__bin"])
        .filter(
            (F.col(f"{id_col}_a") < F.col(f"{id_col}_b")) & (gap <= F.lit(tolerance_us))
        )
        .select(
            F.col("__key").alias(key_col),
            f"{id_col}_a",
            f"{id_col}_b",
            gap.alias("gap_us"),
            *[f"{c}{s}" for c in payload for s in ("_a", "_b")],
        )
    )


def interval_union_length(
    df,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    tiebreak_col: str | None = None,
):
    """Total length of the UNION of [start, end) intervals per key —
    utilization/coverage with overlaps counted once, as a sweep line
    in two window functions (no self-join, no explode beyond 2 rows
    per interval, one shuffle by key).

    Sweep: each interval emits (+1 at start, −1 at end); a running sum
    ordered by (time, delta DESC) is the number of active intervals in
    [time, next_time) — starts sort before ends at equal instants, so
    touching intervals merge (closed union). Covered length = Σ gaps
    where the running count > 0. All arithmetic is integer when the
    bound columns are integral (epoch seconds here) ⇒ hash-exact
    cross-engine.

    Returns (key_cols..., covered BIGINT, n_intervals BIGINT).
    """
    from pyspark.sql import Window

    tb = [tiebreak_col] if tiebreak_col else []
    # a NULL bound would sort NULLS FIRST and skew the running count
    # for the WHOLE key — fail loudly instead of silently corrupting
    ok = F.coalesce(
        F.assert_true(
            F.col(start_col).isNotNull() & F.col(end_col).isNotNull(),
            F.lit("interval_union_length: NULL interval bound"),
        ).cast("boolean"),
        F.lit(True),
    )
    df = df.filter(ok)
    s = df.select(
        *key_cols, F.col(start_col).alias("__t"), F.lit(1).alias("__d"), *tb
    )
    e = df.select(
        *key_cols, F.col(end_col).alias("__t"), F.lit(-1).alias("__d"), *tb
    )
    points = s.unionByName(e)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__t"), F.col("__d").desc(), *tb)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy(*key_cols).orderBy(
        F.col("__t"), F.col("__d").desc(), *tb
    )
    swept = points.select(
        *key_cols,
        F.sum("__d").over(w).alias("__active"),
        (F.lead("__t").over(wl) - F.col("__t")).alias("__gap"),
    )
    return swept.groupBy(*key_cols).agg(
        F.sum(
            F.when(F.col("__active") > 0, F.col("__gap")).otherwise(0)
        )
        .cast("long")
        .alias("covered"),
        (F.count("*") / 2).cast("long").alias("n_intervals"),
    )
