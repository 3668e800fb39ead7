"""Frequent-item (heavy-hitter) detection with bounded memory.

The scale problem: "which tokens appear in more than φ of a 100 TB
corpus" via a full groupBy materializes billions of distinct groups
for a handful of answers. The classic fix is a two-pass
sketch-then-verify:

1. **Per-partition Misra-Gries sketch** (capacity ⌈1/φ⌉, Arrow-batched
   `mapInPandas`): any item with global frequency > φ·N must survive
   in at least one partition's sketch — if it were evicted everywhere,
   its total count would be ≤ Σ n_p/(k+1) < φ·N (pigeonhole). The
   union of survivors is therefore a guaranteed superset of the true
   heavy hitters, and it is tiny (≤ capacity × n_partitions rows).
2. **Exact recount of the candidates only** — a broadcast semi-join
   prunes the corpus pass to candidate rows, then an exact groupBy of
   that small set. Output is EXACT (sketch error never reaches the
   result), which is what makes the operator oracle-checkable.

The reference has no sketches at all; its reduce_by_key
(`/root/reference/shmr/partition.py:206`) holds every distinct key in
a per-process dict — this operator is what replaces that at scale.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_sketch_partition(capacity: int, col: str):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for batch in batches:
            for item in batch[col]:
                if item in counts:
                    counts[item] += 1
                elif len(counts) < capacity:
                    counts[item] = 1
                else:
                    # decrement-all: evict zeros (the O(1)-amortized MG step)
                    dead = []
                    for key in counts:
                        counts[key] -= 1
                        if counts[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counts[key]
        yield pd.DataFrame({col: list(counts.keys())})

    return run


def heavy_hitters(df: DataFrame, col: str, phi: float) -> DataFrame:
    """Exact items with frequency > phi * count(df), found with
    bounded memory (never a full-cardinality groupBy).

    Returns (col, n) — the exact count of each qualifying item."""
    if not 0 < phi < 1:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    capacity = math.ceil(1.0 / phi)
    src = df.select(col)
    candidates = (
        src.mapInPandas(_mg_sketch_partition(capacity, col), schema=src.schema)
        .distinct()
    )
    # the φ·N threshold rides in-plan, not as a driver count()
    # (functions/scalars.py has the zero-jobs-at-plan-build rationale)
    from shmr_spark.functions.scalars import with_scalars

    total = src.agg(F.count(F.lit(1)).alias("__total"))
    counted = (
        src.join(F.broadcast(candidates), col)
        .groupBy(col)
        .agg(F.count("*").alias("n"))
    )
    return (
        with_scalars(counted, total)
        .filter(F.col("n") > F.lit(phi) * F.col("__total"))
        .drop("__total")
    )
