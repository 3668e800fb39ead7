"""Data profiling: one-pass per-column statistics for pipeline
auditing (row counts, null rates, distinct cardinality, min/max).

Single aggregation over the table — every column's stats are computed
in the same partial+final pass (no per-column scans), then unpivoted
to the long (column, stat) form. Distinct counts use exact
count(distinct) by default; pass approx=True for HLL at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, approx: bool = False) -> DataFrame:
    """(column, n, n_null, n_distinct, min_str, max_str) per column —
    min/max compared/reported as strings so heterogeneous column types
    fit one output schema."""
    aggs = []
    for c in df.columns:
        col = F.col(c)
        distinct = (
            F.approx_count_distinct(c) if approx else F.countDistinct(c)
        )
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(col.isNull().cast("long")).alias(f"{c}__n_null"),
            distinct.alias(f"{c}__n_distinct"),
            F.min(col.cast("string")).alias(f"{c}__min_str"),
            F.max(col.cast("string")).alias(f"{c}__max_str"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__n").alias("n"),
                F.col(f"{c}__n_null").alias("n_null"),
                F.col(f"{c}__n_distinct").alias("n_distinct"),
                F.col(f"{c}__min_str").alias("min_str"),
                F.col(f"{c}__max_str").alias("max_str"),
            )
            for c in df.columns
        )
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")
