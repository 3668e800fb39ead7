"""Data-quality validation: declarative row expectations, audited in
ONE pass.

`rules` maps rule name → predicate Column every row should satisfy.
The audit is a single aggregate over conditional sums (no per-rule
scans — at 100 TB the corpus is read once regardless of rule count),
unpivoted to one row per rule. NULL predicate results count as
violations (a rule that can't evaluate didn't pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
