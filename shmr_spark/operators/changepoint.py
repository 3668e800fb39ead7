"""CUSUM drift detection — order-aware change monitoring over a
keyed event stream, as two window functions.

The textbook one-sided CUSUM is a recursion,
``C_t = max(0, C_{t-1} + (x_t - target - slack))``, which no built-in
window function expresses directly. Identity used instead: with
``S_t = Σ_{s≤t} (x_s - target - slack)`` (prefix sum),

    C_t = S_t - min(0, min_{s≤t} S_s)

so the whole detector is a running SUM plus a running MIN over the
same (key, time) window frame — ONE shuffle by key, no iteration, no
UDFs, scale-bounded by the window spill machinery like any other
windowed aggregate.

Determinism: values are 10²-scaled int64 and the target is an integer
(floor) division of exact int sums, so every intermediate is integer
arithmetic — the oracle twin is hash-exact with no float discipline
needed. The reference engine (/root/reference/shmr) has no ordered or
windowed computation at all; this is a pipeline-monitoring extension
(detect a metric drifting off its baseline: error-rate creep, token
-length drift, quality-score decay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_cusum(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    scale: int = 100,
    slack_scaled: int = 0,
) -> DataFrame:
    """Adds ``cusum_scaled``: the one-sided upward CUSUM of
    ``value_col`` against the per-key mean target (scaled by
    ``scale``). ``slack_scaled`` is the classic allowance k — drift
    smaller than it never accumulates."""
    xs = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("long")
    per_key = Window.partitionBy(*key_cols)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # integer `div` stays exact where a double /-then-cast would lose
    # precision past 2^53; both Spark `div` and DuckDB `//` truncate
    # toward zero on BIGINT (verified: -7 // 2 = -3 in this DuckDB),
    # so the engine/oracle pairing agrees for any sign of sum
    staged = (
        df.withColumn("__xs", xs)
        .withColumn("__sumxs", F.sum("__xs").over(per_key))
        .withColumn("__cnt", F.count(F.lit(1)).over(per_key))
        .withColumn("__tgt", F.expr("__sumxs div __cnt"))
    )
    dev = F.col("__xs") - F.col("__tgt") - F.lit(slack_scaled)
    s = F.sum(dev).over(w)
    runmin = F.least(F.lit(0).cast("long"), F.min(s).over(w))
    return staged.withColumn("cusum_scaled", (s - runmin).cast("long")).drop(
        "__xs", "__sumxs", "__cnt", "__tgt"
    )
