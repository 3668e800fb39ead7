"""Stream-stream joins with event-time bounds.

A watermarked stream-stream inner join is the streaming twin of the
batch interval join (operators/interval.py): each side buffers only
the rows inside its watermark horizon, so state is bounded by
(event rate × horizon), not by history. The time-range predicate is
what lets Spark expire state — an unbounded-condition join would
buffer forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    a: DataFrame,
    b: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Pairs (a, b) with equal key and b.ts in (a.ts, a.ts + window]:
    one-directional so the range condition bounds both buffers.

    Output: key, <id>_a, <id>_b, gap_us (always positive)."""
    wa = a.withWatermark("ts", watermark).alias("a")
    wb = b.withWatermark("ts", watermark).alias("b")
    cond = F.expr(
        f"a.{key_col} = b.{key_col} AND b.ts > a.ts"
        f" AND b.ts <= a.ts + interval {window}"
    )
    return wa.join(wb, cond).select(
        F.col(f"a.{key_col}").alias(key_col),
        F.col(f"a.{id_col}").alias(f"{id_col}_a"),
        F.col(f"b.{id_col}").alias(f"{id_col}_b"),
        (F.unix_micros(F.col("b.ts")) - F.unix_micros(F.col("a.ts"))).alias("gap_us"),
    )
