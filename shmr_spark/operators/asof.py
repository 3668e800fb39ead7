"""As-of join — an operator Spark lacks natively (guide: "Common OLAP
patterns"), composed from existing DataFrame ops per the preference
order (no applyInPandas needed).

Technique: tag and union both sides on aligned schemas, then one
window per key ordered by (ts, side, tiebreak) carries the most
recent right-side payload forward (last_value ignoreNulls); left rows
then read their as-of match from the carried columns. ONE shuffle
total (the window's hashpartitioning on the key) — versus the naive
inequality-join which Spark plans as a nested-loop. Scales: the
window state is one row of right payload per partition stream, and
skewed keys can pre-split by time range.

Semantics: for each left row, the latest right row with
right_ts < left_ts (strict; ``inclusive=True`` for <=), per key;
unmatched left rows keep NULL right columns (left-join shape) —
matching DuckDB's ``ASOF LEFT JOIN ... ON l.ts > r.ts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    inclusive: bool = False,
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join left→right on key `on`, time columns left_ts/right_ts.

    right_cols: right payload columns to carry (default: all except
    key+ts). tiebreak: right column ordering ties at equal right_ts
    (latest wins); required for determinism if right_ts can repeat
    within a key. direction: "backward" (latest right BEFORE the left
    ts — the default) or "forward" (earliest right AFTER it, DuckDB's
    ``ASOF ... ON l.ts < r.ts``) — forward just flips the window's
    time scan, same single shuffle."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    # side ordering at equal ts decides inclusivity: rights sort before
    # lefts (side 0 < 1) ⇒ a right at ts == left_ts is visible ⇒ <=.
    left_side, right_side = (1, 0) if inclusive else (0, 1)

    # the key and timestamp already cross the shuffle as __k/__ts —
    # carrying them again inside the __left payload struct widens every
    # left row for no information (UnsafeRow spends 8 bytes per field);
    # the final projection reconstructs them from __k/__ts instead.
    carry_cols = [c for c in left.columns if c not in (on, left_ts)]
    # a left of exactly (key, ts) has no payload to carry; struct()
    # with zero fields is not constructible, so mark rather than carry
    left_payload = (
        F.struct(*carry_cols) if carry_cols else F.lit(True)
    ).alias("__left")

    lt = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(left_side).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        left_payload,
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    tb = (
        F.col(tiebreak).cast("long")
        if tiebreak is not None
        else F.monotonically_increasing_id()
    )
    rt = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(right_side).alias("__side"),
        tb.alias("__tb"),
        F.lit(None).cast(lt.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )

    # forward = the same carry, scanning time in reverse: the "last
    # right seen" in a descending scan is the EARLIEST right after the
    # left row. Side ordering (inclusivity) is direction-independent.
    ts_order = F.col("__ts").desc() if direction == "forward" else F.col("__ts").asc()
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_order, "__side", F.col("__tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt).select(
        "__side",
        "__k",
        "__ts",
        "__left",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
            for c in right_cols
        ],
    )
    is_left = F.col("__side") == left_side

    def _left_out(c: str) -> F.Column:
        if c == on:
            return F.col("__k").alias(c)
        if c == left_ts:
            return F.col("__ts").alias(c)
        return F.col(f"__left.{c}").alias(c)

    return carried.filter(is_left).select(
        *[_left_out(c) for c in left.columns],
        *[F.col(f"__c_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
