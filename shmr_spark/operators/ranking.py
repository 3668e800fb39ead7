"""Distributed global rank and equi-depth range sharding — the
"write the corpus globally sorted in N balanced shards" step of a
dataset export (sorted parquet for binary-searchable lookups,
curriculum-ordered training shards, ...).

Scale design: a bare ``row_number() OVER (ORDER BY key)`` funnels the
whole table through ONE task. This module reuses the two-phase scan
from operators/packing.py: an order-preserving coarse bucket of the
sort key splits the corpus; one small aggregate counts each bucket; a
window over the BUCKET TOTALS (thousands of rows) yields each
bucket's global offset; a broadcast join plus a per-bucket
row_number finishes the rank with every bucket scanning in parallel.
The bucket granularity affects only parallelism, never the result.

``range_shards`` then cuts ranks into N equal-population shards with
pure integer arithmetic — ``((rank-1) * n) div total`` — so shard
assignment is reproducible across engines (no float division at the
boundaries). This is the deterministic equivalent of
``repartitionByRange(N)`` (whose sampled boundaries are not
reproducible) and the natural pre-step for
``sortWithinPartitions(key).write`` sorted exports.

Reference scope note: the reference engine (/root/reference/shmr) has
no ordering operators at all (its partitions are unordered line
files); this module is extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


N_BUCKETS = 4096


def _auto_bucketed(df: DataFrame, key_col: str) -> DataFrame:
    """``df`` + ``__bucket``: an order-preserving coarsening of a
    numeric key into at most N_BUCKETS fixed-width cells —
    floor((key - min) / width) — so the bucket-totals table stays
    O(N_BUCKETS) no matter how large or how unique the corpus keys
    are. A naive floor(key) bucket would make the totals table O(N)
    for near-unique float keys and single-task its offsets window —
    the exact failure this module exists to avoid.

    SKEW CONTRACT (round 11): fixed-width cells assume the key range
    is populated roughly evenly — ONE outlier key stretches
    (max-min)/N_BUCKETS until nearly every real key lands in a single
    cell and the per-cell window serializes. That is acceptable here
    because (a) every consumer's default keys are bounded domains
    (prices, scores, dense ids), (b) callers with outlier-prone keys
    pass an explicit ``bucket`` (global_rank/range_shards/prefix_sum/
    pack_sequences all take one), and (c) the one operator whose
    TARGET inputs are outlier-shaped — gap detection — uses sampled
    rank-space range partitions instead (validate.missing_ranges).
    The alternative (sampled boundaries for every scan) would be
    skew-proof but costs a second full-data exchange plus a sampling
    pass on EVERY two-phase scan — the wrong default at 100 TB for
    the common well-distributed case.

    min/max ride IN-PLAN as a broadcast 1-row aggregate (one extra
    pass over df at action time) rather than a driver ``first()``:
    plan construction runs zero jobs, so composing this under an
    unexecuted pipeline segment no longer executes that segment
    eagerly (the round-8 gate-walk enforcement; previously
    training_pipeline had to pass an explicit bucket to dodge it).

    Monotonicity (not placement) is what correctness needs: IEEE
    subtract/divide by positive constants and floor are all monotone
    non-decreasing, so equal keys share a bucket and larger keys
    never get a smaller one, regardless of rounding at cell edges.
    Degenerates are pinned explicitly: a NULL key goes to bucket -1 —
    matching the NULLS-FIRST order Spark's default ascending sort
    gives the in-bucket window, so the global rank stays a total
    order (floor(NULL) falling into least() would otherwise land
    NULL keys in the TOP bucket while sorting them first WITHIN it);
    the lo==hi (or all-NULL) corpus collapses to bucket 0. The
    double division itself can't raise (ANSI exempts floating-point
    /0) — the guards are for determinism, not safety.
    """
    from shmr_spark.functions.scalars import with_scalars

    kd = F.col(key_col).cast("double")
    mm = df.groupBy().agg(F.min(kd).alias("__lo"), F.max(kd).alias("__hi"))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(N_BUCKETS)
    bucket = (
        F.when(kd.isNull(), F.lit(-1))
        .when(F.col("__lo").isNull() | (F.col("__lo") == F.col("__hi")), F.lit(0))
        .otherwise(
            F.least(F.floor((kd - F.col("__lo")) / width), F.lit(N_BUCKETS - 1))
        )
    )
    return (
        with_scalars(df, mm)
        .withColumn("__bucket", bucket.cast("long"))
        .drop("__lo", "__hi")
    )


def global_rank(
    df: DataFrame,
    key_col: str,
    id_col: str,
    bucket: Column | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Add a 1-based dense global row number by (key_col, id_col).

    ``bucket`` must be an order-preserving coarsening of ``key_col``
    (same bucket ordering as key ordering); default: fixed-width
    cells sized from an in-plan min/max aggregate (numeric keys — see
    _auto_bucketed; pass an explicit bucket for strings/dates).
    (key_col, id_col) pairs must be unique per row — the rank is
    then total-order deterministic.
    """
    ranked, _ = _global_rank_totals(df, key_col, id_col, bucket, rank_col)
    return ranked


def _global_rank_totals(
    df: DataFrame,
    key_col: str,
    id_col: str,
    bucket: Column | None,
    rank_col: str,
) -> tuple[DataFrame, DataFrame]:
    """global_rank plus its internal bucket-totals relation
    (__bucket, __bcnt) — exposed so ntile/shard callers can derive
    the row TOTAL from this ≤N_BUCKETS-row aggregate instead of
    re-aggregating ``df``, which would execute the (possibly
    expensive) upstream plan a third time: the two-phase rank
    already scans it twice (main path + totals path), and Spark
    cannot reuse the exchange across those two because the partial
    aggregation sits inside one of them."""
    if bucket is None:
        rows = _auto_bucketed(df, key_col)
    else:
        rows = df.withColumn("__bucket", bucket)

    totals = rows.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__bcnt"))
    w_b = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__bcnt").over(w_b), F.lit(0)).alias("__boff"),
    )

    w_in = Window.partitionBy("__bucket").orderBy(key_col, id_col)
    ranked = (
        rows.join(F.broadcast(offsets), "__bucket")
        .withColumn(rank_col, F.col("__boff") + F.row_number().over(w_in))
        .drop("__bucket", "__boff")
    )
    return ranked, totals


def global_ntile(
    df: DataFrame,
    key_col: str,
    id_col: str,
    n: int,
    bucket: Column | None = None,
    tile_col: str = "tile",
) -> DataFrame:
    """``ntile(n) OVER (ORDER BY key, id)`` without the single-task
    global window — global_rank's two-phase scan plus SQL ntile's
    exact remainder rule in pure integer arithmetic: with N rows, the
    first ``N % n`` tiles hold ``N div n + 1`` rows, the rest
    ``N div n`` (both Spark's NTile and DuckDB/ANSI define it this
    way), so the result is row-identical to the window function at
    any scale. Output: input columns + ``tile_col`` (1-based int).

    The N < n degenerate (quota q = 0) stays inside the first CASE
    branch — rem = N and every rank ≤ rem·(q+1) = N — so the
    ``div q`` in the ELSE never divides by zero on a taken branch
    (CASE evaluates lazily per row, ANSI mode included).
    """
    from shmr_spark.functions.scalars import with_scalars

    n = int(n)
    if n < 1:
        # F.ntile(0) fails fast at plan time; match that contract
        # instead of a DIVIDE_BY_ZERO deep inside the CASE at runtime
        raise ValueError(f"global_ntile needs n >= 1, got {n}")
    ranked, totals = _global_rank_totals(df, key_col, id_col, bucket, "__rank")
    # the row total from the ≤N_BUCKETS-row bucket-totals relation —
    # NOT from df.groupBy().count(), which would execute the upstream
    # plan a third time (on an expensive upstream that pass is the
    # whole pipeline again: deriving it here cut perplexity_buckets'
    # 10x exchange 168 MB → 100 MB and its 100x wall 36 s → 21 s)
    total = totals.agg(F.sum("__bcnt").alias("__total"))
    return (
        with_scalars(ranked, total)
        .withColumn(tile_col, _ntile_case(n))
        .drop("__rank", "__total")
    )


def _ntile_case(n: int) -> Column:
    """SQL ntile's exact remainder rule over a precomputed ``__rank``
    / ``__total`` pair, in pure integer arithmetic (`div` end to end —
    float division would drift past 2^53). The N < n degenerate
    (quota q = 0) stays inside the first CASE branch — rem = N and
    every rank ≤ rem·(q+1) = N — so the ``div q`` in the ELSE never
    divides by zero on a taken branch (CASE evaluates lazily per row,
    ANSI mode included)."""
    return F.expr(
        f"CAST(CASE WHEN __rank <= (__total % {n}) * (__total div {n} + 1) "
        f"THEN (__rank - 1) div (__total div {n} + 1) + 1 "
        f"ELSE (__total % {n}) "
        f"  + (__rank - (__total % {n}) * (__total div {n} + 1) - 1) "
        f"    div (__total div {n}) + 1 "
        f"END AS INT)"
    )


def grouped_rank(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    id_col: str,
    bucket: Column | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """``row_number() OVER (PARTITION BY group ORDER BY key, id)``
    without the one-task-per-group window — the grouped
    generalization of global_rank for the "few large groups" regime
    (per-language perplexity buckets, per-source quality ranks),
    where a bare partitioned window serializes each group through a
    single task no matter how many executors are idle.

    Same two-phase shape: one GLOBAL order-preserving coarse bucket
    of the key (a global fixed-width cell is order-preserving within
    every group, so one min/max pass serves all groups), bucket
    totals counted per (group, bucket), a window over the TOTALS
    table (≤ |groups|·N_BUCKETS rows) partitioned by group yields
    each (group, bucket)'s offset, and a broadcast join plus a
    per-(group, bucket) row_number finishes the rank with every cell
    scanning in parallel.

    Sizing contract: the broadcast offsets table is
    ≤ |groups|·N_BUCKETS rows, so this is for MODEST group
    cardinality (languages, sources, shards — thousands at most).
    With millions of tiny groups the plain partitioned window is
    already parallel (one small task per group) and is the right
    tool; this operator exists for the opposite corner.
    """
    ranked, _ = _grouped_rank_totals(
        df, group_cols, key_col, id_col, bucket, rank_col
    )
    return ranked


def _null_safe_broadcast_join(
    left: DataFrame, right: DataFrame, on: list[str]
) -> DataFrame:
    """``left`` inner-joined to ``broadcast(right)`` on ``on`` with
    NULL-SAFE equality (<=>), keeping only ``left``'s copy of the
    join columns. A plain ``join(..., on)`` uses null-unsafe ``=``
    and silently DROPS every row whose group value is NULL —
    ``row_number() OVER (PARTITION BY group)``, which these
    operators promise to reproduce, treats NULL as a partition of
    its own. eqNullSafe keys stay BroadcastHashJoin-eligible."""
    from functools import reduce

    renamed = right.select(
        *[F.col(c).alias(f"__r_{c}") for c in on],
        *[c for c in right.columns if c not in on],
    )
    cond = reduce(
        lambda a, b: a & b,
        [left[c].eqNullSafe(renamed[f"__r_{c}"]) for c in on],
    )
    joined = left.join(F.broadcast(renamed), cond)
    return joined.drop(*[f"__r_{c}" for c in on])


def _grouped_rank_totals(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    id_col: str,
    bucket: Column | None,
    rank_col: str,
) -> tuple[DataFrame, DataFrame]:
    """grouped_rank plus its (group, __bucket, __bcnt) totals
    relation — same exposure rationale as _global_rank_totals: the
    per-group row totals ntile needs are a tiny aggregate OVER this
    relation, not a third pass over ``df``."""
    if bucket is None:
        rows = _auto_bucketed(df, key_col)
    else:
        rows = df.withColumn("__bucket", bucket)

    totals = rows.groupBy(*group_cols, "__bucket").agg(
        F.count(F.lit(1)).alias("__bcnt")
    )
    w_b = (
        Window.partitionBy(*group_cols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *group_cols,
        "__bucket",
        F.coalesce(F.sum("__bcnt").over(w_b), F.lit(0)).alias("__boff"),
    )
    ranked = _null_safe_broadcast_join(
        rows, offsets, [*group_cols, "__bucket"]
    )
    w_in = Window.partitionBy(*group_cols, "__bucket").orderBy(key_col, id_col)
    ranked = ranked.withColumn(
        rank_col, F.col("__boff") + F.row_number().over(w_in)
    ).drop("__bucket", "__boff")
    return ranked, totals


def _with_group_totals(
    ranked: DataFrame, totals: DataFrame, group_cols: list[str]
) -> DataFrame:
    """``ranked`` plus a per-group ``__total`` derived from the
    bucket-totals relation (never a third pass over the input) via
    the null-safe broadcast join — the one shared tail of
    grouped_ntile and grouped_range_shards."""
    group_totals = totals.groupBy(*group_cols).agg(
        F.sum("__bcnt").alias("__total")
    )
    return _null_safe_broadcast_join(ranked, group_totals, group_cols)


def grouped_ntile(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    id_col: str,
    n: int,
    bucket: Column | None = None,
    tile_col: str = "tile",
) -> DataFrame:
    """``ntile(n) OVER (PARTITION BY group ORDER BY key, id)`` on top
    of grouped_rank — row-identical to the window function per group
    (the same ANSI remainder rule as global_ntile, applied to each
    group's own rank/total pair), with every group's scan
    parallelized across its key buckets. The CCNet head/middle/tail
    perplexity split is ntile(3) per language — exactly this shape.
    Output: input columns + ``tile_col`` (1-based int)."""
    n = int(n)
    if n < 1:
        raise ValueError(f"grouped_ntile needs n >= 1, got {n}")
    ranked, totals = _grouped_rank_totals(
        df, group_cols, key_col, id_col, bucket, "__rank"
    )
    # per-group row totals from the bucket-totals relation — a third
    # full pass over df here inflated the perplexity_buckets exchange
    # (measured 168 MB with df.groupBy(group).count() vs 100 MB via
    # this derivation at the 10x corpus; the LM upstream is 64 MB/pass)
    return (
        _with_group_totals(ranked, totals, group_cols)
        .withColumn(tile_col, _ntile_case(n))
        .drop("__rank", "__total")
    )


def range_shards(
    df: DataFrame,
    key_col: str,
    id_col: str,
    n_shards: int,
    bucket: Column | None = None,
) -> DataFrame:
    """Assign every row to one of ``n_shards`` equal-population,
    key-contiguous shards. Output: input columns + ``shard_id``
    (0-based; populations differ by at most 1 row)."""
    from shmr_spark.functions.scalars import with_scalars

    ranked, totals = _global_rank_totals(df, key_col, id_col, bucket, "rank")
    # row total from the bucket-totals relation, not a second
    # aggregation over the ranked output (same third-pass avoidance
    # as global_ntile/grouped_ntile)
    total = totals.agg(F.sum("__bcnt").alias("__total"))
    shard = F.expr(f"(rank - 1) * {int(n_shards)} div __total")
    return (
        with_scalars(ranked, total)
        .withColumn("shard_id", shard)
        .drop("rank", "__total")
    )


def grouped_range_shards(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    id_col: str,
    n_shards: int,
    bucket: Column | None = None,
) -> DataFrame:
    """Per-GROUP equal-population, key-contiguous shards — the
    curriculum-export shape: "write each language's documents into
    N quality-ordered shards of equal size", so every training shard
    draws the same corpus fraction from every group regardless of
    how unbalanced the groups are. Same pure-integer cut as
    range_shards — ``(rank − 1) · n div group_total`` — applied to
    each group's own rank/total pair from the grouped two-phase
    scan, so shard assignment is reproducible across engines and no
    group funnels through a single window task. Output: input
    columns + ``shard_id`` (0-based; populations within a group
    differ by at most 1 row)."""
    ranked, totals = _grouped_rank_totals(
        df, group_cols, key_col, id_col, bucket, "__rank"
    )
    shard = F.expr(f"(__rank - 1) * {int(n_shards)} div __total")
    return (
        _with_group_totals(ranked, totals, group_cols)
        .withColumn("shard_id", shard)
        .drop("__rank", "__total")
    )


def weighted_median(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    weight_col: str,
    tiebreak_cols: list[str],
    weight_scale: int = 100,
) -> DataFrame:
    """Exact LOWER weighted median per key: the smallest value whose
    cumulative weight (in (value, tiebreak) order) reaches half the
    key's total weight — one window pass + one aggregate, no sort of
    the whole result, no sampling.

    Weights ride as ``weight_scale``-scaled int64 so the 2·cum ≥ total
    threshold is integer-exact cross-engine; the value itself is data,
    not arithmetic, so it needs no float discipline. Returns
    (key_cols..., w_median, total_weight_scaled)."""
    ws = F.floor(F.col(weight_col) * weight_scale + F.lit(0.5)).cast("long")
    order = [F.col(value_col), *[F.col(c) for c in tiebreak_cols]]
    cum = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    per_key = Window.partitionBy(*key_cols)
    staged = df.select(
        *key_cols,
        F.col(value_col).alias("__v"),
        F.sum(ws).over(cum).alias("__cum"),
        F.sum(ws).over(per_key).alias("__tot"),
        *[F.col(c) for c in tiebreak_cols],
    ).filter(2 * F.col("__cum") >= F.col("__tot"))
    pick = F.min(F.struct("__v", *tiebreak_cols)).alias("__pick")
    return (
        staged.groupBy(*key_cols)
        .agg(pick, F.max("__tot").alias("total_weight_scaled"))
        .select(
            *key_cols,
            F.col("__pick.__v").alias("w_median"),
            "total_weight_scaled",
        )
    )
