"""Analytics extensions — windows, rollup/cube/pivot, top-k,
sessionization (SURVEY.md §2.4: absent in the reference, free in
Spark, mandated by the north star).

Events timestamps surface as epoch-second BIGINTs (TZ-independent on
both engines: Spark casts the instant, DuckDB floors epoch()).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from shmr_spark.catalog import load_table
from shmr_spark.functions.zorder import sql_zorder_key
from shmr_spark.dataset import Dataset, bounded_sort
from shmr_spark.functions.numeric import dmul, dsum, sql_dsum
from shmr_spark.queries import query

# --------------------------------------------------------------------------
# Tumbling window over event time.
# --------------------------------------------------------------------------


_TUMBLING_ORACLE = f"""
SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS window_start,
       event_type,
       COUNT(*) AS n,
       {sql_dsum('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""


@query("window_tumbling", oracle=_TUMBLING_ORACLE, headline=True)
def window_tumbling(spark, sf_dir):
    ev = Dataset(load_table(spark, sf_dir, "events"))
    return (
        ev.df.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("window.start").cast("long").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "window_sliding",
    oracle=f"""
SELECT window_start, COUNT(*) AS n, {sql_dsum('value')} AS sum_value FROM (
  SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS window_start, value
  FROM events
  UNION ALL
  SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts, INTERVAL 30 MINUTE)) AS BIGINT), value
  FROM events
) GROUP BY 1
""",
)
def window_sliding(spark, sf_dir):
    """1h windows sliding every 30min — each event lands in exactly two
    windows; the oracle expresses that as a union of two bucketings."""
    ev = Dataset(load_table(spark, sf_dir, "events"))
    return (
        ev.df.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(F.col("window.start").cast("long").alias("window_start"), "n", "sum_value")
    )


# --------------------------------------------------------------------------
# Window functions: top-k per group (absent in reference; free in Spark).
# --------------------------------------------------------------------------


@query(
    "topk_per_group",
    oracle="""
SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) WHERE rn <= 3
""",
)
def topk_per_group(spark, sf_dir):
    cust = Dataset(load_table(spark, sf_dir, "customer"))
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.select("c_nationkey", "c_custkey", "c_acctbal")
        .with_columns(rn=F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .df
    )


@query(
    "topk_global",
    oracle=f"""
SELECT l_partkey, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem GROUP BY l_partkey
ORDER BY revenue DESC, l_partkey LIMIT 10
""",
)
def topk_global(spark, sf_dir):
    """Global top-k: planned as TakeOrdered (per-partition heap +
    driver merge), not a full sort. Revenue is exact-decimal so both
    engines order identically; ties broken by key."""
    li = Dataset(load_table(spark, sf_dir, "lineitem"))
    return (
        li.reduce_by_key(
            ["l_partkey"],
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .top_k(10, F.desc("revenue"), F.asc("l_partkey"))
        .df
    )


# --------------------------------------------------------------------------
# Grouping sets — rollup / cube / pivot.
# --------------------------------------------------------------------------


@query(
    "rollup_agg",
    oracle=f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@query(
    "cube_agg",
    oracle=f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def cube_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@query(
    "pivot_agg",
    oracle=f"""
SELECT l_returnflag,
       {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O,
       {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def pivot_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_O"),
            F.col("F").alias("qty_F"),
        )
        # 3 return flags at any SF: bounded sort (no range exchange)
        .transform(bounded_sort, "l_returnflag")
    )


# --------------------------------------------------------------------------
# Sessionization — lag + gap threshold (guide: "Common OLAP patterns").
# --------------------------------------------------------------------------


@query(
    "sessionize",
    oracle="""
SELECT user_id,
       CAST(SUM(CASE WHEN prev_e IS NULL OR e - prev_e > 1800 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions,
       COUNT(*) AS n_events
FROM (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS e,
         lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_e
  FROM events
) GROUP BY user_id
""",
)
def sessionize(spark, sf_dir):
    """Session counts per user with a 30-minute inactivity gap — one
    shuffle on user_id shared by the window and the aggregation."""
    ev = Dataset(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts")
    e = F.col("ts").cast("long")
    gap_new = F.when(
        F.lag(e).over(w).isNull() | ((e - F.lag(e).over(w)) > 1800), 1
    ).otherwise(0)
    return (
        ev.df.withColumn("new_sess", gap_new)
        .groupBy("user_id")
        .agg(
            F.sum("new_sess").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


# --------------------------------------------------------------------------
# Exact quantiles — Spark percentile() and DuckDB quantile_cont() use
# the same linear interpolation on doubles; verified bit-identical.
# --------------------------------------------------------------------------


@query(
    "percentiles",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.25) AS p25,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.75) AS p75
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def percentiles(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.25)").alias("p25"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.75)").alias("p75"),
        )
        # 3 return flags at any SF: bounded sort (no range exchange)
        .transform(bounded_sort, "l_returnflag")
    )


# --------------------------------------------------------------------------
# Approximate distinct — the sketch the reference can't offer. HLL
# internals differ across engines, so the gate is a TOLERANCE oracle:
# Spark emits the exact distinct count plus a boolean asserting the
# HLL estimate landed within 3x the configured rsd; the oracle emits
# the same exact count and literal TRUE. Rows hash-match iff the
# sketch actually met its bound — a hard driver-checkable signal for
# an approximate answer.
# --------------------------------------------------------------------------


@query(
    "approx_distinct",
    oracle="""
SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       TRUE AS within_bound
FROM lineitem
""",
)
def approx_distinct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rsd = 0.02
    return li.agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", rsd=rsd).alias("approx"),
    ).select(
        "exact_orders",
        (
            F.abs(F.col("approx") - F.col("exact_orders"))
            <= F.col("exact_orders") * (3 * rsd)
        ).alias("within_bound"),
    )


# --------------------------------------------------------------------------
# Structured Streaming through the correctness gate: the stream runs
# to completion on a file source and must hash-match the BATCH oracle
# — stream ≡ batch is the defining property of a correct streaming
# aggregation, and here the driver checks it, not just the test suite.
# --------------------------------------------------------------------------


from contextlib import contextmanager




def stage_events_copy(sf_dir, dest_dir):
    """Copy the events table into ``dest_dir`` for file-source stream
    replay — the ONE place that knows both corpus shapes (single
    parquet file in driver testdata, directory of part files in
    derived corpora). bench.py's cached staging uses it too, so a
    future corpus-shape change can't silently diverge there."""
    import os
    import shutil

    src = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(src):
        shutil.copytree(src, os.path.join(dest_dir, "events.parquet"))
    else:
        shutil.copy(src, dest_dir)


@contextmanager
def _staged_events_dir(sf_dir, prefix="shmr_stream_gate_"):
    """Copy the events table into a throwaway directory for
    file-source stream replay. Handles both corpus shapes (single
    parquet file in driver testdata, directory of part files in
    derived corpora). The memory sink is fully materialized before
    the gate query returns, so the copy is deleted on exit."""
    import os
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    try:
        stage_events_copy(sf_dir, d)
        yield d
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query("streaming_tumbling", oracle=_TUMBLING_ORACLE)
def streaming_tumbling(spark, sf_dir):
    from shmr_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        tumbling_window_stream,
    )

    with _staged_events_dir(sf_dir) as d:
        return run_stream_to_memory(
            tumbling_window_stream(read_events_stream(spark, d)),
            "streaming_tumbling_gate",
            output_mode="complete",
        )


# --------------------------------------------------------------------------
# Streaming dedup through the correctness gate: dropDuplicates on a
# key over the replayed stream, projected to the keys — first-arrival
# semantics over key columns only ≡ batch DISTINCT, which is the
# oracle. (The watermark-bounded variant, whose state evicts, is
# stream≡batch-tested in tests/test_streaming.py with planted
# duplicates — its window semantics are not batch-SQL-expressible
# without islands machinery.)
# --------------------------------------------------------------------------


@query(
    "streaming_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def streaming_dedup(spark, sf_dir):
    from shmr_spark.streaming import read_events_stream, run_stream_to_memory
    from shmr_spark.streaming.dedup import dedup_stream

    with _staged_events_dir(sf_dir, prefix="shmr_stream_dedup_gate_") as d:
        stream = read_events_stream(spark, d).select("user_id", "event_type")
        return run_stream_to_memory(
            dedup_stream(stream, ["user_id", "event_type"]),
            "streaming_dedup_gate",
            output_mode="append",
        )


# --------------------------------------------------------------------------
# Stream-static enrichment through the correctness gate: the events
# stream broadcast-joins the customer dimension per micro-batch, then
# aggregates per (market segment, event type). Must hash-match the
# batch join+aggregate oracle — the stream-side partitioning carries
# no extra shuffle (broadcast join), and the incremental agg across
# micro-batches must compose to exactly the batch answer.
# --------------------------------------------------------------------------


@query(
    "streaming_enrich",
    oracle=f"""
SELECT c.c_mktsegment AS mktsegment, e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum('e.value')} AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""",
)
def streaming_enrich(spark, sf_dir):
    from shmr_spark.streaming import (
        enrich_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    with _staged_events_dir(sf_dir, prefix="shmr_stream_enrich_gate_") as d:
        enriched = enrich_stream(
            read_events_stream(spark, d), dim, on="user_id", how="inner"
        )
        agg = enriched.groupBy(
            F.col("c_mktsegment").alias("mktsegment"), "event_type"
        ).agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        return run_stream_to_memory(
            agg, "streaming_enrich_gate", output_mode="complete"
        )


# --------------------------------------------------------------------------
# Window-function showcase: lag/lead/rank/ntile over a deterministic
# order — the full analytic-function surface in one oracled query.
# --------------------------------------------------------------------------


@query(
    "window_functions",
    oracle="""
SELECT o_orderkey,
       lag(o_totalprice) OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       rank() OVER w AS rnk,
       ntile(4) OVER w AS quartile,
       CAST(SUM(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
            OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS running_scaled
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
)
def window_functions(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    running = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scaled = F.floor(F.col("o_totalprice") * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return orders.select(
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        # rank/ntile/row_number are int in Spark but BIGINT in DuckDB —
        # cast so the driver's schema compare can't flag them
        F.rank().over(w).cast("long").alias("rnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.sum(scaled).over(running).cast("long").alias("running_scaled"),
    )


# --------------------------------------------------------------------------
# Time-series trend: monthly revenue via date_trunc (ntz, TZ-free on
# both engines).
# --------------------------------------------------------------------------


@query(
    "monthly_trend",
    oracle=f"""
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS revenue
FROM orders GROUP BY 1 ORDER BY 1
""",
)
def monthly_trend(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month")
        )
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
        # one row per calendar month of order history (O(years·12) at
        # any SF): bounded sort (no range exchange)
        .transform(bounded_sort, "month")
    )


# --------------------------------------------------------------------------
# Correlation/covariance — deterministically, from exact component
# sums: corr = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²)(n·Σy² − Σy²)).
# Each Σ goes through the scaled-int64 path (exact, order-free), the
# final arithmetic runs on identical doubles in both engines. A plain
# F.corr vs DuckDB corr() would drift in the last bits.
# --------------------------------------------------------------------------


def _sql_corr_from_sums(x: str, y: str) -> str:
    def s(expr, scale):
        return (
            f"CAST(CAST(SUM(CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT)) AS BIGINT)"
            f" AS DOUBLE) / {scale}"
        )

    # quantity ~ 1e1 (scale 1e6 fine); price ~ 1e5; xy ~ 1e6, y² ~ 1e10
    # → scale 1e4 keeps |sum·scale| < 2^63 with wide margin at sf0.1
    sx, sy = s(x, "1000000.0"), s(y, "10000.0")
    sxy, sxx, syy = s(f"({x}) * ({y})", "10000.0"), s(f"({x}) * ({x})", "10000.0"), s(f"({y}) * ({y})", "100.0")
    n = "CAST(COUNT(*) AS DOUBLE)"
    return (
        f"CAST(({n} * ({sxy}) - ({sx}) * ({sy})) / "
        f"sqrt(({n} * ({sxx}) - ({sx}) * ({sx})) * ({n} * ({syy}) - ({sy}) * ({sy}))) AS DOUBLE)"
    )


@query(
    "correlation",
    oracle=f"""
SELECT l_returnflag,
       {_sql_corr_from_sums('l_quantity', 'l_extendedprice')} AS corr_qty_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def correlation(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")

    def s(col, scale):
        return F.sum(
            F.floor(col * F.lit(scale) + F.lit(0.5)).cast("long")
        ).cast("double") / F.lit(scale)

    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    sx, sy = s(x, 1000000.0), s(y, 10000.0)
    sxy, sxx, syy = s(x * y, 10000.0), s(x * x, 10000.0), s(y * y, 100.0)
    n = F.count("*").cast("double")
    corr = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return (
        li.groupBy("l_returnflag")
        .agg(corr.cast("double").alias("corr_qty_price"))
        # 3 return flags at any SF: bounded sort (no range exchange)
        .transform(bounded_sort, "l_returnflag")
    )


# --------------------------------------------------------------------------
# Quantile outlier filter: rows above the exact p99 — percentile
# computed once, broadcast back as a 1-row join (no driver action).
# --------------------------------------------------------------------------


@query(
    "outlier_filter",
    oracle="""
WITH cut AS (SELECT quantile_cont(o_totalprice, 0.99) AS p99 FROM orders)
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, cut.p99
FROM orders o, cut
WHERE o.o_totalprice > cut.p99
""",
)
def outlier_filter(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cut = orders.agg(F.expr("percentile(o_totalprice, 0.99)").alias("p99"))
    return (
        orders.crossJoin(F.broadcast(cut))
        .filter(F.col("o_totalprice") > F.col("p99"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "p99")
    )


# --------------------------------------------------------------------------
# Interval (range) self-join on events: pairs of events by the same
# user within a 5-minute window — binned equi-join + residual filter,
# never a per-key cross product (operators/interval.py).
# --------------------------------------------------------------------------


@query(
    "interval_join_events",
    oracle="""
SELECT a.user_id, COUNT(*) AS n_pairs,
       MAX(ABS(epoch_us(b.ts) - epoch_us(a.ts))) AS max_gap_us
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND ABS(epoch_us(b.ts) - epoch_us(a.ts)) <= 300000000
GROUP BY a.user_id
""",
)
def interval_join_events(spark, sf_dir):
    from shmr_spark.operators.interval import interval_self_join

    ev = load_table(spark, sf_dir, "events")
    pairs = interval_self_join(
        ev, key_col="user_id", ts_col="ts", id_col="event_id", tolerance_us=300_000_000
    )
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"), F.max("gap_us").alias("max_gap_us")
    )


# --------------------------------------------------------------------------
# Approximate percentiles: the 100 TB path. Exact percentile() needs a
# full sort/collect per group; approx_percentile is a mergeable
# partial-aggregable sketch (Greenwald-Khanna) — one pass, bounded
# memory, map-side combinable. TOLERANCE oracle: Spark emits the group
# key, the exact row count, and a boolean asserting every sketch
# quantile fell inside the exact-value envelope [q-eps, q+eps]
# (eps = 0.02 rank slack, ~200x the sketch's guaranteed 1/acc rank
# error); the oracle emits the same key/count and literal TRUE, so the
# rows hash-match iff the sketch met its bound.
# --------------------------------------------------------------------------


@query(
    "approx_percentiles",
    oracle="""
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, TRUE AS within_bound
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def approx_percentiles(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    acc = 10_000  # rank error <= n/acc
    qs = [0.25, 0.5, 0.75, 0.99]
    eps = 0.02
    lo = [max(q - eps, 0.0) for q in qs]
    hi = [min(q + eps, 1.0) for q in qs]
    arr = lambda v: "array(" + ", ".join(str(x) for x in v) + ")"  # noqa: E731
    agg = li.groupBy("l_returnflag").agg(
        F.expr(f"approx_percentile(l_extendedprice, {arr(qs)}, {acc})").alias("qa"),
        F.expr(f"percentile(l_extendedprice, {arr(lo)})").alias("qlo"),
        F.expr(f"percentile(l_extendedprice, {arr(hi)})").alias("qhi"),
        F.count("*").alias("n"),
    )
    ok = F.lit(True)
    for i in range(len(qs)):
        ok = ok & (F.col("qa")[i] >= F.col("qlo")[i]) & (F.col("qa")[i] <= F.col("qhi")[i])
    return bounded_sort(
        agg.select("l_returnflag", "n", ok.alias("within_bound")),
        "l_returnflag",
    )


# --------------------------------------------------------------------------
# Mergeable HLL distinct sketches (operators/distinct_sketch.py): build
# fine-grained sketches, roll them up WITHOUT rescanning rows, check
# the estimate against the exact count — the tolerance-oracle
# discipline (exact keys/counts + within_bound), as approx_percentiles.
# --------------------------------------------------------------------------


@query(
    "distinct_sketch_rollup",
    oracle="""
SELECT lang, COUNT(text) AS n_rows,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct,
       TRUE AS within_bound
FROM documents GROUP BY lang ORDER BY lang
""",
)
def distinct_sketch_rollup(spark, sf_dir):
    from shmr_spark.operators.distinct_sketch import (
        build_distinct_sketches,
        rollup_distinct_sketches,
    )

    docs = load_table(spark, sf_dir, "documents")
    # fine grain (lang, source) → persistable sketches → lang rollup
    sketches = build_distinct_sketches(docs, ["lang", "source"], "text")
    rolled = rollup_distinct_sketches(sketches, ["lang"])
    exact = docs.groupBy(F.col("lang").alias("__lang")).agg(
        F.count_distinct("text").alias("n_distinct")
    )
    # null-safe join: a NULL-lang group must survive (the oracle's
    # plain GROUP BY keeps it; an equality join would drop it)
    out = rolled.join(
        exact, rolled["lang"].eqNullSafe(exact["__lang"])
    ).select(
        "lang",
        "n_rows",
        "n_distinct",
        (
            F.abs(F.col("distinct_est") - F.col("n_distinct"))
            <= F.lit(0.05) * F.col("n_distinct")
        ).alias("within_bound"),
    )
    return bounded_sort(out, "lang")  # fixed 5-language domain


# --------------------------------------------------------------------------
# Z-order layout key (functions/zorder.py) — oracled bit-for-bit.
# --------------------------------------------------------------------------


@query(
    "zorder_keys",
    oracle=f"""
SELECT l_orderkey, l_linenumber, {sql_zorder_key('l_partkey', 'l_suppkey')} AS zkey
FROM lineitem
""",
)
def zorder_keys(spark, sf_dir):
    from shmr_spark.functions.zorder import zorder_key

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        zorder_key("l_partkey", "l_suppkey").alias("zkey"),
    )


# --------------------------------------------------------------------------
# Stream-stream interval join through the gate: watermarked self-join
# of the events stream, hash-matched against the BATCH oracle — same
# stream ≡ batch property as streaming_tumbling.
# --------------------------------------------------------------------------


@query(
    "streaming_interval_join",
    oracle="""
SELECT a.user_id, a.event_id AS event_id_a, b.event_id AS event_id_b,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
FROM events a JOIN events b
  ON a.user_id = b.user_id AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 5 MINUTE
""",
)
def streaming_interval_join(spark, sf_dir):
    from shmr_spark.streaming import (
        interval_join_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    with _staged_events_dir(sf_dir, prefix="shmr_stream_ij_") as d:
        return run_stream_to_memory(
            interval_join_stream(
                read_events_stream(spark, d), read_events_stream(spark, d)
            ),
            "streaming_interval_join_gate",
            output_mode="append",
        )


# --------------------------------------------------------------------------
# Funnel analysis: users who reached each ordered stage (A, then B
# after A, then C after B) — min-timestamp-per-stage comparisons, one
# shuffle on user_id, no self-joins.
# --------------------------------------------------------------------------


@query(
    "funnel_stages",
    oracle="""
WITH stage AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
  FROM events GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS stage_view,
       CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     THEN 1 ELSE 0 END) AS BIGINT) AS stage_click,
       CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     AND t_buy > t_click THEN 1 ELSE 0 END) AS BIGINT)
         AS stage_purchase
FROM stage
""",
)
def funnel_stages(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")

    def first_ts(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    stage = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_buy"),
    )
    reached_view = F.col("t_view").isNotNull()
    reached_click = reached_view & (F.col("t_click") > F.col("t_view"))
    reached_buy = reached_click & (F.col("t_buy") > F.col("t_click"))
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return stage.agg(
        F.count("*").alias("n_users"),
        one(reached_view).alias("stage_view"),
        one(reached_click).alias("stage_click"),
        one(reached_buy).alias("stage_purchase"),
    )


# --------------------------------------------------------------------------
# Trailing time-window aggregate per key: RANGE BETWEEN over event
# time — the "last hour of activity per user at each event" feature
# generator. One shuffle (window on user_id).
# --------------------------------------------------------------------------


@query(
    "rolling_user_window",
    oracle=f"""
SELECT event_id, user_id,
       CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))
            OVER w AS BIGINT) AS rolling_scaled,
       COUNT(*) OVER w AS n_in_window
FROM (SELECT event_id, user_id, value, epoch_us(ts) AS us FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
)
def rolling_user_window(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_micros("ts").alias("us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    scaled = F.floor(F.col("value").cast("double") * 1000000.0 + 0.5).cast("long")
    return ev.select(
        "event_id",
        "user_id",
        F.sum(scaled).over(w).cast("long").alias("rolling_scaled"),
        F.count("*").over(w).alias("n_in_window"),
    )


# --------------------------------------------------------------------------
# Event-type transition matrix (1st-order Markov counts): lag window
# per user, then a global count per (prev, next) pair.
# --------------------------------------------------------------------------


@query(
    "event_transitions",
    oracle="""
SELECT prev_type, event_type AS next_type, COUNT(*) AS n
FROM (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
""",
)
def event_transitions(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# Distribution-rank window functions: percent_rank + cume_dist of
# every order inside its status group (the remaining analytic fns not
# covered by window_functions).
# --------------------------------------------------------------------------


@query(
    "percentile_ranks",
    oracle="""
SELECT o_orderkey,
       round(percent_rank() OVER w, 6) AS pr,
       round(cume_dist() OVER w, 6) AS cd
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
)
def percentile_ranks(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


# --------------------------------------------------------------------------
# Cohort retention: users grouped by signup day, counted on each
# later active day — two aggs and a join, the product-analytics
# staple.
# --------------------------------------------------------------------------


@query(
    "cohort_retention",
    oracle="""
WITH cohort AS (
  SELECT user_id, MIN(day(ts)) AS signup_day
  FROM events WHERE event_type = 'signup' GROUP BY user_id
)
SELECT signup_day, CAST(day(e.ts) - signup_day AS INT) AS day_offset,
       COUNT(DISTINCT e.user_id) AS n_active
FROM events e JOIN cohort c ON e.user_id = c.user_id
WHERE day(e.ts) >= signup_day
GROUP BY signup_day, day_offset
""",
)
def cohort_retention(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.dayofmonth("ts")).alias("signup_day"))
    )
    return (
        ev.join(F.broadcast(cohort), "user_id")
        .filter(F.dayofmonth("ts") >= F.col("signup_day"))
        .groupBy(
            "signup_day",
            (F.dayofmonth("ts") - F.col("signup_day")).cast("int").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


# --------------------------------------------------------------------------
# Time-weighted average per user: each reading holds until the next
# (lead window), weight = holding time. The irregular-sampling
# aggregate sensors/finance need; exact int64 weights.
# --------------------------------------------------------------------------


@query(
    "time_weighted_avg",
    oracle="""
SELECT user_id,
       CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
                * (dt_us // 1000)) AS BIGINT) AS weighted_scaled,
       CAST(SUM(dt_us // 1000) AS BIGINT) AS total_ms
FROM (
  SELECT user_id, value,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - epoch_us(ts) AS dt_us
  FROM events
)
WHERE dt_us IS NOT NULL
GROUP BY user_id
""",
)
def time_weighted_avg(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    dt = F.lead(us).over(w) - us
    scaled = F.floor(F.col("value").cast("double") * 1000000.0 + 0.5).cast("long")
    return (
        ev.select("user_id", scaled.alias("sv"), dt.alias("dt_us"))
        .filter(F.col("dt_us").isNotNull())
        # ms weights keep Σ(scaled·dt) inside int64 (µs would overflow)
        .withColumn("dt_ms", F.expr("dt_us div 1000"))
        .groupBy("user_id")
        .agg(
            F.sum(F.col("sv") * F.col("dt_ms")).cast("long").alias("weighted_scaled"),
            F.sum("dt_ms").cast("long").alias("total_ms"),
        )
    )


# --------------------------------------------------------------------------
# Conversion latency: first view → first purchase gap per user —
# conditional min aggs, then distribution stats over converters.
# --------------------------------------------------------------------------


@query(
    "conversion_latency",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_buy
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_converters,
       CAST(MIN(t_buy - t_view) AS BIGINT) AS min_us,
       CAST(MAX(t_buy - t_view) AS BIGINT) AS max_us,
       CAST(SUM(t_buy - t_view) AS BIGINT) AS sum_us
FROM firsts
WHERE t_view IS NOT NULL AND t_buy > t_view
""",
)
def conversion_latency(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("t_buy"),
    )
    gap = F.col("t_buy") - F.col("t_view")
    return (
        firsts.filter(F.col("t_view").isNotNull() & (F.col("t_buy") > F.col("t_view")))
        .agg(
            F.count("*").alias("n_converters"),
            F.min(gap).cast("long").alias("min_us"),
            F.max(gap).cast("long").alias("max_us"),
            F.sum(gap).cast("long").alias("sum_us"),
        )
    )


# --------------------------------------------------------------------------
# Latest state per key via max_by — the "current value" snapshot
# (CDC/state-table compaction) as one aggregate, no window pass.
# --------------------------------------------------------------------------


@query(
    "latest_event_state",
    oracle="""
SELECT user_id,
       arg_max(event_type, epoch_us(ts)) AS last_type,
       arg_max(value, epoch_us(ts)) AS last_value,
       CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us
FROM events
GROUP BY user_id
""",
)
def latest_event_state(spark, sf_dir):
    # (user_id, ts) is collision-free in this corpus at µs precision,
    # so the scalar ordering is deterministic on both engines (DuckDB's
    # arg_max takes no composite ordering key)
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", us).alias("last_type"),
        F.max_by("value", us).alias("last_value"),
        F.max(us).cast("long").alias("last_us"),
    )


# --------------------------------------------------------------------------
# NATIVE session windows: Spark's built-in F.session_window (merging
# event-time windows in one groupBy — the engine-managed counterpart
# of the hand-rolled islands pattern in `sessionize` and the stateful
# streaming sessionizer). The oracle replays the same session
# semantics as a lag/cumsum islands query, so the built-in operator's
# gap-merge logic is itself hash-checked.
# --------------------------------------------------------------------------


@query(
    "session_window_agg",
    oracle=f"""
WITH marked AS (
  SELECT user_id, epoch_us(ts) AS us, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events WHERE user_id < 50
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
), sess AS (
  SELECT user_id, us, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us) AS sid
  FROM marked
)
SELECT user_id,
       CAST(MIN(us) AS BIGINT) AS session_start_us,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS sum_value
FROM sess
GROUP BY user_id, sid
""",
)
def session_window_agg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("sum_value"),
            F.min(F.unix_micros("ts")).alias("session_start_us"),
        )
        .select("user_id", "session_start_us", "n_events", "sum_value")
    )


# --------------------------------------------------------------------------
# SCD2 history build: each event opens a validity interval closed by
# the user's next event (lead over the per-user timeline; the latest
# interval stays open as NULL). The warehouse-side dual of
# latest_event_state — one window pass, shuffle on user_id only.
# --------------------------------------------------------------------------


@query(
    "scd2_intervals",
    oracle="""
SELECT user_id, event_id, event_type,
       CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
       CAST(lead(epoch_us(ts)) OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts), event_id) AS BIGINT) AS valid_to_us
FROM events
WHERE user_id < 20
""",
)
def scd2_intervals(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        us.cast("long").alias("valid_from_us"),
        F.lead(us).over(w).cast("long").alias("valid_to_us"),
    )


# --------------------------------------------------------------------------
# Gaps-and-islands: longest consecutive-day activity streak per user —
# day − dense_rank(day) is constant inside an island.
# --------------------------------------------------------------------------


@query(
    "activity_streaks",
    oracle="""
WITH days AS (SELECT DISTINCT user_id, day(ts) AS d FROM events),
isl AS (
  SELECT user_id, d,
         d - dense_rank() OVER (PARTITION BY user_id ORDER BY d) AS island
  FROM days
),
runs AS (
  SELECT user_id, island, COUNT(*) AS len FROM isl GROUP BY user_id, island
)
SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(COUNT(*) AS BIGINT) AS n_streaks
FROM runs GROUP BY user_id
""",
)
def activity_streaks(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.dayofmonth("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("island", F.col("d") - F.dense_rank().over(w))
    runs = isl.groupBy("user_id", "island").agg(F.count("*").alias("len"))
    return runs.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.count("*").cast("long").alias("n_streaks"),
    )


# --------------------------------------------------------------------------
# Contribution analysis: each nation's exact share of total revenue —
# window-sum-over-all ratio (ratio_to_report), shares as exact
# scaled-int pairs so the hash can't drift.
# --------------------------------------------------------------------------


@query(
    "revenue_contribution",
    oracle="""
WITH per_nation AS (
  SELECT s_nationkey,
         CAST(SUM(CAST(floor(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE)
                             * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev_scaled
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY s_nationkey
)
SELECT s_nationkey, rev_scaled,
       CAST(SUM(rev_scaled) OVER () AS BIGINT) AS total_scaled,
       round(CAST(rev_scaled AS DOUBLE) / CAST(SUM(rev_scaled) OVER () AS DOUBLE), 9)
         AS share
FROM per_nation
""",
)
def revenue_contribution(spark, sf_dir):
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice", "l_discount")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double")
    scaled = F.floor(rev * 1000000.0 + 0.5).cast("long")
    per_nation = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(F.sum(scaled).cast("long").alias("rev_scaled"))
    )
    w = Window.partitionBy()
    total = F.sum("rev_scaled").over(w).cast("long")
    return per_nation.select(
        "s_nationkey",
        "rev_scaled",
        total.alias("total_scaled"),
        F.round(F.col("rev_scaled").cast("double") / total.cast("double"), 9).alias("share"),
    )


# --------------------------------------------------------------------------
# Forward fill (LOCF): carry the last non-null observation — here
# non-'error' readings carried over error events — via last_value
# IGNORE NULLS over an unbounded-preceding window.
# --------------------------------------------------------------------------


@query(
    "forward_fill_values",
    oracle="""
SELECT event_id, user_id,
       round(COALESCE(last_value(good_value IGNORE NULLS) OVER w, -1.0), 6)
         AS filled
FROM (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type <> 'error' THEN value END AS good_value
  FROM events
)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def forward_fill_values(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    good = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(
            F.coalesce(F.last(good, ignorenulls=True).over(w), F.lit(-1.0)), 6
        ).alias("filled"),
    )


# --------------------------------------------------------------------------
# Calendar spine: dense daily series per event_type with explicit
# zeros — sequence+explode cross the spine, left join fills gaps.
# --------------------------------------------------------------------------


@query(
    "daily_spine_counts",
    oracle="""
WITH spine AS (
  SELECT CAST(d.g AS DATE) AS day FROM generate_series(
    DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY) d(g)
),
types AS (SELECT DISTINCT event_type FROM events),
actual AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT s.day, t.event_type, COALESCE(a.n, 0) AS n
FROM spine s CROSS JOIN types t
LEFT JOIN actual a ON a.day = s.day AND a.event_type = t.event_type
""",
)
def daily_spine_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    spine = spark.sql(
        "SELECT explode(sequence(DATE '2024-01-01', DATE '2024-01-30',"
        " interval 1 day)) AS day"
    )
    types = ev.select("event_type").distinct()
    actual = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    return (
        # both sides are tiny (30 days x distinct types); broadcast
        # pins the nested-loop plan so a planner change can never
        # shuffle the spine
        spine.crossJoin(F.broadcast(types))
        .join(actual, ["day", "event_type"], "left")
        .select("day", "event_type", F.coalesce("n", F.lit(0)).alias("n"))
    )


# --------------------------------------------------------------------------
# Count-based moving aggregate: trailing-5-rows mean per group (ROWS
# BETWEEN n PRECEDING) — exact scaled sum + explicit divisor.
# --------------------------------------------------------------------------


@query(
    "moving_average_orders",
    oracle="""
SELECT o_orderkey,
       CAST(SUM(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
            OVER w AS BIGINT) AS window_scaled,
       COUNT(*) OVER w AS window_n
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""",
)
def moving_average_orders(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, Window.currentRow)
    )
    scaled = F.floor(F.col("o_totalprice") * 1000000.0 + 0.5).cast("long")
    return orders.select(
        "o_orderkey",
        F.sum(scaled).over(w).cast("long").alias("window_scaled"),
        F.count("*").over(w).alias("window_n"),
    )


# --------------------------------------------------------------------------
# Decile analysis: ntile(10) bands over order value, then per-band
# stats — the distribution-summary table behind pricing dashboards.
# --------------------------------------------------------------------------


@query(
    "order_value_deciles",
    oracle="""
SELECT CAST(decile AS INT) AS decile, COUNT(*) AS n,
       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
FROM (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
GROUP BY decile
""",
)
def order_value_deciles(spark, sf_dir):
    # A bare ntile(10) OVER (ORDER BY ...) funnels the whole orders
    # table through ONE task (the round-9 verdict's scale finding).
    # global_ntile reproduces ntile's exact remainder rule on top of
    # the two-phase global rank — same rows, parallel plan.
    from shmr_spark.operators.ranking import global_ntile

    orders = load_table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    tiled = global_ntile(orders, "o_totalprice", "o_orderkey", 10, tile_col="decile")
    return tiled.groupBy("decile").agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


# --------------------------------------------------------------------------
# Streaming trending top-k through the gate: the stream maintains
# watermarked (window, event_type) counts; the top-3 cut is the
# stateless finish pass over the materialized sink. Stream counts +
# batch rank must together hash-match the all-batch oracle.
# --------------------------------------------------------------------------


@query(
    "streaming_topk_trending",
    oracle="""
WITH counts AS (
  SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS window_start,
         event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY window_start ORDER BY n DESC, event_type
         ) AS INT) AS rk
  FROM counts
)
SELECT window_start, event_type, n, rk FROM ranked WHERE rk <= 3
""",
)
def streaming_topk_trending(spark, sf_dir):
    from shmr_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        trending_topk_finish,
        trending_topk_stream,
    )

    with _staged_events_dir(sf_dir, prefix="shmr_stream_topk_gate_") as d:
        counts = run_stream_to_memory(
            trending_topk_stream(read_events_stream(spark, d)),
            "streaming_topk_gate",
            output_mode="complete",
        )
    return trending_topk_finish(counts, k=3)


@query(
    "ewma_customer_orders",
    oracle="""
WITH o AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         lag(o_totalprice, 1) OVER w AS l1,
         lag(o_totalprice, 2) OVER w AS l2,
         lag(o_totalprice, 3) OVER w AS l3,
         lag(o_totalprice, 4) OVER w AS l4
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
)
SELECT o_custkey, o_orderkey,
       round((((o_totalprice + 0.5 * COALESCE(l1, 0))
               + 0.25 * COALESCE(l2, 0))
               + 0.125 * COALESCE(l3, 0))
               + 0.0625 * COALESCE(l4, 0), 6) AS ewma
FROM o
""",
)
def ewma_customer_orders(spark, sf_dir):
    """Exponentially weighted moving average of order value per
    customer — as EXPLICIT lag terms, not a frame aggregate: a
    window SUM over doubles has engine-defined accumulation order,
    but a fixed left-associated expression over lag() values is the
    same IEEE evaluation on both engines, so the float result
    hash-matches without the scaled-sum machinery. The window
    partitions by customer — parallel, never global."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    orders = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    terms = (
        (
            (p + F.lit(0.5) * F.coalesce(F.lag(p, 1).over(w), F.lit(0.0)))
            + F.lit(0.25) * F.coalesce(F.lag(p, 2).over(w), F.lit(0.0))
        )
        + F.lit(0.125) * F.coalesce(F.lag(p, 3).over(w), F.lit(0.0))
    ) + F.lit(0.0625) * F.coalesce(F.lag(p, 4).over(w), F.lit(0.0))
    return orders.select(
        "o_custkey", "o_orderkey", F.round(terms, 6).alias("ewma")
    )


# --------------------------------------------------------------------------
# CUSUM drift detection (operators/changepoint.py): the max(0, ...)
# recursion rewritten as prefix-sum minus running-min — two window
# functions, one shuffle, pure int64 arithmetic ⇒ hash-exact oracle.
# --------------------------------------------------------------------------


@query(
    "drift_cusum_events",
    oracle="""
WITH b AS (
  SELECT event_type, event_id, ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS xs
  FROM events
),
t AS (
  SELECT *,
         CAST(SUM(xs) OVER (PARTITION BY event_type) AS BIGINT)
           // CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS target
  FROM b
),
s AS (
  SELECT event_type, ts, event_id,
         CAST(SUM(xs - target) OVER w AS BIGINT) AS S
  FROM t
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
),
c AS (
  SELECT event_type,
         S - least(CAST(0 AS BIGINT), CAST(MIN(S) OVER w AS BIGINT)) AS cusum
  FROM s
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
)
SELECT event_type,
       CAST(SUM(CASE WHEN cusum > 150000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_alarms,
       CAST(MAX(cusum) AS BIGINT) AS max_cusum_scaled
FROM c GROUP BY event_type ORDER BY event_type
""",
)
def drift_cusum_events(spark, sf_dir):
    from shmr_spark.operators.changepoint import with_cusum

    ev = load_table(spark, sf_dir, "events")
    cu = with_cusum(
        ev, ["event_type"], ["ts", "event_id"], "value", scale=100
    )
    agg = cu.groupBy("event_type").agg(
        F.sum(F.when(F.col("cusum_scaled") > 150000, 1).otherwise(0))
        .cast("long")
        .alias("n_alarms"),
        F.max("cusum_scaled").alias("max_cusum_scaled"),
    )
    return bounded_sort(agg, "event_type")  # fixed 5-type domain


# --------------------------------------------------------------------------
# Linear interpolation across gaps — forward_fill's two-sided sibling:
# 'error' readings are treated as missing and reconstructed between
# the surrounding good observations. Two IGNORE NULLS windows (last
# preceding / first following); the ratio divides identical longs cast
# to double on both engines, rounded to 6 per the float discipline.
# --------------------------------------------------------------------------


@query(
    "interpolate_gaps",
    oracle="""
SELECT event_id, user_id,
  round(CASE
    WHEN prev_e IS NULL AND next_e IS NULL THEN CAST(-1.0 AS DOUBLE)
    WHEN prev_e IS NULL THEN next_v
    WHEN next_e IS NULL THEN prev_v
    WHEN prev_e = next_e THEN prev_v
    ELSE prev_v + (next_v - prev_v)
         * (CAST(e - prev_e AS DOUBLE) / CAST(next_e - prev_e AS DOUBLE))
  END, 6) AS interp
FROM (
  SELECT event_id, user_id, e,
         last_value(gv IGNORE NULLS) OVER wp AS prev_v,
         last_value(ge IGNORE NULLS) OVER wp AS prev_e,
         first_value(gv IGNORE NULLS) OVER wn AS next_v,
         first_value(ge IGNORE NULLS) OVER wn AS next_e
  FROM (
    SELECT event_id, user_id, ts,
           CAST(floor(epoch(ts)) AS BIGINT) AS e,
           CASE WHEN event_type <> 'error' THEN value END AS gv,
           CASE WHEN event_type <> 'error'
                THEN CAST(floor(epoch(ts)) AS BIGINT) END AS ge
    FROM events)
  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
""",
)
def interpolate_gaps(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    e = F.col("ts").cast("long")
    good = F.col("event_type") != "error"
    base = ev.select(
        "event_id",
        "user_id",
        "ts",
        e.alias("e"),
        F.when(good, F.col("value")).alias("gv"),
        F.when(good, e).alias("ge"),
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ann = base.select(
        "event_id",
        "user_id",
        "e",
        F.last("gv", ignorenulls=True).over(wp).alias("prev_v"),
        F.last("ge", ignorenulls=True).over(wp).alias("prev_e"),
        F.first("gv", ignorenulls=True).over(wn).alias("next_v"),
        F.first("ge", ignorenulls=True).over(wn).alias("next_e"),
    )
    ratio = (F.col("e") - F.col("prev_e")).cast("double") / (
        F.col("next_e") - F.col("prev_e")
    ).cast("double")
    interp = (
        F.when(
            F.col("prev_e").isNull() & F.col("next_e").isNull(),
            F.lit(-1.0).cast("double"),
        )
        .when(F.col("prev_e").isNull(), F.col("next_v"))
        .when(F.col("next_e").isNull(), F.col("prev_v"))
        .when(F.col("prev_e") == F.col("next_e"), F.col("prev_v"))
        .otherwise(
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * ratio
        )
    )
    return ann.select(
        "event_id", "user_id", F.round(interp, 6).alias("interp")
    )


# --------------------------------------------------------------------------
# Interval-union coverage (operators/interval.py interval_union_length):
# per-user active seconds from overlapping 5-minute event spans,
# overlaps counted once — a sweep line in two windows, exact integers.
# --------------------------------------------------------------------------


@query(
    "interval_union_coverage",
    oracle="""
WITH iv AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + 300 AS t
  FROM events
),
pts AS (
  SELECT user_id, s AS tm, 1 AS d, event_id FROM iv
  UNION ALL
  SELECT user_id, t, -1, event_id FROM iv
),
sw AS (
  SELECT user_id,
         CAST(SUM(d) OVER w AS BIGINT) AS active,
         lead(tm) OVER wl - tm AS gap
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY tm, d DESC, event_id
               ROWS UNBOUNDED PRECEDING),
         wl AS (PARTITION BY user_id ORDER BY tm, d DESC, event_id)
)
SELECT user_id,
       CAST(SUM(CASE WHEN active > 0 THEN gap ELSE 0 END) AS BIGINT) AS covered,
       CAST(COUNT(*) // 2 AS BIGINT) AS n_intervals
FROM sw GROUP BY user_id
""",
)
def interval_union_coverage(spark, sf_dir):
    from shmr_spark.operators.interval import interval_union_length

    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("s"),
        (F.col("ts").cast("long") + 300).alias("t"),
    )
    return interval_union_length(
        iv, ["user_id"], "s", "t", tiebreak_col="event_id"
    )


# --------------------------------------------------------------------------
# Exact weighted median (operators/ranking.py weighted_median): the
# quantity-weighted median extended price per return flag — cumulative
# scaled-int weights make the half-total threshold integer-exact.
# --------------------------------------------------------------------------


@query(
    "weighted_median_price",
    oracle="""
WITH b AS (
  SELECT l_returnflag, l_extendedprice AS v, l_orderkey, l_linenumber,
         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS ws
  FROM lineitem
),
c AS (
  SELECT l_returnflag, v, l_orderkey, l_linenumber,
         CAST(SUM(ws) OVER w AS BIGINT) AS cum,
         CAST(SUM(ws) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
  FROM b
  WINDOW w AS (PARTITION BY l_returnflag
               ORDER BY v, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING)
),
p AS (
  SELECT l_returnflag, v, tot,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY v, l_orderkey, l_linenumber) AS rn
  FROM c WHERE 2 * cum >= tot
)
SELECT l_returnflag, v AS w_median, tot AS total_weight_scaled
FROM p WHERE rn = 1
ORDER BY l_returnflag
""",
)
def weighted_median_price(spark, sf_dir):
    from shmr_spark.operators.ranking import weighted_median

    li = load_table(spark, sf_dir, "lineitem")
    out = weighted_median(
        li,
        ["l_returnflag"],
        "l_extendedprice",
        "l_quantity",
        ["l_orderkey", "l_linenumber"],
    )
    return bounded_sort(out, "l_returnflag")  # 3 flags


# --------------------------------------------------------------------------
# Sliding distinct count: unique users active in the trailing hour at
# each event — a RANGE window + collect_set (state bounded by the
# window span). DuckDB has no DISTINCT window aggregates, so the twin
# is the correlated-subquery definition itself — O(n·window) and
# gate-scale only, which is exactly why the window form is the engine
# path.
# --------------------------------------------------------------------------


@query(
    "sliding_distinct_users",
    oracle="""
SELECT e.event_id,
       CAST((SELECT COUNT(DISTINCT e2.user_id)
             FROM events e2
             WHERE e2.event_type = e.event_type
               AND CAST(floor(epoch(e2.ts)) AS BIGINT)
                   BETWEEN CAST(floor(epoch(e.ts)) AS BIGINT) - 3600
                       AND CAST(floor(epoch(e.ts)) AS BIGINT)) AS BIGINT)
         AS n_active_users
FROM events e
""",
)
def sliding_distinct_users(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    e = F.col("ts").cast("long")
    w = (
        Window.partitionBy("event_type")
        .orderBy(e)
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        F.size(F.collect_set("user_id").over(w)).cast("long").alias(
            "n_active_users"
        ),
    )


# --------------------------------------------------------------------------
# Largest-remainder apportionment (operators/selection.py apportion):
# an exact-total sample quota per language — base floor quotas plus
# leftover seats to the largest integer remainders. Pure int64.
# --------------------------------------------------------------------------


@query(
    "apportion_sample_quota",
    oracle="""
WITH c AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS W FROM c),
s AS (
  SELECT lang, n,
         CAST((1000 * n) // W AS BIGINT) AS base,
         CAST((1000 * n) % W AS BIGINT) AS rem
  FROM c CROSS JOIN t
),
lo AS (SELECT CAST(1000 - SUM(base) AS BIGINT) AS seats FROM s),
r AS (
  SELECT lang, n, base,
         row_number() OVER (ORDER BY rem DESC, lang) AS rk
  FROM s
)
SELECT lang, n,
       CAST(base + CASE WHEN rk <= seats THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM r CROSS JOIN lo
ORDER BY lang
""",
)
def apportion_sample_quota(spark, sf_dir):
    from shmr_spark.operators.selection import apportion

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n"))
    out = apportion(counts, total=1000, key_cols=["lang"])
    return bounded_sort(out, "lang")  # 5 languages


# --------------------------------------------------------------------------
# Per-group OLS regression from exact sufficient statistics: slope and
# intercept derive from five order-insensitive aggregates (n, Σx, Σy,
# Σxy, Σx²) computed via the scaled-int64 dsum discipline, so both
# engines feed IDENTICAL doubles into the identical closed-form
# arithmetic — the one place float regression is hash-comparable.
# (F.regr_slope / DuckDB regr_slope are NOT: their internal summation
# orders differ.) One partial+final aggregate pass; no second scan.
# --------------------------------------------------------------------------


@query(
    "regression_price_qty",
    oracle=f"""
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {sql_dsum('l_quantity')} AS sx,
         {sql_dsum('l_extendedprice')} AS sy,
         {sql_dsum('l_quantity * l_extendedprice')} AS sxy,
         {sql_dsum('l_quantity * l_quantity')} AS sxx
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS intercept
FROM s
ORDER BY l_returnflag
""",
)
def regression_price_qty(spark, sf_dir):
    """OLS fit of extendedprice against quantity per returnflag.
    |Σxy| ≈ 2.6e10 at sf0.01 — three orders under dsum's int64 wrap
    bound, and the runtime wrap guard fails loudly if a larger corpus
    ever crosses it."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    x = F.col("l_quantity").cast("double")
    y = F.col("l_extendedprice").cast("double")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(dmul(x, y)).alias("sxy"),
        dsum(dmul(x, x)).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return bounded_sort(
        s.select(
            "l_returnflag",
            n.cast("long").alias("n"),
            F.round(slope, 6).alias("slope"),
            F.round((sy - slope * sx) / n, 6).alias("intercept"),
        ),
        "l_returnflag",
    )
