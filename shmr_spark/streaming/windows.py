"""Structured Streaming over the events table: event-time windows with
watermarks for late data (SURVEY.md §2.4 — the reference has no
streaming; this is the north-star extension).

Sources are file streams (parquet directories) here; on a real
deployment swap ``readStream.format("kafka")`` — every transformation
below is source-agnostic. Batch twins of these windows live in
queries/analytics.py (window_tumbling / window_sliding) and the test
suite asserts stream ≡ batch on the same data — the defining property
of a correct streaming aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from shmr_spark.functions.numeric import dsum

def _events_raw_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 64
) -> DataFrame:
    """File-stream the events parquet directory, normalizing ts to a
    UTC-epoch TIMESTAMP exactly as the batch loader does
    (catalog.load_table): the corpus has shipped ts both as
    TIMESTAMP(NANOS) (long under the nanosAsLong conf) and as plain
    micros TIMESTAMP_NTZ. A one-footer batch probe picks the form —
    file streams require an explicit schema, and declaring the wrong
    physical type silently misreads the column (caught live: the
    sf1-derived corpus ships ts as plain TIMESTAMP (LTZ, already
    UTC-normalized by catalog.load_table before the rewrite), and an
    NTZ-declared stream over it read the column as null — zero output
    rows, found by the bench's streaming scale row).

    max_files_per_trigger defaults to 64 (batched) rather than 1:
    the round-5 scale measurements showed per-file triggers cost
    ~0.9 s of state-store commit + batch planning EACH (tumbling
    replay 4.7–6× wall at 10× rows), while batched triggers hold
    1.0–1.4× — rows, not trigger count, should set the wall. Pass
    max_files_per_trigger=1 explicitly for the degenerate per-file
    framing (bench keeps one such row to keep the overhead visible).
    Watermark note: batching is the SAFER default for replay parity
    too — fewer watermark advances between files means fewer chances
    to drop stragglers mid-replay."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        ts_type = dict(spark.read.parquet(source_dir).dtypes).get("ts")
    except Exception:
        # cold start: the source directory may be empty before the
        # first file lands — assume the current corpus form (micros
        # TIMESTAMP_NTZ) rather than failing stream startup
        ts_type = "timestamp_ntz"
    if ts_type == "bigint":
        raw = (
            spark.readStream.schema(_events_raw_schema(T.LongType()))
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .option("recursiveFileLookup", "true")
            .parquet(source_dir)
        )
        # exact int64 division — floor(ts/1000) would lose micros
        # through double above 2^53 ns (see catalog.load_table)
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if ts_type == "timestamp":
        # already a UTC-epoch TIMESTAMP (LTZ) — e.g. a corpus written
        # back out by this engine after load_table normalization
        return (
            spark.readStream.schema(_events_raw_schema(T.TimestampType()))
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .option("recursiveFileLookup", "true")
            .parquet(source_dir)
        )
    raw = (
        spark.readStream.schema(_events_raw_schema(T.TimestampNTZType()))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(source_dir)
    )
    # NTZ wall time ≙ UTC, timezone-independent (see catalog.load_table)
    return raw.withColumn(
        "ts",
        F.expr(
            "timestamp_micros(timestampdiff(MICROSECOND, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts))"
        ),
    )


def tumbling_window_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window agg with a late-data watermark —
    streaming twin of queries/analytics.window_tumbling."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("window.start").cast("long").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_window_stream(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide))
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(F.col("window.start").cast("long").alias("window_start"), "n", "sum_value")
    )


def trending_topk_stream(
    events: DataFrame,
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed per-key counts — the STATEFUL half of a streaming
    trending-top-k. Streaming can't rank over its own aggregate
    (a window-over-agg needs the window closed), so the design every
    production trending pipeline uses applies: the stream maintains
    (window, key) counts with watermark-bounded state, and the
    top-k cut is a stateless post-pass on the sink —
    ``trending_topk_finish`` here, or the same expression inside a
    foreachBatch sink writer. State per window is O(|keys|), evicted
    at the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), key_col)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").cast("long").alias("window_start"),
            key_col,
            "n",
        )
    )


def trending_topk_finish(counts: DataFrame, key_col: str = "event_type", k: int = 3) -> DataFrame:
    """Rank the materialized windowed counts to top-k per window —
    deterministic tie-break by key. Partitioned window: parallel per
    window_start, never a global sort."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start").orderBy(F.desc("n"), F.asc(key_col))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def run_stream_to_memory(
    sdf: DataFrame,
    name: str,
    output_mode: str = "complete",
    state_partitions: int | None = None,
) -> DataFrame:
    """Drive a streaming DF to completion into an in-memory table
    (test/smoke harness): processAllAvailable → stop → return the
    materialized result as a batch DF. ``state_partitions`` pins the
    state-store count for this stream (streaming/tuning.py — the
    per-trigger fixed-cost lever for small-state streams)."""
    from shmr_spark.streaming.tuning import state_partitions as _sp

    with _sp(sdf.sparkSession, state_partitions):
        q = (
            sdf.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return sdf.sparkSession.sql(f"SELECT * FROM {name}")
