"""Table loaders for the driver's synthetic parquet corpus
(TESTDATA.md): TPC-H-ish star schema + events/documents/embeddings.

The reference's "dataset = sorted glob of partition files"
(/root/reference/shmr/partitions.py:13-24) maps to Spark's native
path-glob reads; for the test corpus each table is a single parquet
file, but ``load_table`` accepts globs and directories unchanged —
at 100 TB a table is a directory of thousands of files and nothing
here changes.
"""

from __future__ import annotations

import os
from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Session-scoped table-metadata cache: spark.read.parquet() builds a
# fresh FileIndex + reads the footer schema on every call (~100 ms
# per table on local disk; a directory listing RPC per table on object
# storage). A catalog caches that — the returned DataFrame is a lazy,
# immutable plan root, safe to share across queries in one session.
# Staleness contract: files that change under a cached path need
# load_table(..., refresh=True), same as a catalog's REFRESH TABLE.
_df_cache: WeakKeyDictionary = WeakKeyDictionary()


def load_table(
    spark: SparkSession, sf_dir: str, name: str, refresh: bool = False
) -> DataFrame:
    """Load one corpus table. Column pruning + predicate pushdown reach
    the parquet scan because nothing is materialized here.

    ``events.ts`` has shipped in two physical forms across corpus
    generations: TIMESTAMP(NANOS) (which Spark 4 rejects without the
    nanosAsLong legacy conf) and plain micros TIMESTAMP without a
    timezone flag (which Spark 4 reads as TIMESTAMP_NTZ). Both are
    normalized here to a UTC-epoch TIMESTAMP (LTZ) so every downstream
    query sees one type, and epoch extraction matches DuckDB's naive
    semantics regardless of the session timezone."""
    key = (os.path.abspath(sf_dir), name)
    cached = _df_cache.setdefault(spark, {})
    if not refresh and key in cached:
        return cached[key]
    df = _read_table(spark, sf_dir, name)
    cached[key] = df
    return df


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) surfaced as LONG nanos under the legacy
            # conf. `ts div 1000` is exact int64 division — `floor(ts
            # / 1000)` would round-trip through double and lose micros
            # above 2^53 ns (~1971). `div` truncates toward zero,
            # matching DuckDB's nanos→micros truncation post-epoch.
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            # isParquetTimestampNTZ → interpret the wall-clock value as
            # UTC, exactly as DuckDB treats its naive TIMESTAMP. Pure
            # NTZ arithmetic (timestampdiff vs the NTZ epoch) keeps the
            # conversion independent of the session timezone — a cast
            # to TIMESTAMP would inject the local zone offset.
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestamp_micros(timestampdiff(MICROSECOND, "
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts))"
                ),
            )
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every corpus table lazily (no I/O beyond footer reads)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so spark.sql() queries can
    name them exactly as the DuckDB oracle does."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
