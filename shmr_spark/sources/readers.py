"""Readers — the reference's ser/deser codec surface re-expressed.

Reference codecs (/root/reference/shmr/funcs.py:7-25, main.py:100-103):
ND-JSON (orjson default), CSV, raw text; transparent gzip/bz2 by file
extension (/root/reference/shmr/misc.py:6-20); glob inputs
(/root/reference/shmr/partitions.py:16-21); --skip_nrows header
skipping (/root/reference/shmr/partition.py:31-33).

Spark covers all of it natively: json/csv/text readers decompress
.gz/.bz2 by extension, glob paths, and csv(header=True) subsumes
skip_nrows. Every reader returns a Dataset so operator chains start
lazy and schema'd.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from shmr_spark.dataset import Dataset


def read_parquet(spark: SparkSession, path: str) -> Dataset:
    """Columnar default: pushdown + pruning + footer row counts."""
    return Dataset(spark.read.parquet(path))


def read_parquet_evolved(spark: SparkSession, path: str) -> Dataset:
    """Schema-evolution read: union the schemas of every file
    (mergeSchema), so a dataset written across code versions — columns
    added over time — reads as one relation with NULLs where a file
    predates a column. Footer-only merge; no data pass."""
    return Dataset(spark.read.option("mergeSchema", "true").parquet(path))


def read_orc(spark: SparkSession, path: str) -> Dataset:
    """ORC — Spark's other built-in columnar format (predicate
    pushdown + pruning like parquet); zero extra dependencies."""
    return Dataset(spark.read.orc(path))


def read_ndjson(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> Dataset:
    """Newline-delimited JSON — the reference's default codec.
    Pass a schema in production; inference double-scans."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return Dataset(reader.json(path))


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = False,
    **options,
) -> Dataset:
    """CSV partitions. header=True is the reference's skip_nrows=1."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return Dataset(reader.csv(path, header=header))


def read_text(spark: SparkSession, path: str) -> Dataset:
    """Raw-line codec (str_loads): one string column ``value``,
    trailing newline stripped — matching
    /root/reference/shmr/funcs.py:23-25."""
    return Dataset(spark.read.text(path))


def read_ndjson_tolerant(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = "_corrupt_record",
) -> tuple[Dataset, Dataset]:
    """ND-JSON ingest that QUARANTINES malformed lines instead of
    failing the job or silently dropping them — what a web-crawl
    ingest needs: at 100 TB some lines are always truncated or
    mis-encoded, and a single bad byte must cost one row, not a task.

    PERMISSIVE parsing; unparseable lines land whole in
    ``corrupt_col``. Returns (good, quarantined) — good rows without
    the corrupt column, quarantined raw lines for a re-parse or audit
    sink. A schema is mandatory: inference would silently adopt the
    corrupt shape.

    Built as from_json over a text scan rather than the JSON reader:
    the reader path disallows corrupt-column-only queries and the
    standard workaround (.cache() before splitting) pins a full copy
    of every ingested input in executor storage for the session —
    the wrong trade at ingest scale. Each returned branch re-scans
    the text (two scans total if both are consumed; scans are the
    cheap part of ingest) and holds no state.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    full = (
        StructType.fromDDL(schema) if isinstance(schema, str) else schema
    ).add(corrupt_col, StringType())
    parsed = spark.read.text(path).select(
        F.from_json(
            "value", full, {"columnNameOfCorruptRecord": corrupt_col}
        ).alias("__r"),
        F.col("value"),
    )
    # from_json yields a NULL struct (not a corrupt record) for empty
    # lines and the literal `null` — those are quarantine material
    # too, not all-null "good" rows
    ok = F.col("__r").isNotNull() & F.col(f"__r.{corrupt_col}").isNull()
    good = parsed.filter(ok).select("__r.*").drop(corrupt_col)
    bad = parsed.filter(~ok).select(F.col("value").alias(corrupt_col))
    return Dataset(good), Dataset(bad)
