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
