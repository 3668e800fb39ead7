"""Compat tier — reference-exact opaque-Python-fn semantics.

The reference's entire UDF surface is ``--fn`` import paths with these
calling conventions (SURVEY.md §2.4): map ``(rec)->rec``, flat_map
``(rec)->iter``, filter ``(rec)->bool``, reduce ``(rec, accum?)->accum``
with the 1-arg seeding rule (/root/reference/shmr/partition.py:174-204:
no init_val ⇒ first record seeds via ``fn(record)``, relying on the
fn's default second arg), and key fns ``(rec)->hashable``.

These run records through arbitrary Python, so they are the documented
slow path: RDD-based, no Catalyst, no codegen. First-class pipelines
use the native Dataset methods; this tier exists so a reference user's
functions run unmodified.

Records cross the boundary as dicts (Row.asDict) to match the
reference's JSON-object records.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql.types import StructType

from shmr_spark.dataset import Dataset


def _to_record(row: Row) -> dict:
    return row.asDict(recursive=True)


def _records_to_df(spark: SparkSession, rdd, schema: StructType | str | None) -> DataFrame:
    if schema is not None:
        return spark.createDataFrame(rdd, schema=schema)
    return spark.createDataFrame(rdd)


def map_records(ds: Dataset, fn: Callable[[dict], dict], schema: StructType | str | None = None) -> Dataset:
    """partition.map with an opaque fn (/root/reference/shmr/partition.py:114-132)."""
    spark = ds.df.sparkSession
    rdd = ds.df.rdd.map(lambda row: fn(_to_record(row)))
    return Dataset(_records_to_df(spark, rdd, schema))


def flat_map_records(ds: Dataset, fn: Callable[[dict], Any], schema: StructType | str | None = None) -> Dataset:
    """partition.flat_map: fn returns an iterable, each element becomes
    a record (/root/reference/shmr/partition.py:134-152)."""
    spark = ds.df.sparkSession
    rdd = ds.df.rdd.flatMap(lambda row: fn(_to_record(row)))
    return Dataset(_records_to_df(spark, rdd, schema))


def filter_records(ds: Dataset, fn: Callable[[dict], bool]) -> Dataset:
    """partition.filter with an opaque predicate — schema unchanged
    (the reference copies the raw line byte-identical,
    /root/reference/shmr/partition.py:154-172)."""
    spark = ds.df.sparkSession
    schema = ds.df.schema
    rdd = ds.df.rdd.filter(lambda row: bool(fn(_to_record(row))))
    return Dataset(spark.createDataFrame(rdd, schema=schema))


_NO_INIT = object()


def reduce_records(ds: Dataset, fn: Callable, init_val: Any = _NO_INIT) -> Any:
    """Global fold to ONE value (reference #8/#16).

    Strictly SEQUENTIAL like the reference (its fold is one process,
    one pass, order-dependent — /root/reference/shmr/partitions.py:145),
    so arbitrary non-associative fns are exact: records stream to the
    driver partition-by-partition via toLocalIterator (never
    materialized at once). A partial-fold-then-merge scheme would need
    fn to accept accumulator-shaped inputs, which the reference's fn
    contract (record, accum) does not promise. The scale path for
    folds is the native Dataset.reduce with algebraic aggregates.
    Empty dataset + no init ⇒ None (the reference writes ``null``).
    """
    has_init = init_val is not _NO_INIT
    accum, seeded = (init_val, True) if has_init else (None, False)
    for row in ds.df.toLocalIterator():
        rec = _to_record(row)
        accum = fn(rec, accum) if seeded else fn(rec)
        seeded = True
    return accum if seeded else None


def reduce_by_key_records(
    ds: Dataset,
    key_fn: Callable[[dict], Any],
    fn: Callable,
    init_val: Any = _NO_INIT,
    schema: StructType | str | None = None,
) -> Dataset:
    """Generic keyed fold (reference #9: in-memory dict key→accum,
    same seeding rule per key, accumulator must carry the key —
    /root/reference/shmr/partition.py:206-237). Distributed as
    RDD keyBy → per-partition dict fold → reduceByKey merge; the
    shuffle carries one accumulator per key per partition (map-side
    combine), the same partial/final composition the reference user
    builds by hand (SURVEY.md §3)."""
    has_init = init_val is not _NO_INIT
    init = init_val if has_init else None
    spark = ds.df.sparkSession

    def fold_partition(it):
        accums: dict[Any, Any] = {}
        for row in it:
            rec = _to_record(row)
            k = key_fn(rec)
            if k in accums:
                accums[k] = fn(rec, accums[k])
            elif has_init:
                accums[k] = fn(rec, init)
            else:
                accums[k] = fn(rec)
        yield from accums.items()

    def merge(a, b):
        # Accumulators are record-shaped; merging partials requires the
        # user's fn to accept (accum_as_record, accum); true for the
        # reference's accumulate-in-place idiom.
        return fn(a, b)

    rdd = ds.df.rdd.mapPartitions(fold_partition).reduceByKey(merge).values()
    return Dataset(_records_to_df(spark, rdd, schema))


def distinct_records_per_partition(ds: Dataset, key_fn: Callable[[dict], Any]) -> Dataset:
    """Reference #3 parity: first-occurrence-wins dedup WITHIN each
    partition only (an in-memory set per file,
    /root/reference/shmr/partition.py:83-100) — not a global dedup.
    Use Dataset.distinct/distinct_first for the global operator."""
    spark = ds.df.sparkSession
    schema = ds.df.schema

    def dedup(it):
        seen = set()
        for row in it:
            k = key_fn(_to_record(row))
            if k not in seen:
                seen.add(k)
                yield row

    return Dataset(spark.createDataFrame(ds.df.rdd.mapPartitions(dedup), schema=schema))
