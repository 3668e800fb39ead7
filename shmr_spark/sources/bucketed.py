"""Bucketed tables — shuffle-free co-located joins.

At 100 TB the dominant join cost is shuffling the fact table. Writing
it bucketed by the join key (``bucketBy + sortBy + saveAsTable``)
pre-partitions the data on disk; any later equi-join or aggregation
on that key reads co-located buckets and skips the Exchange entirely
(asserted by tests/test_bucketed.py on the physical plan).

This is the persistent-storage analog of the reference's
``split_by_key`` (SURVEY.md §2 #10): shmr users materialize hash
buckets as files precisely so later per-bucket jobs avoid re-routing;
bucketed tables are the Spark-native form with the planner aware of
the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from shmr_spark.dataset import Dataset


def write_bucketed(
    ds: Dataset | DataFrame,
    table: str,
    key: str | list[str],
    num_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    df = ds.df if isinstance(ds, Dataset) else ds
    keys = [key] if isinstance(key, str) else key
    w = df.write.mode(mode).format(fmt).bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> Dataset:
    return Dataset(spark.table(table))
