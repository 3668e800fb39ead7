"""Writers/sinks.

The reference writes one output file per operator invocation with
templated names and optional gzip/bz2 (/root/reference/shmr/misc.py:23-47,
partition_writer.py). Spark owns file naming; we expose directory,
partition count, compression, and ``max_records_per_file`` — the
scale-correct form of the reference's records_per_partition coalesce
sizing (/root/reference/shmr/partitions.py:97-100): the sink splits
files at N records without any driver-side re-chunk pass.

Empty-output pruning (delete_on_empty / on_close_delete_if_empty,
/root/reference/shmr/partition.py:154-172) is Spark's default — empty
partitions don't produce files.
"""

from __future__ import annotations

from shmr_spark.dataset import Dataset


def _writer(
    ds: Dataset,
    mode: str,
    num_partitions: int | None,
    max_records_per_file: int | None,
    partition_by: list[str] | None,
):
    df = ds.df
    if num_partitions is not None:
        df = df.repartition(num_partitions)
    w = df.write.mode(mode)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w


def write_parquet(
    ds: Dataset,
    path: str,
    mode: str = "overwrite",
    num_partitions: int | None = None,
    max_records_per_file: int | None = None,
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> None:
    _writer(ds, mode, num_partitions, max_records_per_file, partition_by).option(
        "compression", compression
    ).parquet(path)


def write_orc(
    ds: Dataset,
    path: str,
    mode: str = "overwrite",
    num_partitions: int | None = None,
    max_records_per_file: int | None = None,
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    _writer(ds, mode, num_partitions, max_records_per_file, partition_by).option(
        "compression", compression
    ).orc(path)


def write_ndjson(
    ds: Dataset,
    path: str,
    mode: str = "overwrite",
    num_partitions: int | None = None,
    max_records_per_file: int | None = None,
    compression: str | None = None,
) -> None:
    w = _writer(ds, mode, num_partitions, max_records_per_file, None)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_csv(
    ds: Dataset,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    num_partitions: int | None = None,
    max_records_per_file: int | None = None,
    compression: str | None = None,
) -> None:
    w = _writer(ds, mode, num_partitions, max_records_per_file, None).option(
        "header", str(header).lower()
    )
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def write_text(
    ds: Dataset,
    path: str,
    mode: str = "overwrite",
    num_partitions: int | None = None,
    compression: str | None = None,
) -> None:
    w = _writer(ds, mode, num_partitions, None, None)
    if compression:
        w = w.option("compression", compression)
    w.text(path)


def manifest(spark, path: str):
    """Dataset manifest from parquet footers: one row per data file
    with row count and byte size — metadata only, no data scan. The
    scale analog of the reference's `.meta` sidecars
    (/root/reference/shmr/partition_writer.py:64-85): counts come from
    footers Spark already wrote, instead of a bookkeeping file per
    partition."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    rows = []
    for f in sorted(_glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)):
        md = pq.ParquetFile(f).metadata
        rows.append((os.path.relpath(f, path), md.num_rows, os.path.getsize(f)))
    return spark.createDataFrame(rows, "file string, n_rows long, n_bytes long")


def write_sorted_shards(
    df,
    path: str,
    key_col: str,
    id_col: str,
    n_shards: int,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """Globally sorted export: N equal-population, key-contiguous
    parquet shards, each internally sorted by (key, id) — the layout
    a binary-searchable lookup table or a curriculum-ordered training
    corpus wants.

    Built on operators/ranking.range_shards (deterministic two-phase
    rank — see that module for why repartitionByRange's sampled
    boundaries are not used), then one hash repartition on shard_id
    and a sortWithinPartitions: parquet min/max column stats per
    shard file line up with the shard ranges, so later range filters
    on key_col prune at the row-group level. partitionBy(shard_id)
    keeps shard identity in the directory layout.
    """
    from pyspark.sql import functions as F

    from shmr_spark.operators.ranking import range_shards

    sharded = range_shards(df, key_col, id_col, n_shards)
    # repartitionByRange, not hash repartition: hash(shard_id) % n is
    # not a bijection, so hash routing piles several shards into one
    # task and leaves others empty (correct output — partitionBy still
    # splits directories — but a third of the write parallelism lost).
    # Range partitioning on an already-balanced 0..n-1 key gives one
    # shard per task.
    (
        sharded.repartitionByRange(n_shards, F.col("shard_id"))
        .sortWithinPartitions(key_col, id_col)
        .write.mode(mode)
        .option("compression", compression)
        .partitionBy("shard_id")
        .parquet(path)
    )


def compact_dataset(
    spark,
    path: str,
    target_file_mb: int = 128,
    compression: str = "snappy",
) -> dict:
    """Compact a parquet directory's many small files into ~target-size
    files — the maintenance pass every incremental-ingest / streaming
    sink needs (each micro-batch and each upsert wave leaves small
    files; scan cost at 100 TB is dominated by file-open overhead once
    the average file drops below a few MB).

    Sizing comes from the existing footers (manifest() — metadata
    only, no data scan): target partition count =
    ceil(total_bytes / target_mb). The rewrite is one coalesce-free
    repartition(n) — an all-to-all exchange, the price of re-chunking,
    paid once per compaction cycle. The write goes to a sibling temp
    dir first and is ROW-COUNT VALIDATED against the input footers
    before any rename touches the original, so a failed or lossy
    rewrite leaves the input untouched. The swap itself is two
    renames (POSIX has no atomic directory exchange); a crash between
    them leaves the full original data under the ``<path>.old_*``
    sibling — nothing is deleted until the new directory is in place.

    The distributed-write analog of the reference's
    partitions.coalesce (/root/reference/shmr/partitions.py:81-123),
    sized by bytes instead of records and without its sequential
    driver-side copy. Returns {files_before, files_after, bytes}.
    """
    import math
    import os
    import shutil
    import uuid

    files = manifest(spark, path).collect()
    n_before = len(files)
    total_bytes = sum(f["n_bytes"] for f in files)
    n_parts = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))

    tmp = os.path.join(
        os.path.dirname(os.path.abspath(path)),
        f".compact_{uuid.uuid4().hex[:12]}",
    )
    (
        spark.read.parquet(path)
        .repartition(n_parts)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(tmp)
    )
    rows_before = sum(f["n_rows"] for f in files)
    rows_tmp = sum(
        f["n_rows"] for f in manifest(spark, tmp).collect()
    )
    if rows_tmp != rows_before:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction dropped rows ({rows_before} -> {rows_tmp}); "
            f"input left untouched at {path}"
        )
    old = path.rstrip("/") + f".old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    n_after = manifest(spark, path).count()
    return {
        "files_before": n_before,
        "files_after": int(n_after),
        "bytes": total_bytes,
    }
