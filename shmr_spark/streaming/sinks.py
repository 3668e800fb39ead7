"""Streaming sinks beyond the memory/test harness.

``stream_to_parquet`` — append-mode parquet file sink with
checkpointing: exactly-once per micro-batch via the file-sink commit
log; survives restarts (the checkpoint dir carries source offsets).

``stream_foreach_batch`` — the escape hatch for sinks Spark lacks
(JDBC upserts, dedup-before-write): each micro-batch arrives as a
normal DataFrame with an epoch id; the callback can run arbitrary
batch logic. Idempotence across retries is the callback's contract —
key it on epoch_id.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def stream_to_parquet(
    sdf: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    state_partitions: int | None = None,
) -> StreamingQuery:
    """Append-only parquet sink (aggregations need a watermark so
    append mode can finalize windows). ``state_partitions`` pins the
    state-store count at first start (streaming/tuning.py); restarts
    from the checkpoint reuse the recorded count."""
    from shmr_spark.streaming.tuning import state_partitions as _sp

    with _sp(sdf.sparkSession, state_partitions):
        return (
            sdf.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )


def stream_foreach_batch(
    sdf: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    output_mode: str = "update",
    state_partitions: int | None = None,
) -> StreamingQuery:
    from shmr_spark.streaming.tuning import state_partitions as _sp

    with _sp(sdf.sparkSession, state_partitions):
        return (
            sdf.writeStream.outputMode(output_mode)
            .foreachBatch(fn)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )


def idempotent_batch_writer(out_dir: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch callback with the standard exactly-once recipe:
    each micro-batch lands under ``batch_id=<epoch>/`` via dynamic
    partition overwrite, so a RETRIED epoch (sink failure after a
    partial write, restart before the checkpoint commit) REPLACES its
    partial output instead of appending a duplicate. Readers see
    ``spark.read.parquet(out_dir)`` as usual; the batch_id column
    doubles as an audit trail of which epoch delivered each row.

    This is the contract stream_foreach_batch's docstring asks of
    callbacks ("key it on epoch_id"), packaged.
    """

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            from pyspark.sql import functions as F

            (
                batch_df.withColumn("batch_id", F.lit(int(epoch_id)))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(out_dir)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return write
