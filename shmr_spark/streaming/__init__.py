from shmr_spark.streaming.windows import (
    read_events_stream,
    tumbling_window_stream,
    sliding_window_stream,
    trending_topk_stream,
    trending_topk_finish,
    run_stream_to_memory,
)
from shmr_spark.streaming.stateful import sessionize_stream
from shmr_spark.streaming.joins import interval_join_stream
from shmr_spark.streaming.dedup import dedup_stream, dedup_stream_watermarked
from shmr_spark.streaming.enrich import enrich_stream
from shmr_spark.streaming.sinks import (
    idempotent_batch_writer,
    stream_foreach_batch,
    stream_to_parquet,
)
from shmr_spark.streaming.tuning import state_partitions

__all__ = [
    "enrich_stream",
    "read_events_stream",
    "tumbling_window_stream",
    "sliding_window_stream",
    "trending_topk_stream",
    "trending_topk_finish",
    "run_stream_to_memory",
    "sessionize_stream",
    "interval_join_stream",
    "dedup_stream",
    "dedup_stream_watermarked",
    "idempotent_batch_writer",
    "state_partitions",
    "stream_foreach_batch",
    "stream_to_parquet",
]
