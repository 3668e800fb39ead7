"""Per-stream state-partition sizing — the measured lever on
per-trigger fixed cost.

A streaming query's stateful operators are partitioned into
``spark.sql.shuffle.partitions`` state stores at FIRST-batch time;
the count is recorded in the checkpoint's offset log and every
restart reuses the recorded value, whatever the session conf says.
Each trigger then commits every state store (a delta file write per
store per batch for the HDFS-backed provider), so a stream whose
state is small pays per-trigger cost proportional to a setting sized
for BATCH scan parallelism. Measured on the 8-trigger per-file
tumbling replay of the 10× corpus (r13, interleaved 3+3, same
session): 32 → 8 state partitions cuts the median trigger from
1430 ms to 559 ms (−61%); the stateful Python sessionizer from
1438 ms to 1081 ms (−25%); results identical both ways. RocksDB
(plain and changelog-checkpointing) was measured on the same replay
and is wall-NEUTRAL-to-worse at this state size (hdfs 6.6 s vs 7.2/7.8 s
median replay) — the lever is the store COUNT, not the store engine.

This is deliberately an explicit per-stream option, not a changed
default: the right count tracks expected STATE volume (keys × rows
per key), which only the caller knows — a 100 TB keyspace wants
hundreds of stores, a bounded-domain aggregation wants a handful.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

_CONF = "spark.sql.shuffle.partitions"


@contextmanager
def state_partitions(spark: SparkSession, n: int | None):
    """Pin the state-partition count for streaming queries STARTED
    inside the block (``None`` = inherit the session setting, no-op).

    Session conf is process-global: hold the bracket only around
    ``.start()`` — a batch action planned by a concurrent driver
    thread inside the block would pick up the temporary setting.
    Restarts from an existing checkpoint ignore the setting (the
    count is pinned in the offset log at first batch — asserted in
    tests/test_streaming.py's recovery test)."""
    if n is None:
        yield
        return
    prev = spark.conf.get(_CONF)
    spark.conf.set(_CONF, str(int(n)))
    try:
        yield
    finally:
        spark.conf.set(_CONF, prev)
