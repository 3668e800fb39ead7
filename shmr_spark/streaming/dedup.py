"""Streaming deduplication: drop duplicate records as they arrive,
with state bounded by the event-time watermark.

Two tiers, both built on Spark's native streaming dedup state store
(no custom Python state):

- ``dedup_stream``: exact-once-forever semantics via
  ``dropDuplicates`` on key columns — state grows with distinct keys
  (unbounded; right when the key space is bounded, e.g. event_id
  replay protection within a run).
- ``dedup_stream_watermarked``: ``dropDuplicatesWithinWatermark`` —
  a duplicate arriving within the watermark window of its first
  occurrence is dropped, and state older than the watermark is
  evicted. This is the 100 TB shape: bounded state regardless of key
  cardinality, the standard at-least-once → effectively-once bridge
  for replayed sources (kafka redelivery, file re-pickup).

The batch twin is ``dedup/exact.py`` (content fingerprints) or a
plain dropDuplicates on the same keys; the test suite asserts
stream ≡ batch on the same corpus with planted duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(events: DataFrame, key_cols: list[str]) -> DataFrame:
    """Exact streaming dedup on ``key_cols`` — state keyed by the
    distinct keys seen (unbounded; prefer the watermarked form when
    the key space grows with time)."""
    return events.dropDuplicates(key_cols)


def dedup_stream_watermarked(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming dedup with watermark-bounded state: duplicates of a
    record arriving within ``watermark`` of it are dropped; state for
    keys older than the watermark is evicted, so the state store size
    tracks the watermark window, not history."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
