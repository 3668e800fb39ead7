"""Query registry — one named query per implemented operator
(SURVEY.md §2 inventory + the LLM-pipeline extensions), each paired
with an ANSI-SQL DuckDB oracle twin where SQL can express it.

Contract (driver, __spark_entry__.py): the Spark callable and the
oracle must produce identical column NAMES and value-hash-identical
contents at sf0.01. Conventions enforced here:

- every computed column is aliased identically on both sides;
- double aggregates go through exact decimal arithmetic
  (functions.numeric) so summation order can't break the hash;
- timestamps are cast to epoch-second BIGINTs on both sides so
  timezone/precision representation can't break it;
- every query has a deterministic row set (no bare LIMIT without
  ORDER BY).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL twin; None → rows-only check
    headline: bool = False  # include in bench.py timing set


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, headline: bool = False):
    """Register a (spark_fn, oracle_sql) pair."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


# Registry emission order. The driver's correctness gate has a budget
# (rounds 1-2 recorded exactly the first 50 registered queries), so
# the order below is part of the verification strategy. Round-3
# window = 31 + 14 + 5 = 50, in three groups:
#   1. the 31 queries that have never received a CORRECTNESS row
#      (slot 51+ of the round-2 ordering);
#   2. the 14 gates whose oracle is new this round — 12 converted
#      from rows-only to real DuckDB oracles, plus the new JPEG and
#      WAV media gates (each needs its first hash-checked row);
#   3. a 5-query canary subset of previously-green queries — bench
#      headliners plus streaming/event queries, because the round-3
#      corpus changed events.ts to TIMESTAMP_NTZ and those greens
#      must be re-proved on the new physical type.
# Slots 51+ then queue the remaining events canary and the six
# queries ADDED in round 3 (locally parity-checked at sf0.001 and
# sf0.01; first in line for the round-4 window).
# Canary policy (standing): every round keeps a handful of
# previously-green queries inside the window so a regression in
# rotated-out code is caught on a bounded cadence; names absent from
# this list keep module registration order after it.
_PRIORITY: list[str] = [
    # -- group 1: never driver-checked (31)
    "similarity_indexed_topk",
    "cohort_retention",
    "time_weighted_avg",
    "conversion_latency",
    "latest_event_state",
    "activity_streaks",
    "revenue_contribution",
    "forward_fill_values",
    "daily_spine_counts",
    "moving_average_orders",
    "order_value_deciles",
    "json_extract_props",
    "salted_agg_revenue",
    "stratified_sample",
    "train_test_split",
    "unpivot_melt",
    "histogram",
    "merge_upsert",
    "profile_columns",
    "salted_join_revenue",
    "validate_orders",
    "grouping_sets_agg",
    "grouped_mad",
    "cogroup_reconcile",
    "variant_extract",
    "udtf_sentences",
    "fuzzy_name_pairs",
    "activity_bitmaps",
    "referential_integrity",
    "bool_aggregates",
    "null_safe_join",
    # -- group 2: oracle new this round (14)
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "dedup_corpus_neardup",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "similarity_ivf_kmeans_topk",
    "similarity_quantized_rerank",
    "knn_join_lsh",
    "tfidf_top_terms",
    "bm25_top_terms",
    "unigram_logprob_score",
    "multimodal_audio_featurize",
    "multimodal_jpeg_featurize",
    # -- group 3: canaries (5) — headliners + events/streaming
    #    re-proof on the NTZ corpus (reduce_by_key_q1 also re-proves
    #    the round-3 overflow-shadow change to dsum/davg)
    "reduce_by_key_q1",
    "window_tumbling",
    "asof_join_prev",
    "streaming_tumbling",
    "streaming_interval_join",
    # ---- slot 51+: next in line if the budget exceeds 50; otherwise
    #      the round-4 rotation front. All are parity-checked green
    #      locally on the current corpus.
    "sessionize",
    "pack_sequences",
    "inverted_index",
    "sentence_dedup",
    "training_subset",
    "session_window_agg",
    "scd2_intervals",
    "redact_pii",
]


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect: registry fills) and
    return the registry, reordered so never-driver-checked queries
    occupy the driver's correctness-gate budget first (see _PRIORITY)."""
    from shmr_spark.queries import relational  # noqa: F401
    from shmr_spark.queries import analytics  # noqa: F401
    from shmr_spark.queries import text  # noqa: F401
    from shmr_spark.queries import vectors  # noqa: F401
    from shmr_spark.queries import advanced  # noqa: F401
    from shmr_spark.queries import pipeline  # noqa: F401

    ordered: dict[str, QuerySpec] = {}
    for name in _PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
