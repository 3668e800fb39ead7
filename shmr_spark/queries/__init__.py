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
# (round 1 recorded exactly the first 50 registered queries), so the
# order below is part of the verification strategy: queries that have
# never received a CORRECTNESS row come first, with the bench
# headliners and the LLM-pipeline gate queries (dedup / similarity /
# text) at the very front; previously-green queries rotate to the
# back. Names absent from this list (e.g. queries added later) keep
# their module registration order after it.
_PRIORITY: list[str] = [
    # -- bench headliners never driver-checked in round 1
    "text_stats",
    "dedup_exact",
    "similarity_topk",
    "asof_join_prev",
    # -- bench headliners (green in r01; keep in-window so every
    #    headliner has a fresh row this round)
    "reduce_by_key_q1",
    "join_three_way",
    "sql_q5_region_revenue",
    "q6_promo_revenue",
    "q3_top_orders",
    "window_tumbling",
    # -- round-2 fixes that must re-prove against the driver
    "funnel_stages",
    "approx_distinct",
    "approx_percentiles",
    # -- dedup / similarity / vector gates (never checked)
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "embedding_neardup",
    "dedup_corpus_neardup",
    "ngram_jaccard",
    "doc_token_overlap",
    "knn_join_exact",
    "knn_join_lsh",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "similarity_ivf_kmeans_topk",
    "similarity_quantized_rerank",
    "quantize_embeddings",
    "vector_stats",
    "label_centroids",
    # -- text-pipeline gates (never checked)
    "token_count",
    "lang_id",
    "quality_score",
    "fingerprint_docs",
    "fingerprint_winnow",
    "contamination_check",
    "clean_text",
    "chunk_documents",
    "repetition_ratio",
    "token_frequencies",
    "tfidf_top_terms",
    "bm25_top_terms",
    "heavy_hitters_tokens",
    "quality_length_band",
    "shuffle_shards",
    "mix_training_sources",
    "sample_k_per_group",
    "unigram_logprob_score",
    "vocab_growth",
    "numbers_in_text",
    # -- multimodal (real PNG decode lands this round)
    "multimodal_featurize",
    # ---- slot 51+: remaining never-checked queries, next in line if
    #      the driver budget is larger (or for round-3 rotation)
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

    ordered: dict[str, QuerySpec] = {}
    for name in _PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
