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
# After round 5 the registry is CLOSED (all 176 queries have a green
# driver row in r1-r5), so round-6's window is pure rotation +
# re-verification: 30 + 11 + 9 = 50, in three groups:
#   1. the 30 queries whose newest green is round 2 — the oldest
#      driver evidence left in the series (and r2 is the round whose
#      window caught 12 reds, so this cohort has history). Landing
#      these makes every registry query's newest green r3+. One of
#      them, embedding_neardup, was found VACUOUS this round (its r2
#      "green" compared empty-vs-empty at tau=0.99 — the corpus max
#      natural cosine is ~0.51) and reshaped to tau=0.35; its row
#      here is its first NON-vacuous driver evidence.
#   2. the 12 queries whose code changed in round 6 and therefore
#      need fresh driver rows regardless of when they last greened:
#      the two PQ gates (codebook now built in-plan, no corpus
#      collect), q7 + q22 (reshaped non-vacuous at every SF),
#      dedup_embedding_lsh (degenerate config now an explicit
#      parallel cross join), join_grouped (merge hint now opt-in,
#      gate passes merge_other=True), triangle_count_trade (vertex
#      encoding string→long), and the 5 streaming gates (batched
#      triggers are now the engine default).
#   3. canaries (standing policy): previously-green anchors spread
#      across modules/tiers so a regression in rotated-out code is
#      caught on a bounded cadence — the flagship aggregate, the
#      compat RDD fold, §2 trivia, and one gate each from dedup/
#      relational tiers. Names absent from this list keep module
#      registration order after it.
_PRIORITY: list[str] = [
    # -- group 1: the 30 r2-latest greens (rotation cohort)
    "approx_distinct",
    "approx_percentiles",
    "chunk_documents",
    "clean_text",
    "contamination_check",
    "doc_token_overlap",
    "embedding_neardup",
    "fingerprint_docs",
    "fingerprint_winnow",
    "funnel_stages",
    "heavy_hitters_tokens",
    "join_three_way",
    "label_centroids",
    "mix_training_sources",
    "multimodal_featurize",
    "ngram_jaccard",
    "numbers_in_text",
    "q3_top_orders",
    "q6_promo_revenue",
    "quality_length_band",
    "quality_score",
    "quantize_embeddings",
    "repetition_ratio",
    "sample_k_per_group",
    "shuffle_shards",
    "text_stats",
    "token_count",
    "token_frequencies",
    "vector_stats",
    "vocab_growth",
    # -- group 2: round-6 code changes needing fresh rows (12)
    "triangle_count_trade",
    "similarity_pq_topk",
    "similarity_ivfpq_topk",
    "q7_nation_volume",
    "q22_dormant_customers",
    "dedup_embedding_lsh",
    "join_grouped",
    "streaming_tumbling",
    "streaming_dedup",
    "streaming_enrich",
    "streaming_interval_join",
    "streaming_topk_trending",
    # -- group 3: canaries (8) — filter_orders rotated out to make
    #    room for triangle's re-verification (its pushdown shape is
    #    exercised by most relational gates; it has r4 evidence)
    "reduce_by_key_q1",
    "compat_records_fold",
    "head_sorted",
    "count_lineitem",
    "map_project",
    "reduce_global",
    "join_inner",
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
