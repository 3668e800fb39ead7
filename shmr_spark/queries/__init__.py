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
# The registry was CLOSED at 176 through round 6, reopened to 179
# across rounds 7-8 (bloom semi/anti, regression), held at 179
# through round 10, opened to 187 across round 11 (the four
# layout/interop roundtrip gates + lm_perplexity, repetition_metrics,
# ngram_decontamination, dsir_select) and to 188 in round 12
# (dsir_select_hashed and dsir_select_ngram_hashed — the paper's
# hashed-feature DSIR estimators, token-level and full
# unigram+bigram, the bounded-feature-space variants for web-scale
# vocabularies — then nb_lang_classifier, the in-plan multinomial
# Naive Bayes train+score pipeline of functions/nb.py,
# perplexity_buckets, the CCNet head/middle/tail per-language
# terciles over operators/ranking.grouped_ntile, and
# curriculum_shards, per-language equal-population quality shards
# over grouped_range_shards, corpus_datacard, the per-source
# datasheet aggregate, and nb_target_select, the FineWeb-Edu-style
# classifier-margin selection → 194, then q2/q11/q12/q20 — the last
# four TPC-H query shapes, completing all 22 → 198, and finally the
# corpus-diagnostics tier: distinct_ngram_diversity (Li et al. 2016
# distinct-n), source_unigram_kl (per-source KL vs the corpus blend,
# the DoReMi-style mixing diagnostic), and cross_source_overlap (the
# shared 8-gram source matrix) → 201, and weighted_sample_quality —
# deterministic Efraimidis–Spirakis exact-size weighted sampling
# without replacement → 202, and zipf_slope — the Zipf power-law
# exponent over the two-phase global rank, the Heaps-curve
# companion → 203).
# Round-12 window: after round 11 the freshness histogram is 42 gates
# at r8, 45 at r9, 50 at r10, 50 at r11 — the r8 cohort is the oldest
# evidence and fills the bulk of the window (the r11 verdict's task
# 1, computed from CORRECTNESS_r01-r11). This window takes:
#   1. changed-plans-this-round (standing rule: new/changed plans or
#      oracles outrank rotation): the NEW dsir_select_hashed gate,
#      and dsir_select (its term table gained a feature-projection
#      step shared with the hashed variant — the optimized plan is
#      expected unchanged, but a changed analyzed plan re-gates);
#   2. the entire 42-gate round-8 cohort (the oldest evidence);
#   3. canaries (standing policy): previously-green anchors spread
#      across modules/tiers, drawn from the r9 cohort so they also
#      advance the next-oldest evidence. Names absent from this list
#      keep module registration order after it.
# The nine gates added AFTER this round's window was frozen
# (q2_min_cost_supplier, q11_important_parts, q12_late_priority_mix,
# q20_dominant_promo_suppliers, distinct_ngram_diversity,
# source_unigram_kl, cross_source_overlap, weighted_sample_quality,
# zipf_slope) could not displace the
# r8 cohort without breaking the r11 verdict's all-42 rotation task;
# they carry three-decade local oracle evidence this round and HEAD
# THE R13 WINDOW by the standing new-plans-first rule — along with
# ngram_decontamination, whose oracle text changed late in r12 (the
# gram-SQL helper dedup; semantics identical, re-hash-matched at
# sf0.001-0.1).
_PRIORITY: list[str] = [
    # -- group 1: plans/oracles changed or NEW this round (8; the
    #    NB classifier/selector, CCNet perplexity-tercile,
    #    curriculum-shard and corpus-datacard gates joined mid-round
    #    and take the canary slots per the standing new-plans-first
    #    rule — the r8 cohort is untouched, and every tier the
    #    displaced canaries covered still advances via its r8
    #    members)
    "nb_target_select",
    "nb_lang_classifier",
    "perplexity_buckets",
    "curriculum_shards",
    "corpus_datacard",
    "dsir_select_ngram_hashed",
    "dsir_select_hashed",
    "dsir_select",
    # -- group 2: the full r8 cohort (42)
    "apply_side_effect",
    "bool_aggregates",
    "bpe_pair_counts",
    "corpus_snapshot_diff",
    "correlation",
    "count_distinct",
    "cube_agg",
    "dedup_exact",
    "dedup_incremental",
    "dedup_semantic",
    "duplicate_spans",
    "event_transitions",
    "filter_orders",
    "interval_join_events",
    "monthly_trend",
    "outlier_filter",
    "percentile_ranks",
    "percentiles",
    "pivot_agg",
    "q10_returned_top_customers",
    "q14_promo_share",
    "q18_large_orders",
    "q9_profit_by_nation",
    "range_shards_orders",
    "redact_pii",
    "reduce_by_key_q1",
    "regression_price_qty",
    "rolling_user_window",
    "rollup_agg",
    "rollup_incremental",
    "scd2_intervals",
    "sentence_dedup",
    "session_window_agg",
    "sessionize",
    "similarity_topk",
    "split_by_key_buckets",
    "token_budget_select",
    "topk_global",
    "topk_per_group",
    "training_subset",
    "unigram_logprob_score",
    "validate_orders",
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
