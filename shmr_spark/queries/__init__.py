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
# The registry was CLOSED at 176 through round 6, REOPENED to 178 in
# round 7 (bloom_semi_join_revenue, regression_price_qty) — and those
# two shipped WITHOUT window slots, which is how the bloom ANSI
# overflow reached the tree unverified (VERDICT r7). It is 179 as of
# round 8 (bloom_anti_join_revenue, windowed on arrival). Round-8's
# window re-establishes the rule that new/changed code outranks
# rotation:
#   1. the two r7-introduced gates, never driver-checked (bloom now
#      carries the r8 overflow fix, verified at sf0.001 + sf0.01
#      locally and by tests/test_bloom.py), plus the r8 anti-join
#      twin;
#   2. the three queries whose plans changed this round when the
#      gate-walk job-count enforcement (tests/test_gate_schemas.py)
#      flagged their plan-construction driver actions — each now
#      computes its scalar (token total / φ·N threshold / min-max
#      bucket width) as an in-plan broadcast 1-row aggregate;
#   3. 40 of the 43 queries whose newest green is round 4 — the
#      oldest evidence left after r7 rotated the r3 cohort (39 listed
#      below; range_shards_orders is the 40th, already in group 2).
#      The remaining 3 (window_functions, window_sliding,
#      zorder_keys) roll to round 9, which completes the second full
#      registry pass;
#   4. canaries (standing policy): previously-green anchors spread
#      across modules/tiers — the flagship aggregate, the compat RDD
#      fold, and one gate each from the dedup / ANN / relational
#      fact-fact tiers. Names absent from this list keep module
#      registration order after it.
_PRIORITY: list[str] = [
    # -- group 1: gates new in r7/r8, first driver evidence (3)
    "bloom_semi_join_revenue",
    "regression_price_qty",
    "bloom_anti_join_revenue",
    # -- group 2: plans changed this round (3)
    "unigram_logprob_score",
    "heavy_hitters_tokens",
    "range_shards_orders",
    # -- group 3: 39 of the 43 r4-latest greens (rotation cohort)
    "apply_side_effect",
    "bool_aggregates",
    "bpe_pair_counts",
    "corpus_snapshot_diff",
    "correlation",
    "count_distinct",
    "cube_agg",
    "dedup_incremental",
    "dedup_minhash_incremental",
    "dedup_semantic",
    "duplicate_spans",
    "event_transitions",
    "filter_orders",
    "interval_join_events",
    "monthly_trend",
    "multimodal_resize",
    "outlier_filter",
    "pack_sequences",
    "pagerank_trade_graph",
    "percentile_ranks",
    "percentiles",
    "pivot_agg",
    "q10_returned_top_customers",
    "q14_promo_share",
    "q18_large_orders",
    "redact_pii",
    "rolling_user_window",
    "rollup_agg",
    "rollup_incremental",
    "scd2_intervals",
    "sentence_dedup",
    "session_window_agg",
    "sessionize",
    "split_by_key_buckets",
    "token_budget_select",
    "topk_global",
    "topk_per_group",
    "training_subset",
    "validate_orders",
    # -- group 4: canaries (5)
    "reduce_by_key_q1",
    "compat_records_fold",
    "dedup_exact",
    "similarity_topk",
    "q9_profit_by_nation",
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
