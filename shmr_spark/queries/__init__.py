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
# across rounds 7-8 (bloom semi/anti, regression), and stays at 179
# in round 9 (no new gates; the round's work is instrumentation and
# the bloom regime guard). Round-9 window: with round 8 recorded,
# every one of the 179 gates has driver-green evidence at some round;
# the freshness floor is 3 queries at r4 and 36 at r5. This window
# takes ALL of them — completing the second full registry pass (every
# gate's newest green >= r5) and closing most of the third:
#   1. the 3 queries whose newest green is round 4 — explicitly
#      rolled here by the round-8 window comment (window_functions,
#      window_sliding, zorder_keys);
#   2. changed-code-this-round (standing rule: new/changed plans
#      outrank rotation): the two bloom gates now pass mode="bloom"
#      through the round-9 regime guard (operators/bloom.py
#      _resolve_mode — auto mode short-circuits small dims to the
#      measured-faster broadcast join, so the gates pin the bloom
#      path explicitly);
#   3. the entire 36-query round-5 cohort (the oldest evidence after
#      group 1);
#   4. canaries (standing policy): previously-green anchors spread
#      across modules/tiers, drawn from the r6 cohort so they also
#      advance the next-oldest evidence — relational fact-fact,
#      three-way join, compat map/reduce, dedup-LSH, PQ-ANN, text,
#      streaming, multimodal. Names absent from this list keep module
#      registration order after it.
_PRIORITY: list[str] = [
    # -- group 1: newest green is r4, rolled from the r8 window (3)
    "window_functions",
    "window_sliding",
    "zorder_keys",
    # -- group 2: plans changed this round — bloom regime guard (2)
    "bloom_semi_join_revenue",
    "bloom_anti_join_revenue",
    # -- group 3: the full r5 cohort (36)
    "apportion_sample_quota",
    "asof_join_next",
    "bpe_encode_counts",
    "coalesce_count",
    "concat_union",
    "dedup_keep_best_quality",
    "distinct_first",
    "distinct_keys",
    "distinct_sketch_rollup",
    "drift_cusum_events",
    "dsum_decimal_overflow",
    "ewma_customer_orders",
    "flat_map_tokens",
    "interpolate_gaps",
    "interval_union_coverage",
    "inverted_index",
    "join_anti",
    "join_left",
    "join_semi",
    "knn_join_exact",
    "lang_id",
    "leakage_safe_split",
    "missing_id_ranges",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_variety",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q21_single_fault_suppliers",
    "q4_order_priority",
    "q8_market_share",
    "set_except",
    "set_intersect",
    "sliding_distinct_users",
    "temperature_balanced_mix",
    "weighted_median_price",
    # -- group 4: canaries, module-diverse, from the r6 cohort (9)
    "q3_top_orders",
    "join_three_way",
    "map_project",
    "reduce_global",
    "dedup_embedding_lsh",
    "similarity_ivfpq_topk",
    "text_stats",
    "streaming_tumbling",
    "multimodal_featurize",
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
