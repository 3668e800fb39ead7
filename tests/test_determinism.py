"""Partition-count / AQE invariance: a query's result multiset must
not depend on spark.sql.shuffle.partitions or adaptive execution —
on a real cluster those differ run-to-run and engine-version-to-
version, and any drift means irreproducible training corpora. The
repo bans partition-dependent primitives (rand(), first() without
ordering, monotonically_increasing_id in results); this test pins
that ban behaviourally for a module-diverse sample of the registry.
"""

from __future__ import annotations

import math

import pytest

from shmr_spark.queries import REGISTRY, load_all

load_all()

# Module-diverse sample, weighted toward queries whose SHAPE invites
# partition dependence: first-wins dedup, hash splits, top-k, sampled
# subsets, multi-stage prefix sums, near-dup banding.
QUERIES = [
    "distinct_first",  # first-wins ordering under repartition
    "head_sorted",  # global limit
    "topk_per_group",
    "sample_k_per_group",  # hash-pick must not follow partitioning
    "stratified_sample",
    "train_test_split",
    "shuffle_shards",
    "token_budget_select",  # two-phase prefix sum
    "dedup_minhash",  # banded self-join
    "reduce_by_key_q1",  # flagship aggregate
]

# (shuffle.partitions, adaptive.enabled) variants vs the suite default
VARIANTS = [("1", "true"), ("3", "false"), ("17", "true")]


def _norm(df):
    cols = sorted(df.columns)
    rows = []
    for r in df.select(*cols).collect():
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append("NaN" if math.isnan(v) else round(v, 6))
            elif isinstance(v, list):
                vals.append(tuple(v))
            else:
                vals.append(v)
        rows.append(tuple(vals))
    rows.sort(key=repr)
    return rows


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_to_partitioning(spark, sf_dir, name):
    spec = REGISTRY[name]
    base_sp = spark.conf.get("spark.sql.shuffle.partitions")
    base_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    want = _norm(spec.fn(spark, sf_dir))
    assert want, f"{name}: empty baseline result makes the check vacuous"
    try:
        for sp, aqe in VARIANTS:
            spark.conf.set("spark.sql.shuffle.partitions", sp)
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            got = _norm(spec.fn(spark, sf_dir))
            assert got == want, (
                f"{name}: result drifted at shuffle.partitions={sp}, "
                f"adaptive={aqe}"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base_sp)
        spark.conf.set("spark.sql.adaptive.enabled", base_aqe)
