"""Measure the Bloom semi-join reduction against its alternatives
(verdict r7 task 6): the claim in operators/bloom.py — "pre-filters
the fact scan down to selectivity+FP of its rows BEFORE the exchange"
— carried as a number, not a docstring assertion.

Regime framing (what this A/B is and is not): bloom_semi_join targets
the dim-too-big-to-BROADCAST regime, where a plain left_semi must
shuffle the ENTIRE fact table on the join key. The bench therefore
pins spark.sql.autoBroadcastJoinThreshold=-1 for the shuffle arms —
at 100 TB a multi-ten-million-key dim is past broadcast range by
construction, while at bench scale Catalyst would happily broadcast
the 400-key dim and make every arm look alike. The broadcast
baseline is still REPORTED (explicit F.broadcast hint) so the regime
boundary is visible: when the dim fits in a broadcast, use the
broadcast join; the bloom reduction is for when it doesn't.

Arms (all row-identical to their plain twin, asserted before timing):
  semi_plain   lineitem LEFT SEMI supplier(nation=3) on l_suppkey,
               shuffle (sort-merge) join + revenue agg
  semi_bloom   same, fact pre-filtered by operators/bloom.py's
               broadcast-literal bitmap, then the confirming semi
  semi_broadcast the explicit-broadcast baseline (the other regime)
  anti_plain / anti_bloom / anti_broadcast — the anti direction:
               bloom's definite-miss rows (~96% of the fact here)
               skip the confirming exchange entirely

(A cross-check arm against Spark's own bloom_filter_agg/might_contain
pair is not possible from SQL: both are INTERNAL expressions in Spark
4.1 — UNRESOLVED_ROUTINE from spark.sql — reachable only through the
optimizer's runtime-filter injection, which tests/test_plans.py
already pins on a selective shuffle join.)

Also prints the pre-filter selectivity — kept/total fact rows, the
shuffle-bytes proxy that holds at any scale.

Run: python tools/bench_bloom.py [--sf10]  → one JSON line (also
written to BLOOM_BENCH.json at the repo root). --sf10 adds the 100×
corpus pass (~minutes).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from shmr_spark import get_spark  # noqa: E402
from shmr_spark.catalog import load_table  # noqa: E402
from shmr_spark.functions.numeric import dsum  # noqa: E402
from shmr_spark.operators.bloom import (  # noqa: E402
    bloom_anti_join,
    bloom_might_contain,
    bloom_semi_join,
    build_bloom_bits,
)
from tools.bench_common import timed  # noqa: E402
from tools.make_scaled_sf import make_scaled  # noqa: E402

NUM_BITS = 1 << 20
DIM_NATION = 3  # the gate query's nation — non-empty at every SF


def _corpus_pass(spark, sf_dir: str, label: str) -> dict:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    dim = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") == DIM_NATION)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double")

    def agg(kept):
        return kept.groupBy("l_returnflag").agg(
            F.count("*").alias("n"), dsum(revenue).alias("revenue")
        )

    def semi_plain():
        return agg(li.join(dim.distinct(), "l_suppkey", "left_semi"))

    def semi_bloom():
        return agg(bloom_semi_join(li, dim, "l_suppkey", num_bits=NUM_BITS))

    n_keys = dim.count()

    def semi_broadcast():
        return agg(li.join(F.broadcast(dim.distinct()), "l_suppkey", "left_semi"))

    # anti direction: definite-miss rows (~96% of the fact here)
    # skip the confirming exchange entirely
    def anti_plain():
        return agg(li.join(dim.distinct(), "l_suppkey", "left_anti"))

    def anti_bloom():
        return agg(bloom_anti_join(li, dim, "l_suppkey", num_bits=NUM_BITS))

    def anti_broadcast():
        return agg(li.join(F.broadcast(dim.distinct()), "l_suppkey", "left_anti"))

    # correctness cross-check: every arm row-identical to its plain twin
    for base, arms in (
        (semi_plain, [(semi_bloom, "semi_bloom"), (semi_broadcast, "semi_bc")]),
        (anti_plain, [(anti_bloom, "anti_bloom"), (anti_broadcast, "anti_bc")]),
    ):
        want = sorted(map(tuple, base().collect()))
        for arm, name in arms:
            got = sorted(map(tuple, arm().collect()))
            assert got == want, f"{name} arm diverged from its plain twin"

    # pre-filter selectivity: the shuffle-rows proxy
    fact_rows = li.count()
    bits = build_bloom_bits(dim, "l_suppkey", num_bits=NUM_BITS)
    kept_rows = li.where(
        bloom_might_contain("l_suppkey", bits, NUM_BITS)
    ).count()

    return {
        "corpus": label,
        "fact_rows": fact_rows,
        "dim_keys": n_keys,
        "bloom_kept_rows": kept_rows,
        "bloom_kept_frac": round(kept_rows / fact_rows, 5),
        "semi_plain_sec": timed(semi_plain),
        "semi_bloom_sec": timed(semi_bloom),
        "semi_broadcast_sec": timed(semi_broadcast),
        "anti_plain_sec": timed(anti_plain),
        "anti_bloom_sec": timed(anti_bloom),
        "anti_broadcast_sec": timed(anti_broadcast),
    }


def main() -> None:
    spark = get_spark(
        app_name="bench_bloom",
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.path.join(REPO, ".scaled", "sf1")
    make_scaled(spark, 10, base, sf1)

    full = "--sf10" in sys.argv
    passes = [_corpus_pass(spark, sf1, "sf1 (10x sf0.1)")]
    if full:
        sf10 = os.path.join(REPO, ".scaled", "sf10")
        make_scaled(spark, 100, base, sf10)
        passes.append(_corpus_pass(spark, sf10, "sf10 (100x sf0.1)"))

    result = {"metric": "bloom_bench", "num_bits": NUM_BITS, "passes": passes}
    line = json.dumps(result)
    print(line)
    if full:
        # only the two-pass run may replace the committed artifact —
        # the sf10 row backs SCALING.md's headline 2.1x; a default
        # (sf1-only) sanity run must not silently drop it
        with open(os.path.join(REPO, "BLOOM_BENCH.json"), "w") as f:
            f.write(line + "\n")
    else:
        print("(sf1-only run: BLOOM_BENCH.json left untouched; "
              "pass --sf10 to refresh the committed artifact)")


if __name__ == "__main__":
    main()
