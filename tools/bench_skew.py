"""Measure salted vs naive execution under REAL key skew (verdict r3
task 5 completion): derive a hot-key corpus (one supplier owns ~30% of
sf1 lineitem rows — tools/make_scaled_sf.make_skewed), then time

  join arm:  lineitem ⋈ supplier on suppkey + per-nation revenue agg,
             plain shuffle join vs operators.skew.salted_join
  agg arm:   per-supplier revenue, plain groupBy vs salted_agg

with spark.sql.autoBroadcastJoinThreshold=-1: at real scale the
"small" side of a skewed join is routinely past broadcast range — that
is exactly the regime salted_join exists for. AQE stays ON (engine
default); its skew-join split does not trigger here because the hot
partition is below the 256 MB advisory threshold, which is itself the
point — manual salting covers the gap between "skewed enough to
straggle" and "skewed enough for AQE".

Also prints the partition-level evidence: rows per murmur3 shuffle
bucket of the join key, naive vs salted, so the straggler cause is
visible even where local[32] wall-clock differences are modest.

Run: python tools/bench_skew.py   → one JSON line (also written to
SKEW_BENCH.json at the repo root when run from the repo).
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
from shmr_spark.operators.skew import salted_agg, salted_join  # noqa: E402
from tools.bench_common import timed as _timed  # noqa: E402
from tools.make_scaled_sf import make_scaled, make_skewed  # noqa: E402

N_SALTS = 16
SHUFFLE_PARTS = 32


def main() -> None:
    spark = get_spark(
        app_name="bench_skew",
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.path.join(REPO, ".scaled", "sf1")
    skew_dir = os.path.join(REPO, ".scaled", "sf1skew")
    make_scaled(spark, 10, base, sf1)
    make_skewed(spark, sf1, skew_dir)

    li = load_table(spark, skew_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_extendedprice", "l_discount"
    )
    sup = load_table(spark, skew_dir, "supplier").select("s_suppkey", "s_nationkey")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    # partition-level evidence: murmur3 bucket loads for the join key
    buckets = (
        li.groupBy(F.pmod(F.hash("s_suppkey"), F.lit(SHUFFLE_PARTS)).alias("b"))
        .count()
        .collect()
    )
    loads = sorted((r["count"] for r in buckets), reverse=True)
    total = sum(loads)
    salted_buckets = (
        li.withColumn("__salt", F.pmod(F.xxhash64(*li.columns), F.lit(N_SALTS)))
        .groupBy(
            F.pmod(F.hash("s_suppkey", "__salt"), F.lit(SHUFFLE_PARTS)).alias("b")
        )
        .count()
        .collect()
    )
    salted_loads = sorted((r["count"] for r in salted_buckets), reverse=True)

    def naive_join():
        return (
            li.join(sup, "s_suppkey")
            .groupBy("s_nationkey")
            .agg(dsum(revenue).alias("revenue"), F.count("*").alias("n"))
        )

    def salted_join_arm():
        return (
            salted_join(li, sup, on="s_suppkey", num_salts=N_SALTS)
            .groupBy("s_nationkey")
            .agg(dsum(revenue).alias("revenue"), F.count("*").alias("n"))
        )

    def naive_agg():
        return li.groupBy("s_suppkey").agg(
            dsum(revenue).alias("revenue"), F.count("*").alias("n")
        )

    def salted_agg_arm():
        return salted_agg(
            li.withColumn("__rev", revenue),
            ["s_suppkey"],
            {"revenue": ("dsum", "__rev"), "n": ("count", "__rev")},
            num_salts=N_SALTS,
        )

    # correctness cross-check before timing: both arms row-identical
    for a, b, label in (
        (naive_join(), salted_join_arm(), "join"),
        (naive_agg(), salted_agg_arm(), "agg"),
    ):
        rows_a = sorted(map(tuple, a.collect()))
        rows_b = sorted(map(tuple, b.collect()))
        assert rows_a == rows_b, f"salted {label} arm diverged from naive"

    result = {
        "metric": "skew_bench",
        "corpus": "sf1 x hot supplier (~30% of rows)",
        "rows": total,
        "hot_bucket_share_naive": round(loads[0] / total, 4),
        "hot_bucket_share_salted": round(salted_loads[0] / total, 4),
        "join_naive_sec": _timed(naive_join),
        "join_salted_sec": _timed(salted_join_arm),
        "agg_naive_sec": _timed(naive_agg),
        "agg_salted_sec": _timed(salted_agg_arm),
        "n_salts": N_SALTS,
        "shuffle_partitions": SHUFFLE_PARTS,
    }
    line = json.dumps(result)
    print(line)
    out = os.path.join(REPO, "SKEW_BENCH.json")
    with open(out, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
