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

The --sf10 run adds a WIDE pass (all 11 lineitem columns + a 128-byte
deterministic payload, materialized to parquet; the agg hashes every
column so pruning can't re-narrow the shuffle): the anti-join's
documented win regime — exchange cost grows with row width, the
definite-miss branch's rescan cost grows only with scan bytes — as a
measured number instead of the docstring's "win case is wide rows".

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


def _dim(spark, sf_dir: str):
    return (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") == DIM_NATION)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )


def _six_arm_ab(
    fact,
    dim,
    agg,
    label: str,
    extra: dict | None = None,
    num_bits: int | None = NUM_BITS,
    bytes_spark=None,
) -> dict:
    """The shared A/B harness for every pass: plain / bloom /
    broadcast in both join directions, each arm asserted
    row-identical to its plain twin BEFORE timing (the assert run
    doubles as the warm). One harness, two callers — the narrow and
    wide passes must never drift apart in arm construction or
    cross-check discipline (the sorted-column-order bug in the first
    wide run came from exactly such a divergence)."""

    def semi_plain():
        return agg(fact.join(dim.distinct(), "l_suppkey", "left_semi"))

    def semi_bloom():
        return agg(bloom_semi_join(fact, dim, "l_suppkey", num_bits=num_bits, mode="bloom"))

    def semi_broadcast():
        return agg(fact.join(F.broadcast(dim.distinct()), "l_suppkey", "left_semi"))

    # anti direction: definite-miss rows (~96% of the fact here)
    # skip the confirming exchange entirely
    def anti_plain():
        return agg(fact.join(dim.distinct(), "l_suppkey", "left_anti"))

    def anti_bloom():
        return agg(bloom_anti_join(fact, dim, "l_suppkey", num_bits=num_bits, mode="bloom"))

    def anti_broadcast():
        return agg(fact.join(F.broadcast(dim.distinct()), "l_suppkey", "left_anti"))

    # correctness cross-check: every arm row-identical to its plain twin
    for base, arms in (
        (semi_plain, [(semi_bloom, "semi_bloom"), (semi_broadcast, "semi_bc")]),
        (anti_plain, [(anti_bloom, "anti_bloom"), (anti_broadcast, "anti_bc")]),
    ):
        want = sorted(map(tuple, base().collect()))
        for arm, name in arms:
            got = sorted(map(tuple, arm().collect()))
            assert got == want, f"{label}: {name} arm diverged from its plain twin"

    out = {
        "corpus": label,
        "fact_rows": fact.count(),
        "dim_keys": dim.count(),
        **(extra or {}),
        "semi_plain_sec": timed(semi_plain),
        "semi_bloom_sec": timed(semi_bloom),
        "semi_broadcast_sec": timed(semi_broadcast),
        "anti_plain_sec": timed(anti_plain),
        "anti_bloom_sec": timed(anti_bloom),
        "anti_broadcast_sec": timed(anti_broadcast),
    }
    if bytes_spark is not None:
        # shuffle bytes per arm: the scale-stable number wall-clock
        # weather cannot contaminate (shmr_spark/metrics.py)
        from shmr_spark.metrics import noop_sink, shuffle_bytes_of

        for name, fn in (
            ("semi_plain", semi_plain),
            ("semi_bloom", semi_bloom),
            ("semi_broadcast", semi_broadcast),
            ("anti_plain", anti_plain),
            ("anti_bloom", anti_bloom),
            ("anti_broadcast", anti_broadcast),
        ):
            moved = shuffle_bytes_of(bytes_spark, lambda f=fn: noop_sink(f()))
            out[f"{name}_shuffle_mb"] = round(moved["write"] / 1e6, 2)
    return out


def _corpus_pass(spark, sf_dir: str, label: str) -> dict:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    dim = _dim(spark, sf_dir)
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double")

    def agg(kept):
        return kept.groupBy("l_returnflag").agg(
            F.count("*").alias("n"), dsum(revenue).alias("revenue")
        )

    # pre-filter selectivity: the shuffle-rows proxy
    fact_rows = li.count()
    bits = build_bloom_bits(dim, "l_suppkey", num_bits=NUM_BITS)
    kept_rows = li.where(
        bloom_might_contain("l_suppkey", bits, NUM_BITS)
    ).count()

    return _six_arm_ab(
        li,
        dim,
        agg,
        label,
        extra={
            "bloom_kept_rows": kept_rows,
            "bloom_kept_frac": round(kept_rows / fact_rows, 5),
        },
    )


def _make_wide(spark, sf_dir: str, out_dir: str) -> None:
    """Materialize a WIDE lineitem once: all 11 columns + a 128-byte
    deterministic payload (sha2 of the row's orderkey — NOT rand();
    bloom_anti_join's two plan branches require a deterministic
    source). Written to parquet so every arm pays REAL scan bytes —
    synthesizing the payload per-scan would bill sha2 CPU to
    whichever arm scans more, distorting the exchange-vs-rescan
    trade this pass exists to measure.

    Staleness: the cache is keyed on the SOURCE corpus's mtime, not
    just the wide dir's existence — a regenerated .scaled/sf10 must
    rebuild the wide fact, or this pass would silently measure (and
    publish) numbers for the old corpus; the row-identity asserts
    can't catch that because every arm joins the same stale fact."""
    src = os.path.join(sf_dir, "lineitem")
    if not os.path.exists(src):
        src = os.path.join(sf_dir, "lineitem.parquet")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker) and os.path.getmtime(marker) >= os.path.getmtime(src):
        return
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.withColumn(
        "payload",
        F.repeat(F.sha2(F.col("l_orderkey").cast("string"), 256), 2),
    )
    wide.write.mode("overwrite").parquet(out_dir)


def _wide_pass(spark, sf_dir: str, wide_dir: str, label: str) -> dict:
    """The anti-join's claimed WIN regime, measured: rows wide enough
    that the exchange (serialize + spill + deserialize every byte)
    costs more than a second pruned scan. The aggregate hashes EVERY
    column (pmod-reduced so the ANSI sum cannot overflow) — without
    that, Catalyst's column pruning would narrow the shuffle and
    quietly turn this back into the narrow pass."""
    _make_wide(spark, sf_dir, wide_dir)
    fact = spark.read.parquet(wide_dir)
    dim = _dim(spark, sf_dir)

    def agg(kept):
        # hash columns in SORTED-NAME order: a string-`on` join moves
        # the key column first while bloom_anti_join's union keeps the
        # fact's original order — xxhash64 is order-sensitive, so the
        # raw kept.columns order would diverge between arms that are
        # row-identical by name
        allhash = F.pmod(F.xxhash64(*sorted(kept.columns)), F.lit(1_000_000))
        return kept.groupBy("l_returnflag").agg(
            F.count("*").alias("n"), F.sum(allhash).alias("h")
        )

    return _six_arm_ab(
        fact,
        dim,
        agg,
        label,
        extra={"row_shape": "11 cols + 128B payload, all-column hash agg"},
    )


# --- the far side of the regime guard (verdict r9 task 4) ----------
# The auto broadcast budget (48 MiB ≈ 1M long keys) was REASONED
# (hash-relation bytes vs bitmap bytes), not measured — every earlier
# committed pass had a dim that fits a broadcast. These passes put
# measured points ABOVE the budget: a 5M-distinct-key dim (~5x the
# budget; ~240 MB as a LongHashedRelation) and a 2.5M-key MID point
# (~2.5x, locating where the endpoints straddle) against a 30M-row
# fact wide enough (128 B payload) that the exchange is the dominant
# cost, with per-arm shuffle bytes recorded alongside wall time.

FAR_KEY_DOMAIN = 50_000_000
FAR_DIM_STEP = 10  # dim = every 10th key -> 5M distinct, 10% fact hit rate
FAR_FACT_ROWS = 30_000_000


def _make_far_corpus(spark, out_dir: str, dim_step: int) -> None:
    """Materialize the far-regime corpus once (deterministic: key =
    xxhash64(id) mod domain, payload = repeated sha2 — same
    determinism rule as _make_wide). The 30M-row fact is shared by
    every dim step; each step writes its own dim (step 10 keeps its
    historical plain "dim" name so cached corpora stay valid)."""
    dim_name = "dim" if dim_step == FAR_DIM_STEP else f"dim_step{dim_step}"
    if not os.path.exists(os.path.join(out_dir, "fact", "_SUCCESS")):
        fact = spark.range(FAR_FACT_ROWS).select(
            F.pmod(F.xxhash64("id"), F.lit(FAR_KEY_DOMAIN)).alias("l_suppkey"),
            (F.col("id") % 7).cast("string").alias("l_returnflag"),
            F.repeat(F.sha2(F.col("id").cast("string"), 256), 2).alias("payload"),
        )
        fact.write.mode("overwrite").parquet(os.path.join(out_dir, "fact"))
    if not os.path.exists(os.path.join(out_dir, dim_name, "_SUCCESS")):
        dim = spark.range(0, FAR_KEY_DOMAIN, dim_step).select(
            F.col("id").alias("l_suppkey")
        )
        dim.write.mode("overwrite").parquet(os.path.join(out_dir, dim_name))


def _far_pass(spark, out_dir: str, dim_step: int = FAR_DIM_STEP,
              regime: str = "far") -> dict:
    from shmr_spark.operators.bloom import (
        AUTO_BROADCAST_MAX_RELATION_BYTES,
        _bits_for_keys,
        _relation_bytes,
        bloom_might_contain,
        build_bloom_bits,
    )

    _make_far_corpus(spark, out_dir, dim_step)
    dim_name = "dim" if dim_step == FAR_DIM_STEP else f"dim_step{dim_step}"
    fact = spark.read.parquet(os.path.join(out_dir, "fact"))
    dim = spark.read.parquet(os.path.join(out_dir, dim_name))

    def agg(kept):
        # all-column hash agg, sorted-name order (see _wide_pass)
        allhash = F.pmod(F.xxhash64(*sorted(kept.columns)), F.lit(1_000_000))
        return kept.groupBy("l_returnflag").agg(
            F.count("*").alias("n"), F.sum(allhash).alias("h")
        )

    n_dim = FAR_KEY_DOMAIN // dim_step
    nb = _bits_for_keys(n_dim)  # clamps to MAX_NUM_BITS (saturated here)
    bits = build_bloom_bits(dim, "l_suppkey", num_bits=nb)
    kept = fact.where(bloom_might_contain("l_suppkey", bits, nb)).count()
    return _six_arm_ab(
        fact,
        dim,
        agg,
        f"{regime} regime ({n_dim / 10**6:g}M-key dim, "
        f"{dim_step}x crossover)",
        extra={
            "row_shape": "key + returnflag + 128B payload, all-column hash agg",
            "auto_bytes_budget": AUTO_BROADCAST_MAX_RELATION_BYTES,
            "est_relation_bytes": _relation_bytes(n_dim, 8),
            "bloom_num_bits": nb,
            "bloom_kept_frac": round(kept / FAR_FACT_ROWS, 4),
            "note": "pre-cap sizing (2^26 bits for 5M keys) shipped "
            "70-170MB task binaries and OOMed a 24GiB heap at 32-way "
            "concurrency — the reason mode='auto' now picks the plain "
            "shuffle join above the relation-bytes budget",
        },
        num_bits=nb,  # the cap-feasible bitmap: measured saturated
        bytes_spark=spark,
    )


def main() -> None:
    spark = get_spark(
        app_name="bench_bloom",
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.path.join(REPO, ".scaled", "sf1")
    make_scaled(spark, 10, base, sf1)

    if "--far" in sys.argv or "--mid" in sys.argv:
        # single-regime run: measure the >budget point and MERGE it
        # into the committed artifact (replacing any previous row for
        # that regime) without re-running the sf1/sf10 passes.
        # --far: 5M keys (step 10); --mid: 2.5M keys (step 20), the
        # point between BLOOM_BENCH's endpoints the r10 verdict asked
        # for.
        regime = "far" if "--far" in sys.argv else "mid"
        step = FAR_DIM_STEP if regime == "far" else 2 * FAR_DIM_STEP
        row = _far_pass(
            spark, os.path.join(REPO, ".scaled", "bloom_far"), step, regime
        )
        path = os.path.join(REPO, "BLOOM_BENCH.json")
        with open(path) as f:
            result = json.loads(f.read())
        result["passes"] = [
            p
            for p in result["passes"]
            if not p["corpus"].startswith(f"{regime} regime")
        ] + [row]
        line = json.dumps(result)
        print(line)
        with open(path, "w") as f:
            f.write(line + "\n")
        return

    full = "--sf10" in sys.argv
    passes = [_corpus_pass(spark, sf1, "sf1 (10x sf0.1)")]
    if full:
        sf10 = os.path.join(REPO, ".scaled", "sf10")
        make_scaled(spark, 100, base, sf10)
        passes.append(_corpus_pass(spark, sf10, "sf10 (100x sf0.1)"))
        passes.append(
            _wide_pass(
                spark,
                sf10,
                os.path.join(REPO, ".scaled", "sf10_wide_lineitem"),
                "sf10 wide (100x, +128B payload)",
            )
        )

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
