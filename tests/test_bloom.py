"""Bloom semi-join reduction (shmr_spark/operators/bloom.py).

The round-7 lesson encoded here: the Kirsch-Mitzenmacher combine
``h1 + i*h2`` on full-range xxhash64 values overflows int64, and
Spark 4's default ANSI mode turns that into ARITHMETIC_OVERFLOW — but
the failure only shows on a MULTI-key dim (per key, the chance that
all four i*h2 products fit in int64 is ~1/24, so a single lucky key
can pass). Every test here therefore (a) asserts the session really
is ANSI, and (b) drives hundreds-to-thousands of distinct keys so a
lucky-hash fluke cannot green-light an overflow again.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shmr_spark.catalog import load_table
from shmr_spark.operators.bloom import (
    bloom_anti_join,
    bloom_might_contain,
    bloom_semi_join,
    build_bloom_bits,
)


def test_session_is_ansi(spark):
    """The overflow class only exists under ANSI arithmetic; if this
    flips, the suite silently stops covering it."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_bloom_semi_join_equals_left_semi(spark, sf_dir):
    """bloom_semi_join ≡ left_semi row-for-row on real tables, with a
    multi-key dim (hundreds of distinct custkeys, vs the single
    supplier key that masked the r7 overflow at sf0.001)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    assert dim.count() > 20  # multi-key guarantee (34 at sf0.001)
    got = bloom_semi_join(orders, dim, "o_custkey", num_bits=1 << 14, mode="bloom")
    want = orders.join(dim.distinct(), "o_custkey", "left_semi")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bloom_anti_join_equals_left_anti(spark, sf_dir):
    """bloom_anti_join ≡ left_anti row-for-row on real tables — the
    anti direction keeps ~(1 - selectivity) of the fact, so false
    positives that slip past the probe MUST be restored by the
    confirming branch for the counts to match."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    got = bloom_anti_join(
        orders, dim, "o_custkey", num_bits=1 << 14, mode="bloom"
    ).select(cols)
    want = orders.join(dim.distinct(), "o_custkey", "left_anti").select(cols)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bloom_anti_join_keeps_null_keys(spark):
    """left_anti KEEPS NULL-key rows (NULL equals nothing); the
    Bloom short-circuit must route them to the definite-miss branch,
    not drop them on a NULL probe."""
    fact = spark.range(0, 10).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") < 8, F.col("id")).alias("k"),
    )
    dim = spark.range(0, 4).select(F.col("id").alias("k"))
    got = bloom_anti_join(fact, dim, "k", num_bits=1 << 10, mode="bloom")
    want = fact.join(dim, "k", "left_anti")
    assert sorted(r["rid"] for r in got.collect()) == sorted(
        r["rid"] for r in want.collect()
    )
    # the two NULL-key rows (ids 8, 9) are among the kept
    assert {8, 9} <= {r["rid"] for r in got.collect()}


def test_no_false_negatives_and_fp_rate(spark):
    """Every inserted key probes true; absent keys probe true at below
    the theoretical rate (n=1000, m=2^14, k=5 → (1-e^(-kn/m))^k ≈
    0.0013; bound at 0.01 for slack)."""
    num_bits = 1 << 14
    present = spark.range(0, 1000).select(F.col("id").alias("k"))
    bits = build_bloom_bits(present, "k", num_bits=num_bits)
    probe = bloom_might_contain("k", bits, num_bits)
    hits = present.where(probe).count()
    assert hits == 1000  # no false negatives, ever
    absent = spark.range(1000, 11000).select(F.col("id").alias("k"))
    fps = absent.where(probe).count()
    assert fps / 10000 < 0.01


def test_ansi_overflow_regression_many_keys(spark):
    """10k full-range string keys through build+probe under the
    default (ANSI) session — the exact shape that crashed r7. The
    assertion is simply that it RUNS and keeps every inserted key."""
    keys = spark.range(0, 10000).select(
        F.sha2(F.col("id").cast("string"), 256).alias("k")
    )
    bits = build_bloom_bits(keys, "k", num_bits=1 << 16)
    assert keys.where(bloom_might_contain("k", bits, 1 << 16)).count() == 10000


def test_null_key_probes_null(spark):
    """A NULL key must probe to NULL (filter drops it), not to a real
    boolean — xxhash64 skips null args, so this needs the explicit
    isNotNull guard in bloom_might_contain."""
    bits = build_bloom_bits(
        spark.range(0, 100).select(F.col("id").alias("k")), "k", num_bits=1 << 10
    )
    df = spark.range(0, 3).select(
        F.when(F.col("id") < 2, F.col("id")).alias("k")
    )
    rows = df.select(
        F.col("k"), bloom_might_contain("k", bits, 1 << 10).alias("hit")
    ).collect()
    by_k = {r["k"]: r["hit"] for r in rows}
    assert by_k[0] is True and by_k[1] is True
    assert by_k[None] is None
    # and the semi-join never keeps the NULL-key row
    dim = spark.range(0, 100).select(F.col("id").alias("k"))
    kept = bloom_semi_join(df, dim, "k", num_bits=1 << 10, mode="bloom")
    assert sorted(r["k"] for r in kept.collect()) == [0, 1]


def test_bits_literal_constant_folds(spark):
    """The split-a-string bitmap literal (bloom._bits_literal) must
    collapse to ONE array Literal under ConstantFolding — the plan the
    probe broadcasts must not re-split the string per row."""
    bits = build_bloom_bits(
        spark.range(0, 50).select(F.col("id").alias("k")), "k", num_bits=1 << 10
    )
    df = spark.range(0, 10).select(
        bloom_might_contain(F.col("id"), bits, 1 << 10).alias("hit")
    )
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "split(" not in optimized  # folded away
    assert "element_at" in optimized  # probe itself stays an expression


def test_probe_filter_stays_in_codegen(spark):
    """The probe is a pure expression: the filtered scan must sit
    inside a WholeStageCodegen span, with no BatchEvalPython /
    ArrowEvalPython node anywhere."""
    bits = build_bloom_bits(
        spark.range(0, 50).select(F.col("id").alias("k")), "k", num_bits=1 << 10
    )
    df = spark.range(0, 1000).where(bloom_might_contain(F.col("id"), bits, 1 << 10))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "*(1) Filter" in plan  # *(n) = WholeStageCodegen span marker
    assert "EvalPython" not in plan


def test_bloom_anti_join_preserves_fact_column_order(spark):
    """Documented contract (bloom.py): bloom_anti_join output follows
    the FACT's column order (its definite-miss branch is a plain
    filter), while a string-`on` left_anti moves the key first —
    pinned so a refactor that silently changes the order is caught."""
    fact = spark.range(0, 4).select(
        F.col("id").alias("a"), F.col("id").alias("k"), F.lit("x").alias("z")
    )
    dim = spark.range(0, 2).select(F.col("id").alias("k"))
    for mode in ("bloom", "broadcast"):
        got = bloom_anti_join(fact, dim, "k", num_bits=1 << 10, mode=mode)
        assert got.columns == ["a", "k", "z"], mode
    assert fact.join(dim, "k", "left_anti").columns == ["k", "a", "z"]


# ---------------------------------------------------------------------------
# mode="auto" regime guard (round 9): BLOOM_BENCH.json shows the
# broadcast join beating the bloom reduction at every measured scale
# where the dim fits, so the default must not let a user deploy the
# losing regime — below AUTO_BROADCAST_MAX_RELATION_BYTES the operator
# short-circuits to a plain broadcast semi/anti join.
# ---------------------------------------------------------------------------


def test_auto_mode_small_dim_plans_broadcast_semi(spark):
    """auto + a dim far under the key threshold must produce a
    BroadcastHashJoin LeftSemi plan with NO bloom probe (no xxhash64
    anywhere) and the same rows as the plain semi-join."""
    fact = spark.range(0, 5000).select((F.col("id") % 100).alias("k"), "id")
    dim = spark.range(0, 30).select(F.col("id").alias("k"))
    got = bloom_semi_join(fact, dim, "k")  # mode="auto" default
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "xxhash64" not in plan  # the bloom path did NOT build
    want = fact.join(dim.distinct(), "k", "left_semi")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_auto_mode_small_dim_plans_broadcast_anti(spark):
    """The anti direction's auto fallback: broadcast plan, left_anti
    semantics (NULL-key rows KEPT), fact column order preserved."""
    fact = spark.range(0, 10).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") < 8, F.col("id")).alias("k"),
    )
    dim = spark.range(0, 4).select(F.col("id").alias("k"))
    got = bloom_anti_join(fact, dim, "k")  # mode="auto" default
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "xxhash64" not in plan
    assert got.columns == ["rid", "k"]
    kept = {r["rid"] for r in got.collect()}
    assert kept == {4, 5, 6, 7, 8, 9}  # 8, 9 are the NULL-key rows


def test_auto_mode_big_dim_plans_plain_shuffle(spark):
    """auto + a hinted >1M-key dim must produce a plain shuffle
    semi/anti join: no bitmap probe (no xxhash64), no broadcast hint
    on the dim — the regime where the literal bloom measured
    OOM-or-saturated and Catalyst's runtime bloom filter owns the
    reduction. Rows must equal the plain twin, and the anti keeps the
    fact's column order (the documented mode-invariant contract)."""
    fact = spark.range(0, 5000).select((F.col("id") % 100).alias("k"), "id")
    dim = spark.range(0, 30).select(F.col("id").alias("k"))
    conf = "spark.sql.autoBroadcastJoinThreshold"
    saved = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "-1")  # tiny test dim must not auto-broadcast
        semi = bloom_semi_join(fact, dim, "k", dim_keys_hint=5_000_000)
        plan = semi._jdf.queryExecution().executedPlan().toString()
        assert "xxhash64" not in plan and "BroadcastHashJoin" not in plan
        assert "LeftSemi" in plan
        want = fact.join(dim.distinct(), "k", "left_semi")
        assert sorted(map(tuple, semi.collect())) == sorted(
            map(tuple, want.collect())
        )
        anti = bloom_anti_join(fact, dim, "k", dim_keys_hint=5_000_000)
        assert anti.columns == ["k", "id"]
        plan = anti._jdf.queryExecution().executedPlan().toString()
        assert "xxhash64" not in plan and "LeftAnti" in plan
    finally:
        spark.conf.set(conf, saved)


def test_forced_bloom_mode_keeps_probe_in_plan(spark):
    """mode="bloom" must run the reduction even when auto would not —
    the gate queries rely on this to keep the bloom plan verified."""
    fact = spark.range(0, 5000).select((F.col("id") % 100).alias("k"), "id")
    dim = spark.range(0, 30).select(F.col("id").alias("k"))
    got = bloom_semi_join(fact, dim, "k", num_bits=1 << 10, mode="bloom")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan  # probe present
    want = fact.join(dim.distinct(), "k", "left_semi")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_resolve_mode_thresholds(spark):
    """_resolve_mode picks broadcast under the relation-bytes budget
    and the plain SHUFFLE join above it (round-10 far-regime
    measurement: the literal bitmap is OOM auto-sized /
    saturated-and-slower cap-sized there, so Catalyst's runtime bloom
    filter owns that regime; approx_count_distinct estimate — 2.5M
    long keys ≈ 120 MB >> the 48 MiB budget even at ±5% rsd), and
    returns the key count it used so bitmap sizing never re-runs the
    estimate."""
    from shmr_spark.operators.bloom import _resolve_mode

    small = spark.range(0, 1000).select(F.col("id").alias("k"))
    big = spark.range(0, 2_500_000).select(F.col("id").alias("k"))
    mode, n = _resolve_mode(small, "k", "auto")
    assert mode == "broadcast" and 900 <= n <= 1100
    mode, n = _resolve_mode(big, "k", "auto")
    assert mode == "shuffle" and n > 1_000_000
    # forced modes bypass the estimate entirely
    assert _resolve_mode(big, "k", "broadcast") == ("broadcast", None)
    assert _resolve_mode(small, "k", "bloom") == ("bloom", None)
    # a hint substitutes for the estimate — no job, and auto honors it
    assert _resolve_mode(small, "k", "auto", dim_keys_hint=5_000_000) == (
        "shuffle",
        5_000_000,
    )


def test_auto_sized_bitmap_is_not_saturated(spark):
    """num_bits=None sizes the bitmap from the key count at ~10
    bits/key so a forced bloom run never probes a saturated fixed
    default. Sizing math pinned (including the round-10 clamp at
    MAX_NUM_BITS = 2^23, the measured-safe plan-literal size), plus
    an end-to-end row check through the hint path (zero estimate
    jobs: hinted bloom + sized bitmap never calls _estimate_keys —
    pinned by monkeypatching it to raise; mode="bloom" because auto
    now routes hinted >1M-key dims to the plain shuffle join)."""
    import shmr_spark.operators.bloom as bl

    assert bl._bits_for_keys(1) == 64
    assert bl._bits_for_keys(100) == 1024  # next pow2 of 1000
    assert bl._bits_for_keys(100_000) == 1 << 20  # 1M target → 2^20
    assert bl._bits_for_keys(2_000_000) == bl.MAX_NUM_BITS  # clamped (2^23)
    assert bl._bits_for_keys(10**9) == bl.MAX_NUM_BITS  # clamped

    fact = spark.range(0, 4000).select(F.col("id").alias("k"))
    dim = spark.range(0, 2000, 2).select(F.col("id").alias("k"))
    orig = bl._estimate_keys
    bl._estimate_keys = lambda *a: (_ for _ in ()).throw(
        AssertionError("hint path must not run the estimate job")
    )
    try:
        got = bloom_semi_join(
            fact, dim, "k", mode="bloom", dim_keys_hint=100_000
        )
        plan = got._jdf.queryExecution().optimizedPlan().toString()
        assert "xxhash64" in plan  # the sized-bitmap probe is in-plan
    finally:
        bl._estimate_keys = orig
    want = fact.join(dim.distinct(), "k", "left_semi")
    assert sorted(r.k for r in got.collect()) == sorted(
        r.k for r in want.collect()
    )


def test_mode_validation(spark):
    fact = spark.range(0, 10).select(F.col("id").alias("k"))
    dim = spark.range(0, 5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="mode must be"):
        bloom_semi_join(fact, dim, "k", mode="bogus")


def test_num_bits_bounds(spark):
    """num_bits outside [64, 2^23] (or non-power-of-two) fails loudly
    at build time — the cap bounds the plan-literal bitmap to a size
    the round-10 far-regime pass measured as safe (2^26 shipped
    70-170 MB task binaries and OOMed a 24 GiB heap at 32-way
    concurrency) and keeps every downstream int cast overflow-free."""
    dim = spark.range(0, 5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="power of two"):
        build_bloom_bits(dim, "k", num_bits=1000)
    with pytest.raises(ValueError, match=r"\[64, 2\^23\]"):
        build_bloom_bits(dim, "k", num_bits=1 << 24)
    with pytest.raises(ValueError, match=r"\[64, 2\^23\]"):
        bloom_might_contain("k", [0], num_bits=1 << 24)


def test_resolve_mode_is_bytes_based(spark):
    """The auto threshold is estimated relation BYTES, not a key
    count: the same distinct-key count must resolve differently when
    the per-key width or the budget changes (r10 verdict task 2)."""
    from shmr_spark.operators.bloom import (
        AUTO_BROADCAST_MAX_RELATION_BYTES,
        _key_width_bytes,
        _relation_bytes,
        _resolve_mode,
    )

    dim = spark.range(0, 100).select(F.col("id").alias("k"))
    # 800K long keys ≈ 38 MB < 48 MiB -> broadcast; the SAME count at
    # a custom 16 MiB budget -> shuffle
    assert _resolve_mode(dim, "k", "auto", dim_keys_hint=800_000)[0] == (
        "broadcast"
    )
    assert _resolve_mode(
        dim, "k", "auto", dim_keys_hint=800_000, bytes_budget=16 << 20
    )[0] == "shuffle"
    # width from schema: long = 8 B, string = None (measured)
    assert _key_width_bytes(dim, "k") == 8
    sdim = dim.select(F.col("k").cast("string").alias("k"))
    assert _key_width_bytes(sdim, "k") is None
    # the hinted string path uses the conservative default width:
    # 800K * (16 + 40) ≈ 43 MB still under budget -> broadcast, but
    # 1M * 56 ≈ 53 MB -> shuffle, where 1M LONG keys (48 MB) still
    # broadcast: same count, different width, different plan
    assert _resolve_mode(sdim, "k", "auto", dim_keys_hint=800_000)[0] == (
        "broadcast"
    )
    assert _resolve_mode(sdim, "k", "auto", dim_keys_hint=1_000_000)[0] == (
        "shuffle"
    )
    assert _resolve_mode(dim, "k", "auto", dim_keys_hint=1_000_000)[0] == (
        "broadcast"
    )
    assert _relation_bytes(1_000_000, 8) <= AUTO_BROADCAST_MAX_RELATION_BYTES


def test_estimate_measures_string_key_width(spark):
    """Variable-width keys get their avg octet_length measured in the
    SAME 1-row estimate pass (no second job) so a wide-string dim
    resolves by its true relation bytes."""
    from shmr_spark.operators.bloom import _estimate_keys

    wide = spark.range(0, 500).select(
        F.concat(F.lit("k" * 100), F.col("id").cast("string")).alias("k")
    )
    n, w = _estimate_keys(wide, "k")
    assert 450 <= n <= 550
    assert 100 <= w <= 110  # ~101-103 measured bytes, +1 ceiling pad


def test_auto_mode_warns_when_num_bits_is_ignored(spark):
    """r10 ADVICE: auto resolving away from the bloom path must not
    silently drop an explicitly sized bitmap — it warns. Forcing the
    mode explicitly alongside num_bits stays silent (informed
    choice), as does auto WITHOUT num_bits."""
    import warnings

    fact = spark.range(0, 100).select((F.col("id") % 10).alias("k"), "id")
    dim = spark.range(0, 5).select(F.col("id").alias("k"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        bloom_semi_join(fact, dim, "k", num_bits=1 << 10, dim_keys_hint=5)
        hits = [x for x in w if issubclass(x.category, UserWarning)]
        assert len(hits) == 1
        assert "num_bits=1024 is ignored" in str(hits[0].message)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        bloom_anti_join(
            fact, dim, "k", num_bits=1 << 10, mode="broadcast"
        )  # forced: silent
        bloom_semi_join(fact, dim, "k", dim_keys_hint=5)  # no num_bits: silent
        bloom_semi_join(
            fact, dim, "k", num_bits=1 << 10, mode="bloom"
        )  # honored: silent
        hits = [x for x in w if issubclass(x.category, UserWarning)]
        assert len(hits) == 0, [str(x.message) for x in hits]
