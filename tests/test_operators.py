"""asof_join + salted_agg operator tests against independently
computed ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from shmr_spark.catalog import load_table
from shmr_spark.operators import asof_join, salted_agg


def test_asof_join_matches_window_truth(spark, sf_dir):
    """Strict as-of self-join ≡ lag() over (user_id, ts) when right
    timestamps are unique per key."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    got = asof_join(
        ev.select("event_id", "user_id", "ts"),
        ev.select("user_id", "ts", "value"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["value"],
        tiebreak=None,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    truth = ev.withColumn("prev_value", F.lag("value").over(w)).select(
        "event_id", "prev_value"
    )
    joined = got.select("event_id", "value_asof").join(truth, "event_id")
    mismatches = joined.filter(
        ~(
            (F.col("value_asof") == F.col("prev_value"))
            | (F.col("value_asof").isNull() & F.col("prev_value").isNull())
        )
    ).count()
    assert mismatches == 0


def test_asof_inclusive_matches_self(spark, sf_dir):
    """Inclusive as-of (<=) against itself matches every row to its own
    timestamp (latest right at ts <= ts is the row itself)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    got = asof_join(
        ev,
        ev.select("user_id", "ts", F.col("event_id").alias("rid")),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["rid"],
        inclusive=True,
        tiebreak="rid",
    )
    assert got.filter(F.col("rid_asof") != F.col("event_id")).count() == 0


def test_salted_agg_equals_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    salted = salted_agg(
        li,
        keys=["l_returnflag", "l_linestatus"],
        aggs={
            "n": ("count", "l_orderkey"),
            "sq": ("sum", "l_quantity"),
            "mn": ("min", "l_extendedprice"),
            "mx": ("max", "l_extendedprice"),
        },
        num_salts=16,
    )
    direct = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("l_orderkey").alias("n"),
        F.sum("l_quantity").alias("sq"),
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
    )
    s = {tuple(r) for r in salted.collect()}
    d = {tuple(r) for r in direct.collect()}
    assert s == d


def test_salted_agg_rejects_non_algebraic(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    import pytest as _pt

    with _pt.raises(ValueError, match="non-algebraic"):
        salted_agg(li, ["l_returnflag"], {"m": ("median", "l_quantity")})


def test_merge_upsert_semantics(spark, sf_dir):
    from shmr_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, v string, x double"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, v string, x double"
    )
    got = {r.k: (r.v, r.x) for r in merge_upsert(target, updates, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_idempotent(spark):
    from shmr_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([(1, "a")], "k long, v string")
    updates = spark.createDataFrame([(1, "A")], "k long, v string")
    once = merge_upsert(target, updates, ["k"])
    twice = merge_upsert(once, updates, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_profile_columns_stats(spark, sf_dir):
    from shmr_spark.operators.profile import profile_columns

    cust = load_table(spark, sf_dir, "customer")
    prof = {r.column: r for r in profile_columns(cust).collect()}
    assert set(prof) == set(cust.columns)
    n = cust.count()
    for c, r in prof.items():
        assert r.n == n
        assert r.n_null == 0
        assert 1 <= r.n_distinct <= n
    assert prof["c_custkey"].n_distinct == n  # key column is unique


def test_chunk_documents_coverage(spark, sf_dir):
    """Every token appears in >= 1 chunk; consecutive chunks overlap by
    exactly `overlap` tokens (except the trailing partial)."""
    from shmr_spark.functions.chunking import chunk_documents

    docs = load_table(spark, sf_dir, "documents").limit(20)
    out = chunk_documents(docs, chunk_size=10, overlap=3)
    rows = sorted(
        ((r.doc_id, r.chunk_idx, r.chunk_text) for r in out.collect())
    )
    texts = {r.doc_id: r.text for r in docs.collect()}
    from collections import defaultdict

    per_doc = defaultdict(list)
    for doc_id, idx, chunk in rows:
        per_doc[doc_id].append((idx, chunk.split(" ")))
    for doc_id, chunks in per_doc.items():
        toks = texts[doc_id].split(" ")
        chunks.sort()
        # reconstruction: stride-7 windows of size 10 cover all tokens
        rebuilt = []
        for idx, c in chunks:
            start = idx * 7
            assert c == toks[start : start + 10]
            rebuilt.extend(c if not rebuilt else c[3:])
        assert rebuilt == toks

    import pytest as _pt

    with _pt.raises(ValueError):
        chunk_documents(docs, chunk_size=5, overlap=5)


def test_interval_self_join_matches_bruteforce(spark, sf_dir):
    """Binned interval join ≡ the naive cross-product predicate join,
    pair for pair (including gaps that straddle bin boundaries)."""
    from pyspark.sql import functions as F

    from shmr_spark.catalog import load_table
    from shmr_spark.operators.interval import interval_self_join

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    tol = 300_000_000
    fast = interval_self_join(ev, "user_id", "ts", "event_id", tol)
    a = ev.select(
        F.col("user_id"), F.col("event_id").alias("ida"), F.unix_micros("ts").alias("ua")
    )
    b = ev.select(
        F.col("user_id").alias("ub_key"),
        F.col("event_id").alias("idb"),
        F.unix_micros("ts").alias("ub"),
    )
    naive = (
        a.join(b, (a.user_id == b.ub_key) & (F.col("ida") < F.col("idb")))
        .filter(F.abs(F.col("ub") - F.col("ua")) <= tol)
        .select("ida", "idb")
    )
    fast_pairs = {(r.event_id_a, r.event_id_b) for r in fast.collect()}
    naive_pairs = {(r.ida, r.idb) for r in naive.collect()}
    assert fast_pairs == naive_pairs
    assert fast_pairs  # non-degenerate fixture


def test_interval_join_gap_bounds(spark, sf_dir):
    from pyspark.sql import functions as F

    from shmr_spark.catalog import load_table
    from shmr_spark.operators.interval import interval_self_join

    ev = load_table(spark, sf_dir, "events")
    tol = 120_000_000
    out = interval_self_join(ev, "user_id", "ts", "event_id", tol)
    mx = out.agg(F.max("gap_us"), F.min("gap_us")).first()
    assert mx[0] <= tol and mx[1] >= 0


def test_approx_percentiles_within_rank_error(spark, sf_dir):
    """approx_percentile's Greenwald-Khanna guarantee, now checked
    inside the query itself (tolerance oracle): every group must
    report within_bound=True, with the sketch values inside the exact
    [q-eps, q+eps] value envelope, plus exact group counts."""
    from pyspark.sql import functions as F

    from shmr_spark.catalog import load_table
    from shmr_spark.queries import load_all

    rows = load_all()["approx_percentiles"].fn(spark, sf_dir).collect()
    assert rows, "expected one row per returnflag group"
    li = load_table(spark, sf_dir, "lineitem")
    exact_n = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    for row in rows:
        assert row.within_bound is True
        assert row.n == exact_n[row.l_returnflag]


def test_heavy_hitters_exact_vs_groupby(spark, sf_dir):
    """Sketch+recount ≡ the exact full groupBy answer, including under
    a deliberately tiny sketch capacity (phi large enough to stress
    eviction on every partition)."""
    from pyspark.sql import functions as F

    from shmr_spark.catalog import load_table
    from shmr_spark.operators.heavy_hitters import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    total = toks.count()
    for phi in (0.002, 0.01):
        got = {(r.token, r.n) for r in heavy_hitters(toks, "token", phi).collect()}
        exact = {
            (r.token, r.n)
            for r in toks.groupBy("token")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > phi * total)
            .collect()
        }
        assert got == exact
        assert got  # non-degenerate


def test_heavy_hitters_skewed_synthetic(spark):
    """90%-one-key skew, many partitions, capacity 2: the dominant key
    must survive eviction churn in every partition."""
    from pyspark.sql import functions as F

    from shmr_spark.operators.heavy_hitters import heavy_hitters

    df = (
        spark.range(10_000)
        .repartition(16)
        .select(
            F.when(F.col("id") % 10 < 9, F.lit("hot"))
            .otherwise(F.concat(F.lit("cold_"), F.col("id")))
            .alias("k")
        )
    )
    got = {r.k: r.n for r in heavy_hitters(df, "k", phi=0.5).collect()}
    assert got == {"hot": 9000}


def test_salted_join_equals_plain_join(spark, sf_dir):
    """salted_join must be row-identical to the plain equi-join for
    inner and left, including unmatched left rows (left) under skew
    (lineitem keys are naturally non-uniform across suppliers)."""
    from pyspark.sql import functions as F

    from shmr_spark.catalog import load_table
    from shmr_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("k"), "l_orderkey", "l_linenumber"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"), "s_nationkey"
    ).filter(F.col("k") % 3 == 0)  # leave unmatched left rows

    for how in ("inner", "left"):
        fast = salted_join(li, sup, on="k", num_salts=4, how=how)
        plain = li.join(sup, "k", how)
        sel = ["k", "l_orderkey", "l_linenumber", "s_nationkey"]
        a = {tuple(r) for r in fast.select(*sel).collect()}
        b = {tuple(r) for r in plain.select(*sel).collect()}
        assert a == b and a


def test_validate_counts_planted_violations(spark):
    """validate() counts exactly the planted bad rows, treats NULL
    predicate results as violations, and audits all rules in one scan
    (single aggregate — no per-rule jobs)."""
    from pyspark.sql import functions as F

    from shmr_spark.operators.validate import validate

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 2.0)], "id INT, v DOUBLE"
    )
    out = {
        r.rule: (r.n_violations, r.n_rows)
        for r in validate(
            df,
            {
                "v_positive": F.col("v") > 0,
                "id_odd": F.col("id") % 2 == 1,
            },
        ).collect()
    }
    assert out == {"v_positive": (2, 4), "id_odd": (2, 4)}


def test_mix_sources_deterministic_and_append_stable(spark, sf_dir):
    """Mixing rates hold approximately; a row's fate is a pure function
    of its id (append-stable: mixing a superset never flips survivors);
    reruns are identical."""
    from pyspark.sql import functions as F

    from shmr_spark.catalog import load_table
    from shmr_spark.operators.mixing import mix_sources

    docs = load_table(spark, sf_dir, "documents")
    half = docs.filter(F.col("doc_id") < 250)
    m_full = mix_sources({"all": (docs, 0.5)}, id_col="doc_id")
    m_half = mix_sources({"all": (half, 0.5)}, id_col="doc_id")
    full_ids = {r.doc_id for r in m_full.select("doc_id").collect()}
    half_ids = {r.doc_id for r in m_half.select("doc_id").collect()}
    assert half_ids == {i for i in full_ids if i < 250}  # append-stable
    assert full_ids == {r.doc_id for r in m_full.select("doc_id").collect()}
    n = docs.count()
    assert 0.35 * n <= len(full_ids) <= 0.65 * n  # rate in the ballpark


def test_pack_sequences_two_phase_equals_naive(spark):
    """The distributed two-phase prefix sum (operators/packing.py)
    computes exactly the naive global cumulative sum, including with
    sparse/gapped ids and non-uniform token counts; pack boundaries
    follow start_tok // budget."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from shmr_spark.operators.packing import pack_sequences

    rng = random.Random(11)
    ids = sorted(rng.sample(range(100_000), 700))
    rows = [(i, rng.randrange(1, 900)) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(8)

    got = {
        r.doc_id: (r.start_tok, r.pack_id)
        for r in pack_sequences(df, budget=512).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = {
        r.doc_id: (r.s, r.s // 512)
        for r in df.select(
            "doc_id", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("s")
        ).collect()
    }
    assert got == naive


def test_prefix_sum_equals_naive_window(spark):
    """prefix_sum (the general two-phase scan) equals the naive
    global cumulative window on gapped, negative, and unsorted-input
    ids — including SQL's NULL semantics: NULL values are skipped and
    an all-NULL prefix yields NULL (the round-10 review found the
    first cut returned NULL for any all-NULL IN-BUCKET prefix). The
    leading ids carry NULLs so the all-NULL-prefix edge is hit."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from shmr_spark.operators.packing import prefix_sum

    rng = random.Random(23)
    ids = sorted(rng.sample(range(-50_000, 50_000), 600))
    rows = [
        (i, None if rank < 5 or rng.random() < 0.1 else rng.randrange(-5, 100))
        for rank, i in enumerate(ids)
    ]
    df = spark.createDataFrame(rows, "k long, v long").repartition(8)

    got = {r.k: r.cum for r in prefix_sum(df, "k", "v", "cum").collect()}
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r.k: r.cum
        for r in df.select("k", F.sum("v").over(w).alias("cum")).collect()
    }
    assert got == want


def test_global_ntile_matches_window_ntile(spark):
    """global_ntile reproduces SQL ntile's remainder rule exactly:
    sweep N x n combinations spanning N % n == 0, N % n != 0 and the
    N < n degenerate (which must not divide by zero in ANSI mode)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from shmr_spark.operators.ranking import global_ntile

    for total, n in [(100, 10), (103, 10), (7, 10), (1, 4), (97, 8)]:
        df = spark.range(total).select(
            (F.col("id") * 37 % 1000).alias("k"), F.col("id").alias("i")
        )
        got = {
            (r.k, r.i): r.tile
            for r in global_ntile(df, "k", "i", n).collect()
        }
        w = Window.orderBy("k", "i")
        want = {
            (r.k, r.i): r.t
            for r in df.select(
                "k", "i", F.ntile(n).over(w).cast("int").alias("t")
            ).collect()
        }
        assert got == want, f"N={total} n={n}"

    import pytest

    with pytest.raises(ValueError, match="n >= 1"):
        global_ntile(spark.range(3), "id", "id", 0)


def test_select_by_token_budget_equals_naive(spark):
    """The bucketed two-phase budget cut (operators/selection.py)
    equals the naive single-window form — including duplicate scores
    straddling nothing (ties stay in one bucket) and the keep-the-
    straddler boundary rule."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from shmr_spark.operators.selection import select_by_token_budget

    rng = random.Random(7)
    rows = [
        (i, round(rng.random(), 3), rng.randrange(1, 400))
        for i in range(600)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, quality double, n_tokens long"
    ).repartition(8)
    budget = 20_000

    got = {
        r.doc_id: r.start_tok
        for r in select_by_token_budget(df, budget=budget).collect()
    }
    w = Window.orderBy(F.desc("quality"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    naive = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("s")
        ).collect()
        if r.s < budget
    }
    assert got == naive
    # the straddling doc is KEPT: max start_tok is under budget but its
    # doc may finish past it
    assert got and max(got.values()) < budget


def test_select_by_token_budget_auto_scale_equals_naive(spark):
    """auto_scale_score (round-12 advice fix): a tightly-concentrated
    SIGNED score (the DSIR per-token mean shape — |score| < 0.25 while
    the theoretical bound is ±32) must (a) produce the identical
    output to the naive single-window cut — the affine min/max rescale
    only changes the parallel decomposition, never the result — and
    (b) actually spread the rows across bucket space, where the static
    floor(score·K) bucketing collapses them into a handful of cells
    (the single-task-window hazard the fix exists for)."""
    import math
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from shmr_spark.operators.selection import select_by_token_budget

    rng = random.Random(12)
    rows = [
        (i, rng.gauss(0.0, 0.08), rng.randrange(1, 400)) for i in range(600)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, score double, n_tokens long"
    ).repartition(8)
    budget = 20_000

    got = {
        r.doc_id: r.start_tok
        for r in select_by_token_budget(
            df,
            budget=budget,
            score_col="score",
            score_buckets=1024,
            auto_scale_score=True,
        ).collect()
    }
    w = Window.orderBy(F.desc("score"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    naive = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("s")
        ).collect()
        if r.s < budget
    }
    assert got == naive

    # the data-level property the fix targets: on this score
    # population the static map floor(score·64) lands everything in
    # ~a dozen cells; the affine rescale spreads it across hundreds
    scores = [s for _, s, _ in rows]
    static = {math.floor(s * 64) for s in scores}
    lo, hi = min(scores), max(scores)
    scaled = {
        min(math.floor((s - lo) / (hi - lo) * 1024), 1023) for s in scores
    }
    assert len(static) < 40 < len(scaled)


def test_select_by_token_budget_auto_scale_degenerate_span(spark):
    """All-equal scores (span 0) under auto_scale_score: every row
    lands in bucket 0 and the cut still equals the naive form (ties
    break by id inside the single bucket)."""
    from pyspark.sql import functions as F

    from shmr_spark.operators.selection import select_by_token_budget

    df = spark.createDataFrame(
        [(i, 0.5, 10) for i in range(40)],
        "doc_id long, score double, n_tokens long",
    ).repartition(4)
    out = select_by_token_budget(
        df, budget=100, score_col="score", auto_scale_score=True
    )
    kept = sorted(r.doc_id for r in out.collect())
    # 10 tokens each, budget 100: doc i starts at exactly i·10, and
    # the keep rule is start_tok < budget, so ids 0..9 (doc 10 starts
    # AT the budget — no straddle, it is cut)
    assert kept == list(range(10))
    assert out.filter(F.col("start_tok") != F.col("doc_id") * 10).count() == 0


def test_rollup_merge_equals_full_recompute(spark, sf_dir):
    """merge_rollup(state, delta) must be bit-identical to a full
    rollup over the union — the algebraic-partials identity the
    continuous aggregate rests on. Split on user parity so most days
    appear on both sides (exercises the combine path)."""
    from shmr_spark.operators import merge_rollup, rollup_events, rollup_readout

    ev = load_table(spark, sf_dir, "events")
    state = rollup_events(ev.filter(F.col("user_id") % 2 == 0))
    merged = rollup_readout(merge_rollup(state, ev.filter(F.col("user_id") % 2 == 1)))
    full = rollup_readout(rollup_events(ev))
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in full.collect()}


def test_rollup_merge_untouched_days_pass_through(spark):
    """A delta confined to one day must leave other days' state rows
    byte-identical (the partition-pruned path) and re-combine only the
    touched day."""
    from shmr_spark.operators import merge_rollup, rollup_events

    from datetime import datetime

    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 3, 1, 10), "a", 1.25),
            (2, datetime(2024, 3, 2, 11), "a", 2.5),
            (3, datetime(2024, 3, 2, 12), "b", 4.0),
        ],
        "event_id long, ts timestamp, event_type string, value double",
    )
    delta = spark.createDataFrame(
        [(4, datetime(2024, 3, 2, 13), "a", 0.75)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    state = rollup_events(ev)
    merged = merge_rollup(state, delta)
    rows = {(str(r.day), r.event_type): (r.cnt, r.sum_scaled) for r in merged.collect()}
    assert rows[("2024-03-01", "a")] == (1, 1_250_000)  # untouched
    assert rows[("2024-03-02", "a")] == (2, 3_250_000)  # combined
    assert rows[("2024-03-02", "b")] == (1, 4_000_000)  # touched day, other key


def test_rollup_merge_associative(spark, sf_dir):
    """Merging two deltas one at a time equals merging their union —
    ingest order cannot change the state."""
    from shmr_spark.operators import merge_rollup, rollup_events

    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 3 == 0)
    b = ev.filter(F.col("event_id") % 3 == 1)
    c = ev.filter(F.col("event_id") % 3 == 2)
    one_by_one = merge_rollup(merge_rollup(rollup_events(a), b), c)
    at_once = merge_rollup(rollup_events(a), b.unionByName(c))
    assert {tuple(r) for r in one_by_one.collect()} == {
        tuple(r) for r in at_once.collect()
    }


def test_snapshot_diff_semantics(spark):
    from shmr_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "id long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (5, "e"), (4, "now-set")], "id long, v string"
    )
    got = {
        r.id: r.status
        for r in snapshot_diff(old, new, ["id"], ["v"]).collect()
    }
    # null -> value counts as changed (hash differs); unchanged rows
    # are never emitted
    assert got == {2: "changed", 3: "removed", 5: "added", 4: "changed"}


def test_global_rank_matches_naive_window(spark, sf_dir):
    from pyspark.sql import Window

    from shmr_spark.catalog import load_table
    from shmr_spark.operators.ranking import global_rank

    orders = load_table(spark, sf_dir, "orders")
    got = {
        r.o_orderkey: r.rank
        for r in global_rank(orders, "o_totalprice", "o_orderkey").collect()
    }
    w = Window.orderBy("o_totalprice", "o_orderkey")
    want = {
        r.o_orderkey: r.rn
        for r in orders.select(
            "o_orderkey", F.row_number().over(w).alias("rn")
        ).collect()
    }
    assert got == want


def test_global_rank_null_keys_rank_first(spark):
    """NULL keys must occupy the FIRST ranks (Spark's default
    ascending sort is NULLS FIRST, and the in-bucket window uses it)
    — the round-8 review found floor(NULL) falling through least()
    into the TOP bucket, which ranked NULL rows in the middle of the
    largest keys' range and broke the total order."""
    from pyspark.sql import Window

    from shmr_spark.operators.ranking import global_rank

    df = spark.range(1, 101).select(
        F.col("id").alias("iid"),
        F.when(F.col("id") % 10 != 0, F.col("id")).alias("k"),
    )
    got = {r.iid: r.rank for r in global_rank(df, "k", "iid").collect()}
    w = Window.orderBy(F.asc_nulls_first("k"), "iid")
    want = {
        r.iid: r.rn
        for r in df.select("iid", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want  # the 10 NULL-key rows hold ranks 1..10


def test_range_shards_balanced_and_contiguous(spark, sf_dir):
    from shmr_spark.catalog import load_table
    from shmr_spark.operators.ranking import range_shards

    orders = load_table(spark, sf_dir, "orders")
    stats = (
        range_shards(orders, "o_totalprice", "o_orderkey", n_shards=8)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("shard_id")
        .collect()
    )
    assert [r.shard_id for r in stats] == list(range(8))
    counts = [r.cnt for r in stats]
    assert max(counts) - min(counts) <= 1
    for prev, cur in zip(stats, stats[1:]):
        assert prev.hi <= cur.lo


def test_write_sorted_shards_layout(spark, sf_dir, tmp_path):
    """Sorted export: shard directories exist, each shard's rows are
    (key, id)-sorted on read-back in file order, populations are
    balanced, and shard key ranges are contiguous."""
    import os

    from shmr_spark.catalog import load_table
    from shmr_spark.sources import write_sorted_shards

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "sorted_orders")
    write_sorted_shards(orders, out, "o_totalprice", "o_orderkey", n_shards=4)

    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard_id="))
    assert dirs == [f"shard_id={i}" for i in range(4)]

    bounds = []
    counts = []
    for d in dirs:
        pdf = (
            spark.read.parquet(os.path.join(out, d))
            .select("o_totalprice", "o_orderkey")
            .toPandas()
        )
        keys = list(zip(pdf.o_totalprice, pdf.o_orderkey))
        assert keys == sorted(keys), d
        counts.append(len(keys))
        bounds.append((keys[0][0], keys[-1][0]))
    assert max(counts) - min(counts) <= 1
    for (prev_lo, prev_hi), (lo, hi) in zip(bounds, bounds[1:]):
        assert prev_hi <= lo


def test_compact_dataset(spark, sf_dir, tmp_path):
    """Many small files in, few right-sized files out, content
    identical, original preserved on the happy path only via the
    atomic swap."""
    from shmr_spark.catalog import load_table
    from shmr_spark.sources import compact_dataset

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "fragmented")
    orders.repartition(40).write.parquet(path)

    before = orders.count()
    stats = compact_dataset(spark, path, target_file_mb=64)
    assert stats["files_before"] >= 40
    assert stats["files_after"] < stats["files_before"]
    after_df = spark.read.parquet(path)
    assert after_df.count() == before
    # content equality, not just count
    assert (
        after_df.exceptAll(load_table(spark, sf_dir, "orders")).count() == 0
    )


def test_pagerank_hand_graph(spark):
    """Hub graph, by hand: b,c,d -> a and a -> b, one round.
    r1(a) = 0.15 + 0.85*(1+1+1) = 2.7; r1(b) = 0.15 + 0.85*1 = 1.0;
    r1(c) = r1(d) = 0.15 (no inbound)."""
    from shmr_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("b", "a"), ("c", "a"), ("d", "a"), ("a", "b")],
        "src string, dst string",
    )
    got = {r.node: r.rank for r in pagerank(edges, iters=1).collect()}
    assert got == {"a": 2.7, "b": 1.0, "c": 0.15, "d": 0.15}


def test_pagerank_cycle_fixed_point(spark):
    """A directed cycle is PageRank's fixed point: every node keeps
    rank 1.0 (scaled) at any iteration count."""
    from shmr_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    got = {r.node: r.rank for r in pagerank(edges, iters=3).collect()}
    assert got == {"a": 1.0, "b": 1.0, "c": 1.0}


def test_triangle_count_hand_graphs(spark):
    """K4 has 4 triangles; a square (4-cycle) has none; duplicate and
    self edges don't change the count."""
    from shmr_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    k4_df = spark.createDataFrame(
        k4 + [("a", "a"), ("b", "a")], "src string, dst string"
    )
    assert triangle_count(k4_df).first().n_triangles == 4

    square = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "src string, dst string",
    )
    assert triangle_count(square).first().n_triangles == 0


def test_triangle_count_degree_ordering_cases(spark):
    """Shapes that stress the degree-ordering orientation: a hub star
    (no triangle until one spoke pair closes), a hub with several
    closed spokes (each triangle shares the max-degree vertex, so all
    counting happens at LOW-degree vertices), and a brute-force
    random-graph differential."""
    import itertools
    import random

    from shmr_spark.operators.graph import triangle_count

    # star S5 + one closing edge: exactly 1 triangle at the hub
    star = [("h", x) for x in "abcde"] + [("a", "b")]
    df = spark.createDataFrame(star, "src string, dst string")
    assert triangle_count(df).first().n_triangles == 1

    # hub with 3 disjoint closed spoke pairs: 3 triangles, all through
    # the degree-6 hub (out-wedges must form at the degree-2 spokes)
    fan = [("h", x) for x in "abcdef"] + [("a", "b"), ("c", "d"), ("e", "f")]
    df = spark.createDataFrame(fan, "src string, dst string")
    assert triangle_count(df).first().n_triangles == 3

    # differential vs brute force on a random graph (fixed seed):
    # every degree tie and orientation branch gets exercised
    rng = random.Random(17)
    verts = [f"v{i}" for i in range(12)]
    edges = [
        (a, b) for a, b in itertools.combinations(verts, 2) if rng.random() < 0.4
    ]
    adj = set(edges) | {(b, a) for a, b in edges}
    expected = sum(
        1
        for a, b, c in itertools.combinations(verts, 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    )
    df = spark.createDataFrame(edges, "src string, dst string")
    assert triangle_count(df).first().n_triangles == expected


def test_with_audit_single_pass_metrics(spark, sf_dir, tmp_path):
    """Metrics ride the write action itself — counts for the
    filtered stream arrive without a second scan, and a before/after
    pair on one plan measures the filter's selectivity."""
    from shmr_spark.catalog import load_table
    from shmr_spark.operators.audit import with_audit

    orders = load_table(spark, sf_dir, "orders")
    pre, obs_pre = with_audit(orders, "pre", rows=F.count(F.lit(1)))
    filtered = pre.filter(F.col("o_totalprice") > 100000)
    post, obs_post = with_audit(
        filtered,
        "post",
        rows=F.count(F.lit(1)),
        max_price=F.max("o_totalprice"),
    )
    post.write.mode("overwrite").parquet(str(tmp_path / "out"))

    n_all = orders.count()
    n_kept = orders.filter(F.col("o_totalprice") > 100000).count()
    assert obs_pre.get["rows"] == n_all
    assert obs_post.get["rows"] == n_kept
    assert obs_post.get["max_price"] == orders.agg(F.max("o_totalprice")).first()[0]
    assert spark.read.parquet(str(tmp_path / "out")).count() == n_kept


def test_schema_drift_detects_all_kinds(spark, sf_dir):
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from shmr_spark.catalog import load_table
    from shmr_spark.operators.validate import schema_drift

    expected = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    docs = load_table(spark, sf_dir, "documents")
    assert schema_drift(docs, expected) == []

    drifted = docs.drop("lang").withColumn(
        "n_chars", F.col("n_chars").cast("double")
    ).withColumn("crawl_date", F.lit("2026-01-01"))
    got = {(d["column"], d["kind"]) for d in schema_drift(drifted, expected)}
    assert got == {
        ("lang", "missing"),
        ("n_chars", "type_changed"),
        ("crawl_date", "extra"),
    }
    bad = schema_drift(drifted, expected)
    tc = next(d for d in bad if d["kind"] == "type_changed")
    assert tc["expected"] == "bigint" and tc["actual"] == "double"


# ---------------------------------------------------------------------------
# Mergeable HLL distinct sketches (operators/distinct_sketch.py)
# ---------------------------------------------------------------------------


def test_distinct_sketch_rollup_equals_direct_build(spark, sf_dir):
    """HLL union is a register-max merge: building at (lang, source)
    and rolling up to lang must give the IDENTICAL estimate as
    sketching at lang directly — partitioning must not matter."""
    from pyspark.sql import functions as F

    from shmr_spark.catalog import load_table
    from shmr_spark.operators.distinct_sketch import (
        build_distinct_sketches,
        rollup_distinct_sketches,
    )

    docs = load_table(spark, sf_dir, "documents")
    fine = build_distinct_sketches(docs, ["lang", "source"], "text")
    rolled = {
        r.lang: r.distinct_est
        for r in rollup_distinct_sketches(fine, ["lang"]).collect()
    }
    direct = {
        r.lang: r.distinct_est
        for r in rollup_distinct_sketches(
            build_distinct_sketches(docs, ["lang"], "text"), ["lang"]
        ).collect()
    }
    assert rolled == direct


def test_distinct_sketch_survives_parquet_round_trip(spark, sf_dir, tmp_path):
    """The persisted-sketch workflow: write binary sketches, read them
    back, roll up — estimates unchanged, and the file is KBs (the
    point: later rollups never rescan the base rows)."""
    import os

    from shmr_spark.catalog import load_table
    from shmr_spark.operators.distinct_sketch import (
        build_distinct_sketches,
        rollup_distinct_sketches,
    )

    docs = load_table(spark, sf_dir, "documents")
    fine = build_distinct_sketches(docs, ["lang", "source"], "text")
    out = str(tmp_path / "sketches")
    fine.coalesce(1).write.mode("overwrite").parquet(out)
    before = {
        (r.lang,): r.distinct_est
        for r in rollup_distinct_sketches(fine, ["lang"]).collect()
    }
    back = spark.read.parquet(out)
    after = {
        (r.lang,): r.distinct_est
        for r in rollup_distinct_sketches(back, ["lang"]).collect()
    }
    assert before == after
    data_bytes = sum(
        os.path.getsize(os.path.join(out, f))
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )
    assert data_bytes < 512 * 1024  # sketches, not rows


def test_distinct_sketch_accuracy_at_cardinality(spark, sf_dir):
    """At real cardinality (lineitem orderkeys) the lg_k=12 estimate
    must sit within the 5 % envelope the gate query promises."""
    from pyspark.sql import functions as F

    from shmr_spark.catalog import load_table
    from shmr_spark.operators.distinct_sketch import (
        build_distinct_sketches,
        rollup_distinct_sketches,
    )

    li = load_table(spark, sf_dir, "lineitem")
    fine = build_distinct_sketches(li, ["l_returnflag"], "l_orderkey")
    est = rollup_distinct_sketches(fine, []).collect()[0].distinct_est
    exact = li.select("l_orderkey").distinct().count()
    assert abs(est - exact) <= 0.05 * exact


def test_cusum_identity_matches_recursion(spark):
    """The window identity C_t = S_t - min(0, min S) must equal the
    textbook recursion C_t = max(0, C_{t-1} + dev_t) — checked on a
    planted drift: a flat series with a late level shift."""
    from shmr_spark.operators.changepoint import with_cusum

    vals = [10.0] * 20 + [14.0] * 10  # mean 11.33 → drift accumulates late
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k int, t int, value double")
    got = {
        r.t: r.cusum_scaled
        for r in with_cusum(df, ["k"], ["t"], "value", scale=100).collect()
    }
    # python reference recursion on the same scaled ints
    xs = [round(v * 100) for v in vals]
    target = sum(xs) // len(xs)
    c, expect = 0, {}
    for i, x in enumerate(xs):
        c = max(0, c + (x - target))
        expect[i] = c
    assert got == expect
    # the shift is detected: cusum grows strictly through the level change
    assert expect[29] > expect[20] > 0


def test_interval_union_counts_overlaps_once(spark):
    """Hand-checkable cases: disjoint, overlapping, nested, and
    touching intervals — the union length must count overlap once and
    merge touching spans."""
    from shmr_spark.operators.interval import interval_union_length

    rows = [
        # k=1: [0,10) + [20,30) disjoint → 20
        (1, 0, 10), (1, 20, 30),
        # k=2: [0,10) + [5,15) overlap → 15
        (2, 0, 10), (2, 5, 15),
        # k=3: [0,100) + [10,20) nested → 100
        (3, 0, 100), (3, 10, 20),
        # k=4: [0,10) + [10,20) touching → merged 20
        (4, 0, 10), (4, 10, 20),
    ]
    df = spark.createDataFrame(rows, "k int, s long, t long")
    got = {
        r.k: (r.covered, r.n_intervals)
        for r in interval_union_length(df, ["k"], "s", "t").collect()
    }
    assert got == {1: (20, 2), 2: (15, 2), 3: (100, 2), 4: (20, 2)}


def test_weighted_median_hand_cases(spark):
    """Hand-checkable: heavy weight pins the median; ties resolve to
    the lower value (lower weighted median definition)."""
    from shmr_spark.operators.ranking import weighted_median

    rows = [
        # k=1: values 1,2,3 weights 1,1,10 → median 3 (heavy tail)
        (1, 1.0, 1.0, 1), (1, 2.0, 1.0, 2), (1, 3.0, 10.0, 3),
        # k=2: values 1,2 weights 1,1 → 2*cum(1)=2 >= tot(2) → lower = 1
        (2, 1.0, 1.0, 1), (2, 2.0, 1.0, 2),
        # k=3: single row
        (3, 7.0, 5.0, 1),
    ]
    df = spark.createDataFrame(rows, "k int, v double, w double, tb int")
    got = {
        r.k: r.w_median
        for r in weighted_median(df, ["k"], "v", "w", ["tb"]).collect()
    }
    assert got == {1: 3.0, 2: 1.0, 3: 7.0}


def test_missing_ranges_bucket_stitch_equals_direct(spark):
    """The bucketed two-level gap detection must equal the direct
    single-window definition, including gaps that SPAN bucket
    boundaries and gaps larger than a whole bucket."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from shmr_spark.operators.validate import missing_ranges

    keys = [1, 2, 5, 9, 10, 11, 25, 26, 40, 99, 100, 101, 250]
    df = spark.createDataFrame([(k,) for k in keys], "id long")
    got = {
        (r.gap_start, r.gap_end, r.n_missing)
        for r in missing_ranges(df, "id").collect()
    }
    w = Window.orderBy("id")
    direct = {
        (r.s, r.e, r.e - r.s + 1)
        for r in df.select("id", F.lag("id").over(w).alias("p"))
        .filter(F.col("id") - F.col("p") > 1)
        .select(
            (F.col("p") + 1).alias("s"), (F.col("id") - 1).alias("e")
        )
        .collect()
    }
    assert got == direct
    assert (102, 249, 148) in got  # multi-bucket-spanning gap present


def test_missing_ranges_outlier_key_keeps_partitions_balanced(spark):
    """The round-10 ADVICE regression: one stray huge key must NOT
    collapse the per-partition lag into a single task. Value-space
    cells put all dense keys into cell 0 when the span explodes;
    rank-space range partitions balance by population, so with P=8
    partitions over ~1000 dense keys + one outlier, the largest
    partition must hold far less than the whole key set — and the gap
    OUTPUT must still equal the direct definition."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from shmr_spark.operators.validate import missing_ranges

    dense = [i for i in range(1, 2001) if i % 7 != 0]  # holes at 7k
    keys = dense + [2**60]  # one outlier stretches the span by ~2^49
    df = spark.createDataFrame([(k,) for k in keys], "id long")

    got = {
        (r.gap_start, r.gap_end)
        for r in missing_ranges(df, "id", num_partitions=8).collect()
    }
    w = Window.orderBy("id")
    direct = {
        (r.s, r.e)
        for r in df.select("id", F.lag("id").over(w).alias("p"))
        .filter(F.col("id") - F.col("p") > 1)
        .select((F.col("p") + 1).alias("s"), (F.col("id") - 1).alias("e"))
        .collect()
    }
    assert got == direct
    assert (2001, 2**60 - 1) in got  # the outlier's giant gap

    # balance: replicate the operator's internal partitioning and
    # check the max per-partition population — value-space cells
    # would put all ~1714 dense keys in one cell here
    sizes = (
        df.select(F.col("id").alias("__k"))
        .distinct()
        .repartitionByRange(8, "__k")
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]
        .mx
    )
    assert sizes < len(keys) / 2, f"one partition holds {sizes} keys"


def test_apportion_sums_exactly_and_is_proportional(spark):
    """Quotas must sum exactly to the total (the property rate-based
    sampling lacks) and never deviate from the exact share by ≥ 1."""
    from shmr_spark.operators.selection import apportion

    rows = [("a", 7), ("b", 13), ("c", 1), ("d", 29)]  # W = 50
    df = spark.createDataFrame(rows, "k string, n long")
    for total in (1, 9, 50, 137):
        got = {r.k: r.quota for r in apportion(df, total, ["k"]).collect()}
        assert sum(got.values()) == total
        for k, n in rows:
            exact = total * n / 50
            assert exact - 1 < got[k] < exact + 1  # quota rule bound


def test_select_by_token_fraction_equals_budget(spark):
    """The in-plan fraction cut (operators/selection.py) keeps exactly
    the rows the absolute-budget cut keeps at budget = fraction·total
    — including NULL-score exclusion from the mass denominator."""
    import random

    from pyspark.sql import functions as F

    from shmr_spark.operators.selection import (
        select_by_token_budget,
        select_by_token_fraction,
    )

    rng = random.Random(11)
    rows = [
        (i, None if i % 97 == 0 else round(rng.random(), 3), rng.randrange(1, 400))
        for i in range(600)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, quality double, n_tokens long"
    ).repartition(8)

    total = (
        df.filter(F.col("quality").isNotNull())
        .agg(F.sum("n_tokens"))
        .collect()[0][0]
    )
    frac = 0.4
    got = {
        r.doc_id: r.start_tok
        for r in select_by_token_fraction(df, fraction=frac).collect()
    }
    want = {
        r.doc_id: r.start_tok
        for r in select_by_token_budget(
            df, budget=int(frac * total) + (1 if (frac * total) % 1 else 0)
        ).collect()
    }
    # keep rule start_tok < frac·total vs start_tok < ceil(frac·total):
    # identical because start_tok is integral
    assert got == want


def test_select_by_token_fraction_decimal_exact_boundary(spark):
    """The fraction cut evaluates in exact decimal, so fraction=0.07
    of a 100-token mass cuts at exactly 7.0 — and doc 2, which STARTS
    at token 7 (doc 1 has 7 tokens), is out: 7 < 7.0 is false. The
    old double-typed cut computed 0.07*100 = 7.000000000000001 and
    KEPT it; past 2^53 total tokens the same binary drift moves the
    boundary arbitrarily. The (fraction, total) pair is deliberately
    one whose double product drifts ABOVE the exact value (checked in
    the assertion below), with the boundary doc ON the cut — so a
    regression to double arithmetic flips this test."""
    from shmr_spark.operators.selection import select_by_token_fraction

    assert 0.07 * 100 > 7, "pair no longer discriminates double vs decimal"
    # quality-ordered docs of 7/93 tokens: start_toks are 0 and 7
    df = spark.createDataFrame(
        [(1, 0.9, 7), (2, 0.5, 93)],
        "doc_id long, quality double, n_tokens long",
    )
    kept = {
        r.doc_id for r in select_by_token_fraction(df, fraction=0.07).collect()
    }
    # exact cut = 7.0: only the doc starting at token 0 survives
    assert kept == {1}


def test_select_by_token_fraction_from_totals_equals_in_plan(spark):
    """The driver-side variant (bucket totals pre-collected, offsets
    as a local relation, integer-literal budget — the r12
    training-pipeline fold) keeps EXACTLY the rows select_by_token_
    fraction keeps, with identical start_toks: the decimal cut
    arithmetic is replicated digit-for-digit. Covers NULL scores,
    several fractions including the double-vs-decimal boundary pair
    (0.07 of a 100-token mass), and the empty-input degenerate."""
    import random

    from pyspark.sql import functions as F

    from shmr_spark.operators.selection import (
        score_bucket,
        select_by_token_fraction,
        select_by_token_fraction_from_totals,
    )

    rng = random.Random(23)
    rows = [
        (i, None if i % 53 == 0 else round(rng.random(), 3), rng.randrange(1, 300))
        for i in range(500)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, quality double, n_tokens long"
    ).repartition(8)
    totals = [
        (r["__bucket"], r["__btot"])
        for r in df.filter(F.col("quality").isNotNull())
        .groupBy(score_bucket("quality", 1000).alias("__bucket"))
        .agg(F.sum("n_tokens").alias("__btot"))
        .collect()
    ]
    for frac in (0.07, 0.3, 0.5, 1.0):
        want = {
            (r.doc_id, r.start_tok)
            for r in select_by_token_fraction(df, fraction=frac).collect()
        }
        got = {
            (r.doc_id, r.start_tok)
            for r in select_by_token_fraction_from_totals(
                df, totals, fraction=frac
            ).collect()
        }
        assert got == want, f"fraction={frac}"

    # the decimal boundary pair from the test above: cut must be
    # exactly 7.0, excluding the doc that starts at token 7
    bdf = spark.createDataFrame(
        [(1, 0.9, 7), (2, 0.5, 93)],
        "doc_id long, quality double, n_tokens long",
    )
    btot = [
        (r["__bucket"], r["__btot"])
        for r in bdf.groupBy(score_bucket("quality", 1000).alias("__bucket"))
        .agg(F.sum("n_tokens").alias("__btot"))
        .collect()
    ]
    assert {
        r.doc_id
        for r in select_by_token_fraction_from_totals(
            bdf, btot, fraction=0.07
        ).collect()
    } == {1}

    empty = bdf.filter(F.lit(False))
    assert (
        select_by_token_fraction_from_totals(empty, [], fraction=0.5).count()
        == 0
    )


def test_select_from_totals_auto_scaled_bucket_equals_in_plan(spark):
    """The two-step driver fold of the AUTO-SCALED cut (r13
    training-pipeline DSIR fold): collect the score min/max first,
    group bucket totals by the literal affine map second, then
    select_by_token_fraction_from_totals with that same bucket_expr —
    must keep EXACTLY the rows the in-plan auto_scale_score path
    keeps, with identical start_toks. Uses the DSIR score shape
    (signed, tightly concentrated) plus NULL scores and the span-0
    degenerate."""
    import random

    from pyspark.sql import functions as F

    from shmr_spark.operators.selection import (
        auto_scaled_bucket,
        select_by_token_fraction,
        select_by_token_fraction_from_totals,
    )

    rng = random.Random(41)
    rows = [
        (
            i,
            None if i % 67 == 0 else rng.gauss(0.0, 0.08),
            rng.randrange(1, 300),
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, score double, n_tokens long"
    ).repartition(8)

    mm = df.agg(
        F.min("score").alias("lo"), F.max("score").alias("hi")
    ).collect()[0]
    bucket = auto_scaled_bucket("score", mm["lo"], mm["hi"], 1024)
    totals = [
        (r["__bucket"], r["__btot"])
        for r in df.filter(F.col("score").isNotNull())
        .groupBy(bucket.alias("__bucket"))
        .agg(F.sum("n_tokens").alias("__btot"))
        .collect()
    ]
    for frac in (0.07, 0.3, 0.5, 1.0):
        want = {
            (r.doc_id, r.start_tok)
            for r in select_by_token_fraction(
                df,
                fraction=frac,
                score_col="score",
                score_buckets=1024,
                auto_scale_score=True,
            ).collect()
        }
        got = {
            (r.doc_id, r.start_tok)
            for r in select_by_token_fraction_from_totals(
                df,
                totals,
                fraction=frac,
                score_col="score",
                score_buckets=1024,
                bucket_expr=bucket,
            ).collect()
        }
        assert got == want, f"fraction={frac}"

    # span-0 degenerate: all-equal scores → auto_scaled_bucket(lo==hi)
    # and the in-plan otherwise-branch both land every row in bucket 0
    flat = spark.createDataFrame(
        [(i, 0.25, 10) for i in range(30)],
        "doc_id long, score double, n_tokens long",
    )
    fb = auto_scaled_bucket("score", 0.25, 0.25, 1024)
    ftot = [
        (r["__bucket"], r["__btot"])
        for r in flat.groupBy(fb.alias("__bucket"))
        .agg(F.sum("n_tokens").alias("__btot"))
        .collect()
    ]
    want = {
        (r.doc_id, r.start_tok)
        for r in select_by_token_fraction(
            flat,
            fraction=0.5,
            score_col="score",
            auto_scale_score=True,
        ).collect()
    }
    got = {
        (r.doc_id, r.start_tok)
        for r in select_by_token_fraction_from_totals(
            flat, ftot, fraction=0.5, score_col="score", bucket_expr=fb
        ).collect()
    }
    assert got == want

    # empty input: min/max collect to None → bucket 0 literal, no rows
    empty = flat.filter(F.lit(False))
    eb = auto_scaled_bucket("score", None, None, 1024)
    assert (
        select_by_token_fraction_from_totals(
            empty, [], fraction=0.5, score_col="score", bucket_expr=eb
        ).count()
        == 0
    )


def test_grouped_rank_matches_window(spark, sf_dir):
    """grouped_rank ≡ row_number() OVER (PARTITION BY group ORDER BY
    key, id) — row-identical to the one-task-per-group window it
    parallelizes, across groups of different sizes and duplicate
    keys."""
    from pyspark.sql import Window

    from shmr_spark.operators.ranking import grouped_rank

    # NULL groups included: PARTITION BY treats NULL as a partition
    # of its own, and a null-unsafe group join silently dropped those
    # rows (caught in the r12 review) — every identity below must
    # hold for them too
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 != 0, F.col("o_orderpriority")).alias(
            "o_orderpriority"
        ),
        "o_totalprice",
    )
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice", "rank"]
    got = grouped_rank(
        orders, ["o_orderpriority"], "o_totalprice", "o_orderkey"
    ).select(*cols)
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    want = orders.withColumn("rank", F.row_number().over(w)).select(*cols)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_grouped_ntile_matches_window(spark, sf_dir):
    """grouped_ntile ≡ ntile(n) OVER (PARTITION BY group ORDER BY
    key, id) for several n, including n larger than the smallest
    group (the quota-0 degenerate)."""
    from pyspark.sql import Window

    from shmr_spark.operators.ranking import grouped_ntile

    # NULL groups included: PARTITION BY treats NULL as a partition
    # of its own, and a null-unsafe group join silently dropped those
    # rows (caught in the r12 review) — every identity below must
    # hold for them too
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 != 0, F.col("o_orderpriority")).alias(
            "o_orderpriority"
        ),
        "o_totalprice",
    )
    small = orders.filter(F.col("o_orderkey") % 97 == 0)
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice", "tile"]
    for df, n in [(orders, 3), (orders, 10), (small, 1000)]:
        got = grouped_ntile(
            df, ["o_orderpriority"], "o_totalprice", "o_orderkey", n
        ).select(*cols)
        w = Window.partitionBy("o_orderpriority").orderBy(
            "o_totalprice", "o_orderkey"
        )
        want = df.withColumn("tile", F.ntile(n).over(w)).select(*cols)
        assert got.exceptAll(want).count() == 0, f"n={n}"
        assert want.exceptAll(got).count() == 0, f"n={n}"


def test_grouped_range_shards_matches_window_formula(spark, sf_dir):
    """grouped_range_shards ≡ the (row_number−1)·n div count formula
    over the plain partitioned window, including a shard count larger
    than the smallest group."""
    from pyspark.sql import Window

    from shmr_spark.operators.ranking import grouped_range_shards

    # NULL groups included: PARTITION BY treats NULL as a partition
    # of its own, and a null-unsafe group join silently dropped those
    # rows (caught in the r12 review) — every identity below must
    # hold for them too
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 != 0, F.col("o_orderpriority")).alias(
            "o_orderpriority"
        ),
        "o_totalprice",
    )
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice", "shard_id"]
    small = orders.filter(F.col("o_orderkey") % 97 == 0)
    for df, n in [(orders, 4), (small, 1000)]:
        got = grouped_range_shards(
            df, ["o_orderpriority"], "o_totalprice", "o_orderkey", n
        ).select(*cols)
        w = Window.partitionBy("o_orderpriority").orderBy(
            "o_totalprice", "o_orderkey"
        )
        want = df.withColumn("__rn", F.row_number().over(w)).withColumn(
            "shard_id",
            F.expr(f"(__rn - 1) * {n} div count(*) OVER "
                   f"(PARTITION BY o_orderpriority)"),
        ).select(*cols)
        assert got.exceptAll(want).count() == 0, f"n={n}"
        assert want.exceptAll(got).count() == 0, f"n={n}"


def test_weighted_sample_matches_python_and_prefers_heavy(spark, sf_dir):
    """weighted_sample ≡ a pure-Python replay of the md5-uniform +
    quantized-ln(u) / w + (es_key desc, key) top-k on the real
    corpus; on a crafted corpus where the LAST ten ids carry 10⁶×
    the weight (so the doc_id tie-break works AGAINST them — a
    heavy-rows-first layout would mask a broken key), all ten heavy
    rows win the top-10 (A-ES weight-proportional inclusion: a
    weight-1 row outranks a weight-10⁶ row only with u in the top
    ~1.5e-5 tail); and non-positive weights raise instead of
    silently corrupting the sample."""
    import hashlib
    import math

    import pytest

    from shmr_spark.catalog import load_table
    from shmr_spark.operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars")
    )

    def es_key(key: int, w: float) -> float:
        b = int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16) % 1_048_576
        return math.floor(math.log((b + 0.5) / 1_048_576.0) * 1e6 + 0.5) / w

    rows = [(r.doc_id, r.n_chars) for r in docs.collect()]
    want = sorted(rows, key=lambda t: (-es_key(t[0], t[1]), t[0]))[:100]
    got = weighted_sample(docs, "doc_id", "n_chars", k=100).collect()
    assert [(r.doc_id, r.n_chars) for r in got] == want
    assert all(r.es_key == es_key(r.doc_id, r.n_chars) for r in got)

    skewed = spark.createDataFrame(
        [(i, 1_000_000.0 if i >= 990 else 1.0) for i in range(1000)],
        "id long, w double",
    )
    top = weighted_sample(skewed, "id", "w", k=10).collect()
    assert sorted(r.id for r in top) == list(range(990, 1000))

    bad = spark.createDataFrame([(1, 1.0), (2, 0.0)], "id long, w double")
    with pytest.raises(Exception, match="weight must be > 0"):
        weighted_sample(bad, "id", "w", k=1).collect()
