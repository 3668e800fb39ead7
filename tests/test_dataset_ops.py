"""Unit tests for the native Dataset operator surface (SURVEY.md §2),
including ports of the reference's own invariants re-expressed on the
synthetic tables (BASELINE.md "reference goldens")."""

from __future__ import annotations

from pyspark.sql import functions as F

from shmr_spark.catalog import load_table
from shmr_spark.dataset import Dataset
from shmr_spark.functions.numeric import dsum


def _li(spark, sf_dir):
    return Dataset(load_table(spark, sf_dir, "lineitem"))


def test_head_limits_rows(spark, sf_dir):
    assert len(_li(spark, sf_dir).head(7).df.collect()) == 7


def test_count(spark, sf_dir):
    assert _li(spark, sf_dir).count() == 6000


def test_map_native_projection(spark, sf_dir):
    out = (
        _li(spark, sf_dir)
        .map(k=F.col("l_orderkey"), double_qty=F.col("l_quantity") * 2)
        .df
    )
    assert out.columns == ["k", "double_qty"]
    row = out.limit(1).collect()[0]
    assert row.double_qty is not None


def test_map_reduce_crosscheck(spark, sf_dir):
    """Reference golden: map(get_age)→sum ≡ reduce(sum_age)
    (/root/reference/tests/test_partition.py:32-55): projecting then
    summing equals folding directly."""
    li = _li(spark, sf_dir)
    mapped_sum = (
        li.map(q=F.col("l_quantity")).reduce(dsum("q").alias("s")).df.collect()[0].s
    )
    reduced_sum = li.reduce(dsum("l_quantity").alias("s")).df.collect()[0].s
    assert mapped_sum == reduced_sum


def test_flat_map_explodes(spark, sf_dir):
    docs = Dataset(load_table(spark, sf_dir, "documents"))
    toks = docs.with_columns(t=F.split("text", " ")).flat_map("t", alias="token", keep=["doc_id"])
    assert toks.count() > docs.count()
    assert toks.df.columns == ["doc_id", "token"]


def test_filter(spark, sf_dir):
    li = _li(spark, sf_dir)
    kept = li.filter(F.col("l_quantity") > 25)
    assert 0 < kept.count() < li.count()
    assert kept.df.filter(F.col("l_quantity") <= 25).count() == 0


def test_distinct_keys(spark, sf_dir):
    li = _li(spark, sf_dir)
    d = li.select("l_partkey").distinct()
    assert d.count() == li.df.select("l_partkey").distinct().count()


def test_distinct_first_deterministic(spark, sf_dir):
    li = _li(spark, sf_dir).select("l_partkey", "l_orderkey", "l_linenumber")
    a = li.distinct_first(["l_partkey"], ["l_orderkey", "l_linenumber"]).df.collect()
    b = li.distinct_first(["l_partkey"], ["l_orderkey", "l_linenumber"]).df.collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # each surviving row is the true min in its group
    mins = {
        r.l_partkey: (r.mk, r.mn)
        for r in li.df.groupBy("l_partkey")
        .agg(F.min("l_orderkey").alias("mk"), F.min(F.struct("l_orderkey", "l_linenumber")).alias("s"))
        .select("l_partkey", "mk", F.col("s.l_linenumber").alias("mn"))
        .collect()
    }
    for r in a:
        assert r.l_orderkey == mins[r.l_partkey][0]


def test_reduce_by_key_partial_final(spark, sf_dir):
    """The reference's 2-pass group-by (partial → shuffle → final,
    SURVEY.md §3) must equal Spark's single groupBy."""
    li = _li(spark, sf_dir)
    got = {
        (r.l_returnflag, r.l_linestatus): r.n
        for r in li.reduce_by_key(
            ["l_returnflag", "l_linestatus"], F.count("*").alias("n")
        ).df.collect()
    }
    # independent recomputation over two explicit stages
    partial = li.df.repartition(4).groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("pn")
    )
    final = {
        (r.l_returnflag, r.l_linestatus): r.n
        for r in partial.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("pn").alias("n"))
        .collect()
    }
    assert got == final


def test_split_by_key_residue_invariant(spark, sf_dir):
    """Reference golden: bucket i holds exactly the rows with
    key % N == i (/root/reference/tests/test_partition.py:58-73)."""
    cust = Dataset(load_table(spark, sf_dir, "customer"))
    n = 5
    bucketed = cust.with_bucket("c_custkey", n)
    bad = bucketed.df.filter(F.pmod(F.col("c_custkey"), F.lit(n)) != F.col("bucket")).count()
    assert bad == 0
    assert bucketed.df.select("bucket").distinct().count() == n
    # physical partitioning: split_by_key co-locates equal keys — each
    # bucket value lives in exactly one partition (several buckets may
    # share a partition; the grouping property is the contract,
    # SURVEY.md §2 #10)
    pairs = (
        bucketed.split_by_key("bucket", n)
        .df.rdd.mapPartitionsWithIndex(
            lambda i, it: iter({(r["bucket"], i) for r in it})
        )
        .collect()
    )
    buckets_seen = {}
    for b, pid in pairs:
        buckets_seen.setdefault(b, set()).add(pid)
    assert all(len(pids) == 1 for pids in buckets_seen.values())


def test_coalesce_row_conservation(spark, sf_dir):
    """Reference golden analog: re-chunking preserves rows and hits the
    requested partition count (tests/test_partitions.py:10-21)."""
    li = _li(spark, sf_dir)
    out = li.coalesce(2, shuffle=True)
    assert out.df.rdd.getNumPartitions() == 2
    assert out.count() == li.count()


def test_concat_union(spark, sf_dir):
    li = _li(spark, sf_dir)
    lo = li.filter(F.col("l_quantity") <= 25)
    hi = li.filter(F.col("l_quantity") > 25)
    assert lo.concat(hi).count() == li.count()


def test_join_inner_matches_sql(spark, sf_dir):
    orders = Dataset(load_table(spark, sf_dir, "orders"))
    cust = Dataset(load_table(spark, sf_dir, "customer"))
    j = orders.join(cust, on=orders.df.o_custkey == cust.df.c_custkey)
    assert j.count() == orders.count()  # every order has a customer


def test_join_grouped_shape(spark, sf_dir):
    """Reference #11 intended semantics: one row per key, right matches
    grouped, keys without right matches dropped."""
    orders = Dataset(load_table(spark, sf_dir, "orders"))
    cust = Dataset(load_table(spark, sf_dir, "customer"))
    g = cust.join_grouped(orders, "c_custkey", "o_custkey", "cust", "ords")
    rows = g.df.select(
        F.col("cust.c_custkey").alias("k"), F.size("ords").alias("n")
    ).collect()
    # one row per customer key, each with >= 1 order
    keys = [r.k for r in rows]
    assert len(keys) == len(set(keys))
    assert all(r.n >= 1 for r in rows)
    per_cust = {
        r.o_custkey: r.n
        for r in orders.df.groupBy("o_custkey").agg(F.count("*").alias("n")).collect()
    }
    assert {r.k: r.n for r in rows} == per_cust


def test_top_k(spark, sf_dir):
    li = _li(spark, sf_dir)
    top = li.top_k(5, F.desc("l_extendedprice")).df.collect()
    assert len(top) == 5
    mx = li.reduce(F.max("l_extendedprice").alias("m")).df.collect()[0].m
    assert top[0].l_extendedprice == mx


def test_apply_side_effects_distributed(spark, sf_dir):
    """Reference #4: side-effect-only iteration, no output partition.
    Observable effect: a Spark accumulator counts every record."""
    li = _li(spark, sf_dir)
    acc = spark.sparkContext.accumulator(0)

    def bump(row):
        acc.add(1)

    li.apply(bump)
    assert acc.value == 6000


def test_approx_distinct_error_bound(spark, sf_dir):
    """approx_count_distinct at rsd=2% must land within 10% of truth."""
    li = _li(spark, sf_dir)
    from pyspark.sql import functions as F2

    row = li.df.agg(
        F2.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
        F2.countDistinct("l_orderkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.10
