"""Sampling operator invariants: disjoint/exhaustive/deterministic
splits, append-stability, exact stratified fractions."""

from __future__ import annotations

from pyspark.sql import functions as F

from shmr_spark.catalog import load_table
from shmr_spark.operators.sampling import stratified_sample_exact, train_test_split


def test_split_disjoint_exhaustive_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tr1, te1 = train_test_split(docs, "doc_id", 0.2)
    tr2, te2 = train_test_split(docs, "doc_id", 0.2)
    n, ntr, nte = docs.count(), tr1.count(), te1.count()
    assert ntr + nte == n
    assert tr1.join(te1, "doc_id", "inner").count() == 0
    assert {r.doc_id for r in te1.select("doc_id").collect()} == {
        r.doc_id for r in te2.select("doc_id").collect()
    }
    # roughly the requested fraction (hash-uniform)
    assert 0.1 < nte / n < 0.3


def test_split_append_stable(spark, sf_dir):
    """Growing the corpus must not move existing keys between splits."""
    docs = load_table(spark, sf_dir, "documents")
    half = docs.filter(F.col("doc_id") < 250)
    _, te_half = train_test_split(half, "doc_id", 0.2)
    _, te_full = train_test_split(docs, "doc_id", 0.2)
    half_ids = {r.doc_id for r in te_half.select("doc_id").collect()}
    full_ids = {r.doc_id for r in te_full.filter(F.col("doc_id") < 250).select("doc_id").collect()}
    assert half_ids == full_ids


def test_stratified_exact_fraction(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    out = stratified_sample_exact(
        li, ["l_returnflag"], 0.1, ["l_orderkey", "l_linenumber"]
    )
    import math

    per = {r.l_returnflag: r.n for r in li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()}
    got = {r.l_returnflag: r.n for r in out.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()}
    for k, n in per.items():
        assert got[k] == math.ceil(n * 0.1)


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    """Every near-dup cluster lands wholly on one side, including
    planted near-copies whose own id-hashes would split them."""
    from shmr_spark.dedup import minhash_near_duplicates
    from shmr_spark.operators.sampling import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    near = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat("text", F.lit(" zz")).alias("text"),
    )
    corpus = docs.unionByName(near)
    pairs = minhash_near_duplicates(corpus, threshold=0.5, num_hashes=64, bands=64)
    out = leakage_safe_split(corpus, pairs, test_fraction=0.3).select(
        "doc_id", "group_id", "split"
    )
    # (a) no group straddles sides
    straddlers = (
        out.groupBy("group_id")
        .agg(F.count_distinct("split").alias("n_sides"))
        .filter(F.col("n_sides") > 1)
        .count()
    )
    assert straddlers == 0
    # (b) each planted near-copy shares a group (and hence a side)
    # with its original
    rows = {r.doc_id: (r.group_id, r.split) for r in out.collect()}
    linked = [i for i in range(20) if rows[i][0] == rows[i + 500000][0]]
    assert len(linked) >= 15  # minhash at 0.5 catches nearly all
    for i in linked:
        assert rows[i][1] == rows[i + 500000][1]
    # (c) both sides populated
    sides = {s for (_, s) in rows.values()}
    assert sides == {"train", "test"}


def test_temperature_mix_upweights_low_resource_groups(spark, sf_dir):
    """At α=0.5 the kept FRACTION must be monotonically higher for
    smaller groups (the rebalancing point); at α=1 rates are uniform
    across groups (natural proportions preserved)."""
    from shmr_spark.catalog import load_table
    from shmr_spark.operators.mixing import temperature_mix_rates

    docs = load_table(spark, sf_dir, "documents")
    half = {
        r.lang: (r.n, r.rate)
        for r in temperature_mix_rates(docs, "lang", 300, alpha=0.5).collect()
    }
    by_size = sorted(half.values())
    for (n1, r1), (n2, r2) in zip(by_size, by_size[1:]):
        assert r1 >= r2, f"smaller group {n1} got lower rate than {n2}"

    flat = [
        r.rate
        for r in temperature_mix_rates(docs, "lang", 300, alpha=1.0).collect()
    ]
    assert max(flat) - min(flat) < 1e-9  # α=1 ⇒ uniform sampling rate
