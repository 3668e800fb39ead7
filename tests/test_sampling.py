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
