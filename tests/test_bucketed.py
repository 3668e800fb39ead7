"""Bucketed-table tests: the join and aggregation on the bucket key
must not shuffle — the physical plan has no Exchange on the bucketed
sides."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shmr_spark.catalog import load_table
from shmr_spark.sources.bucketed import read_table, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", "l_orderkey", 8)
    write_bucketed(orders, "ord_b", "o_orderkey", 8)
    yield "li_b", "ord_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_no_shuffle(spark, sf_dir, bucketed_tables):
    li_b, ord_b = bucketed_tables
    # disable broadcast so the join would otherwise need an exchange
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_table(spark, li_b).df.join(
            read_table(spark, ord_b).df,
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: zero shuffles
        # correctness unchanged
        direct = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert j.count() == direct
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_no_shuffle(spark, bucketed_tables):
    li_b, _ = bucketed_tables
    agg = (
        read_table(spark, li_b)
        .df.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
