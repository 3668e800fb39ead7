"""Scale-feature evidence: partition pruning on partitioned writes,
AQE skew-join handling, ORC round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shmr_spark.catalog import load_table
from shmr_spark.dataset import Dataset
from shmr_spark.sources import write_parquet


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """write partitionBy(flag) → a flag-filtered read must scan ONLY
    that partition directory (plan shows the partition filter and a
    pruned input count)."""
    out = str(tmp_path / "li_part")
    li = Dataset(load_table(spark, sf_dir, "lineitem"))
    write_parquet(li, out, partition_by=["l_returnflag"])

    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "A")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "l_returnflag" in plan.split("PartitionFilters")[1][:200]
    # correctness: counts match the unpartitioned filter
    want = li.filter(F.col("l_returnflag") == "A").count()
    assert back.count() == want


def test_aqe_handles_skewed_join(spark, sf_dir):
    """A 90%-one-key skewed join must still complete with AQE's skew
    handling enabled and produce exact results (compare vs broadcast
    ground truth)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    skewed = li.withColumn(
        "k", F.when(F.col("l_orderkey") % 10 != 0, F.lit(1)).otherwise(F.col("l_orderkey"))
    )
    dim = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = skewed.join(dim, "k").groupBy("k").agg(F.count("*").alias("n"))
        got = {r.k: r.n for r in j.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    truth = {
        r.k: r.n
        for r in skewed.join(F.broadcast(dim), "k").groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    assert got == truth
    assert max(got.values()) > sum(got.values()) * 0.5  # skew really present


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "cust_orc")
    cust = load_table(spark, sf_dir, "customer")
    cust.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.count() == cust.count()
    assert set(back.columns) == set(cust.columns)


def test_sorted_write_data_skipping(spark, sf_dir, tmp_path):
    """sortWithinPartitions before write → parquet row-group stats make
    selective key filters cheap; correctness: filter result identical."""
    out = str(tmp_path / "li_sorted")
    li = load_table(spark, sf_dir, "lineitem")
    li.repartition(4, "l_orderkey").sortWithinPartitions("l_orderkey").write.mode(
        "overwrite"
    ).parquet(out)
    back = spark.read.parquet(out).filter(F.col("l_orderkey") == 42)
    want = li.filter(F.col("l_orderkey") == 42).count()
    assert back.count() == want
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_orderkey" in plan
