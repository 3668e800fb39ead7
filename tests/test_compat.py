"""Compat-tier tests: the reference's opaque-Python-fn calling
conventions, incl. the 1-arg reduce seeding rule and per-partition
distinct — semantics verified against the reference's own goldens
re-expressed (SURVEY.md §2 #3/#5/#8/#9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shmr_spark import compat
from shmr_spark.catalog import load_table
from shmr_spark.dataset import Dataset


def _li(spark, sf_dir):
    return Dataset(load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    ))


def test_map_records(spark, sf_dir):
    ds = _li(spark, sf_dir)
    out = compat.map_records(
        ds,
        lambda r: {"k": r["l_orderkey"], "q2": r["l_quantity"] * 2},
        schema="k long, q2 double",
    )
    assert out.count() == ds.count()
    native = ds.df.agg(F.sum(F.col("l_quantity") * 2)).collect()[0][0]
    got = out.df.agg(F.sum("q2")).collect()[0][0]
    assert abs(got - native) < 1e-6


def test_flat_map_records(spark, sf_dir):
    ds = _li(spark, sf_dir).head(50)
    out = compat.flat_map_records(
        ds, lambda r: [{"k": r["l_orderkey"]}] * 3, schema="k long"
    )
    assert out.count() == 150


def test_filter_records(spark, sf_dir):
    ds = _li(spark, sf_dir)
    out = compat.filter_records(ds, lambda r: r["l_quantity"] > 25)
    native = ds.df.filter(F.col("l_quantity") > 25).count()
    assert out.count() == native
    assert out.df.schema == ds.df.schema  # raw passthrough keeps schema


def test_reduce_records_one_arg_seeding(spark, sf_dir):
    """Reference seeding rule: without init_val the first record seeds
    via fn(record) relying on the fn's default 2nd arg
    (/root/reference/shmr/partition.py:174-204, verified [10,20,30]→60
    and init=100→160 in SURVEY.md §2 #8)."""

    def sum_qty(rec, accum=0.0):
        return accum + rec["l_quantity"]

    ds = _li(spark, sf_dir)
    expected = ds.df.agg(F.sum("l_quantity")).collect()[0][0]
    got = compat.reduce_records(ds, sum_qty)
    assert abs(got - expected) < 1e-6
    got_init = compat.reduce_records(ds, sum_qty, init_val=100.0)
    assert abs(got_init - (expected + 100.0)) < 1e-6


def test_reduce_records_empty_is_none(spark, sf_dir):
    ds = _li(spark, sf_dir).filter(F.col("l_quantity") < 0)
    assert compat.reduce_records(ds, lambda r, a=0: a + 1) is None


def test_reduce_by_key_records(spark, sf_dir):
    """Keyed fold with accumulator-carries-key (reference #9 idiom)."""

    def fold(rec, accum=None):
        if accum is None:
            return {"flag": rec.get("flag") or rec["l_returnflag"], "n": rec.get("n", 1)}
        return {"flag": accum["flag"], "n": accum["n"] + rec.get("n", 1)}

    li = Dataset(
        load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    )
    out = compat.reduce_by_key_records(
        li, key_fn=lambda r: r.get("flag") or r["l_returnflag"], fn=fold,
        schema="flag string, n long",
    )
    expected = {
        r.l_returnflag: r.n
        for r in li.df.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    got = {r.flag: r.n for r in out.df.collect()}
    assert got == expected


def test_distinct_records_per_partition(spark, sf_dir):
    """Per-partition first-occurrence dedup: within every partition no
    key repeats (global dups across partitions allowed — exactly the
    reference's per-file scope)."""
    ds = _li(spark, sf_dir).repartition(4)
    out = compat.distinct_records_per_partition(ds, lambda r: r["l_partkey"])

    def max_key_count(it):
        seen = {}
        for row in it:
            seen[row["l_partkey"]] = seen.get(row["l_partkey"], 0) + 1
        yield max(seen.values()) if seen else 0

    worst = max(out.df.rdd.mapPartitions(max_key_count).collect())
    assert worst <= 1


def test_sql_udf_registry(spark, sf_dir):
    """Helper fns callable from spark.sql — and the FNV hash matches
    the Python implementation exactly (worker == driver)."""
    from shmr_spark.compat.funcs import str2hashnumber
    from shmr_spark.compat.udf_registry import register_helpers

    register_helpers(spark)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("cust_udf_t")
    rows = spark.sql(
        "SELECT c_name, shmr_str2hashnumber(c_name) AS h FROM cust_udf_t LIMIT 20"
    ).collect()
    for r in rows:
        # SQL LongType is signed 64-bit; python fn returns unsigned
        assert r.h % (2**64) == str2hashnumber(r.c_name) % (2**64)


def test_global_sort_is_globally_sorted(spark, sf_dir):
    """orderBy = range partitioning + local sort: partition i's rows
    all precede partition i+1's (checked via partition-ordered
    iteration)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    s = li.orderBy("l_extendedprice")
    vals = [r.l_extendedprice for r in s.toLocalIterator()]
    assert vals == sorted(vals)
