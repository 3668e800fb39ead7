"""End-to-end training-data pipeline: one lazy chain from raw corpus
to written train/test splits — the composition the engine exists for.

ingest → clean/normalize → quality filter → exact dedup → near-dup
cluster dedup → language stats → deterministic split → partitioned
parquet write → re-read and audit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shmr_spark.catalog import load_table
from shmr_spark.dedup import minhash_near_duplicates
from shmr_spark.dedup.clusters import dedup_keep_cluster_representative
from shmr_spark.dedup.exact import dedup_exact_keep_first
from shmr_spark.functions.text import quality_score, token_count
from shmr_spark.operators.sampling import train_test_split


def test_full_pipeline(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # clean + annotate (pure Column exprs, no shuffle)
    cleaned = docs.select(
        "doc_id",
        "lang",
        F.trim(F.regexp_replace(F.lower("text"), " +", " ")).alias("text"),
    ).withColumn("quality", quality_score("text")).withColumn(
        "n_tokens", token_count("text")
    )

    # quality gate
    kept = cleaned.filter((F.col("quality") > 0.5) & (F.col("n_tokens") >= 5))

    # exact dedup then near-dup cluster dedup
    exact = dedup_exact_keep_first(kept, "text", "doc_id")
    pairs = minhash_near_duplicates(exact, threshold=0.8)
    surv = dedup_keep_cluster_representative(exact, pairs)
    n_surv = surv.count()
    assert 0 < n_surv <= n_raw

    # deterministic split + partitioned write
    train, test = train_test_split(surv, "doc_id", test_fraction=0.2)
    out = str(tmp_path / "corpus")
    train.withColumn("split", F.lit("train")).unionByName(
        test.withColumn("split", F.lit("test"))
    ).write.mode("overwrite").partitionBy("split", "lang").parquet(out)

    # audit the written corpus
    back = spark.read.parquet(out)
    assert back.count() == n_surv
    # partition pruning works on the layout
    tr = back.filter((F.col("split") == "train") & (F.col("lang") == "en"))
    plan = tr._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # splits disjoint & exhaustive after the round-trip
    counts = {r.split: r.n for r in back.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["train"] + counts.get("test", 0) == n_surv
    # no surviving near-dup pairs above threshold among survivors
    leftover = minhash_near_duplicates(surv, threshold=0.8).count()
    assert leftover == 0
