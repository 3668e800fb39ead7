"""Production shapes of the LLM-pipeline flagships measured by
bench.py AND tools/audit_100x_llm.py.

Shared module so the shape the bench times and the shape the 100×
audit cites (AUDIT_100X_LLM.json — quoted by dedup/minhash.py and
similarity/knn.py docstrings) are the same code object and cannot
drift apart. Gate queries deliberately do NOT use these: the gates
pin oracle-equivalence configs (degenerate banding, full-probe
expansion), while these are the S-curve/pruned configs a production
pipeline runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def dedup_minhash_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash near-dup pairs in the production 16-band S-curve shape
    (the dedup_minhash GATE uses single-row banding for oracle
    equivalence, which admits far more candidates)."""
    from shmr_spark.catalog import load_table
    from shmr_spark.dedup import minhash_near_duplicates

    docs = load_table(spark, sf_dir, "documents")
    return minhash_near_duplicates(docs, threshold=0.7)


def knn_join_lsh_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN join in the production radius-1 probe-expansion shape (the
    knn_join_lsh GATE uses radius=n_planes full-probe expansion, which
    deliberately admits the whole corpus per probe). Probes are 1% of
    the corpus, so they SCALE with it — the fixed-probe framing lives
    in tools/audit_100x_llm.py."""
    from pyspark.sql import functions as F

    from shmr_spark.catalog import load_table
    from shmr_spark.similarity.knn import knn_join_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    return knn_join_lsh(probes, emb, k=5, n_planes=8, radius=1)


def pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data flow (clean → exact+minhash dedup →
    quality filter → token-budget select → pack → sorted shards) as
    one lazy plan — invariants in tests/test_training_pipeline.py."""
    from shmr_spark.operators.training_pipeline import training_pipeline

    return training_pipeline(spark, sf_dir)
