"""Persistent IVF index: the storage-prune ANN path.

The in-memory tiers (similarity/search.py) assign cells per query and
FILTER the corpus — correct, but every probe still scans all files. At
100 TB the index must live in the LAYOUT: the corpus is written once,
``partitionBy(__cell)``, so a probe's n_probe cells map to n_probe
directories and the parquet scan never opens the rest (Spark partition
pruning — asserted on inputFiles in tests/test_dedup_similarity.py).
Centroids are a k×dim side table read in full (tiny, broadcast).

This is the persistent analog of the reference's split_by_key
(/root/reference/shmr/partition.py:239-261): materialize hash routes
once so later jobs touch only their bucket — with the planner aware
of the layout, and with learned (k-means) cells instead of a modulo.

Build once, search many: the economics of every production ANN system
(FAISS IVF, ScaNN, Milvus) — expressed here purely as Spark layout +
Catalyst pruning, no native library.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shmr_spark.functions.vectors import cosine_similarity, lit_double_array
from shmr_spark.similarity.search import ivf_assign


def build_ivf_index(
    df: DataFrame,
    path: str,
    n_cells: int = 16,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Assign cells (Lloyd-refined by default) and write:
    ``<path>/corpus``  — the vectors, partitioned by __cell;
    ``<path>/centroids`` — the k×dim centroid table.

    One shuffle-free write per cell directory (partitionBy); rebuilds
    are full-replace (mode=overwrite), matching how batch ANN indexes
    are refreshed."""
    assigned, centroids = ivf_assign(df, n_cells, id_col, vec_col, kmeans_iters)
    assigned.write.mode("overwrite").partitionBy("__cell").parquet(
        os.path.join(path, "corpus")
    )
    centroids.write.mode("overwrite").parquet(os.path.join(path, "centroids"))


def search_ivf_index(
    spark: SparkSession,
    path: str,
    probe_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine search against a built index.

    The probe's n_probe nearest centroids are resolved driver-side
    (k rows — the only collect, same economics as MLlib), then the
    corpus scan carries ``__cell IN (...)`` as a PARTITION filter:
    only those directories are read. Returns (id, sim) like the
    in-memory tiers."""
    centroids = spark.read.parquet(os.path.join(path, "centroids"))
    probe = lit_double_array(probe_vec)
    cells = [
        r["__cell"]
        for r in centroids.select(
            "__cell", cosine_similarity(F.col("__cvec"), probe).alias("__s")
        )
        .orderBy(F.desc("__s"), F.asc("__cell"))
        .limit(n_probe)
        .collect()
    ]
    corpus = spark.read.parquet(os.path.join(path, "corpus"))
    sim = F.round(cosine_similarity(F.col(vec_col), probe), 6)
    return (
        corpus.filter(F.col("__cell").isin(cells))
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )
