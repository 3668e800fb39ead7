"""Embedding-cosine near-duplicate detection with random-hyperplane
LSH blocking (the scale path; the brute-force variant is the
embedding_neardup oracle query).

Hyperplanes are deterministic (numpy PCG64 seed) and ship as a plain
literal array column — tiny, embedded in the plan, no broadcast
variable plumbing needed. Bucket id = sign-bit pattern of the
hyperplane dot products; candidates come from an equi-join on the
bucket, verified with exact cosine.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shmr_spark.functions.vectors import cosine_similarity, dot


def hyperplanes(dim: int, n_planes: int = 12, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (rounded so the literal is
    compact and cross-platform stable)."""
    rng = np.random.default_rng(seed)
    return [[round(float(x), 6) for x in row] for row in rng.standard_normal((n_planes, dim))]


def lsh_bucket(vec: Column | str, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id (long) of a vector under the planes."""
    v = F.col(vec) if isinstance(vec, str) else vec
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*(F.lit(x) for x in p))
        bit = F.when(dot(v, plane) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return bucket


def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 8,
    threshold: float = 0.95,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs (id_a, id_b, sim ≥ threshold) via LSH-bucket
    blocking + exact cosine verify. Recall note: sign-LSH is
    approximate — pairs split across buckets are missed; raise recall
    by lowering n_planes or multi-probing (future work), trade
    against bucket size."""
    planes = hyperplanes(dim, n_planes, seed)
    bucketed = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        lsh_bucket(vec_col, planes).alias("__bucket"),
    ).localCheckpoint(eager=False)  # bucket dots reused by both join sides
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    sim = F.round(cosine_similarity(F.col("a.__v"), F.col("b.__v")), 6)
    return (
        a.join(
            b,
            (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
