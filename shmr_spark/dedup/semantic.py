"""Semantic deduplication (SemDeDup-style): cluster the embedding
space with k-means, then prune near-duplicate vectors WITHIN each
cluster only — the published recipe for semantic dedup of web-scale
pretraining corpora (Abbas et al., "SemDeDup", arXiv:2303.09540).

Why clustering matters at 100 TB: the exact rule needs all-pairs
cosine, O(N²·d). Restricting pairs to k-means cells cuts that to
O(Σ|cell|²·d) — with balanced cells a k× reduction — and turns the
pair generation into a __cell equi-join (one hash shuffle, AQE
skew-splittable), never a cross join. Cross-cluster near-dups are
the accepted recall loss; the tests pin it.

Determinism: the keep rule is greedy-by-id — a vector is dropped iff
some SMALLER-id vector in the same cell is ≥ tau cosine-similar.
Greedy-by-id (rather than "keep the one farthest from the centroid")
keeps the output reproducible across engines and runs, which the
hash-oracle discipline requires. Cosine is rounded to 6 decimals
before the threshold test so float accumulation order can't flip a
borderline pair (same discipline as queries/vectors.py).

Reference scope note: the reference engine (/root/reference/shmr) has
no vector operations at all; this module is part of the LLM-pipeline
extension surface, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shmr_spark.functions.vectors import dot, l2_norm


def semantic_dedup(
    df: DataFrame,
    tau: float = 0.4,
    n_clusters: int = 1,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Return the KEPT rows of `df` after semantic dedup.

    n_clusters=1 is the exact (all-pairs) setting — the oracle twin —
    and what the correctness gate runs at sf0.01. Production runs use
    n_clusters ≈ N/10k so each cell's pair block stays small.

    The pair join carries only (id, vector) projections; payload
    columns rejoin at the end via the anti join, so wide document
    rows never ride through the quadratic stage.
    """
    # lazy: similarity.search's module init imports dedup (LSH helpers),
    # so a top-level import here closes a cycle that breaks
    # `import shmr_spark.similarity` on its own
    from shmr_spark.similarity.search import ivf_assign

    if n_clusters <= 1:
        assigned = df.select(id_col, vec_col).withColumn("__cell", F.lit(0))
    else:
        assigned, _ = ivf_assign(
            df.select(id_col, vec_col),
            n_cells=n_clusters,
            id_col=id_col,
            vec_col=vec_col,
            kmeans_iters=kmeans_iters,
        )
    a = assigned.select(
        F.col("__cell"),
        F.col(id_col).alias("__id_a"),
        F.col(vec_col).alias("__vec_a"),
        # per-row norm precompute — d flops per within-cell pair
        # instead of 3d; identical values (same operand order as
        # cosine_similarity)
        l2_norm(vec_col).alias("__n_a"),
    )
    b = assigned.select(
        F.col("__cell"),
        F.col(id_col).alias("__id_b"),
        F.col(vec_col).alias("__vec_b"),
        l2_norm(vec_col).alias("__n_b"),
    )
    sim = F.round(
        dot(F.col("__vec_a"), F.col("__vec_b")) / (F.col("__n_a") * F.col("__n_b")),
        6,
    )
    dropped = (
        a.join(b, on="__cell")
        .filter(F.col("__id_a") < F.col("__id_b"))
        .filter(sim >= tau)
        .select(F.col("__id_b").alias(id_col))
        .distinct()
    )
    return df.join(dropped, on=id_col, how="left_anti")
