"""Vector math over ``array<float>`` embedding columns — pure Column
expressions (F.zip_with + F.aggregate), JVM-side, no UDFs, so
similarity search scales with whole-stage codegen instead of Python.

Arithmetic is done in double after a per-element cast; per-row results
are IEEE-deterministic given the same element order, which both Spark
and DuckDB preserve for list columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns (double)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array<numeric> column (double)."""
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array<numeric> columns (double).

    Computed as dot/(|a|·|b|) in a single expression tree; Catalyst
    collapses the three aggregates into one projection.
    """
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
