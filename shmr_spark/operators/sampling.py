"""Deterministic sampling operators for training-data pipelines.

Random-looking but fully deterministic: membership is a pure function
of the row's key via xxhash64, so splits are reproducible across
runs, machines, and cluster sizes, rows never migrate between splits
when the corpus grows (append-stability), and no state/seed files are
needed — the property a 100 TB train/eval split actually requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_split_col(key: Column | str, buckets: int = 10_000) -> Column:
    """Uniform [0, buckets) bucket from a key column."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(c), F.lit(buckets))


def hash_split_col_md5(key: str | Column, buckets: int = 10_000) -> Column:
    """Cross-engine variant of hash_split_col: bucket from the first
    60 bits of md5(key-as-string). Slower than xxhash64 (md5 + hex
    parse per row) but bit-identical in DuckDB
    (``CAST('0x' || substr(md5(k), 1, 15) AS BIGINT) % buckets``),
    which is what lets the train_test_split driver gate hash-compare
    the actual split assignment."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def train_test_split(
    df: DataFrame,
    key: str,
    test_fraction: float = 0.1,
    buckets: int = 10_000,
    split_col: Column | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(train, test) split on a stable key hash. Disjoint, exhaustive,
    deterministic; ~test_fraction of keys land in test. ``split_col``
    swaps in an alternative bucket expression (e.g.
    hash_split_col_md5 for the cross-engine driver gate)."""
    cut = int(round(test_fraction * buckets))
    b = split_col if split_col is not None else hash_split_col(key, buckets)
    return df.filter(b >= cut), df.filter(b < cut)


def stratified_sample_exact(
    df: DataFrame,
    strata: list[str],
    fraction: float,
    order: list[str],
) -> DataFrame:
    """EXACT stratified sample: the first ceil(fraction·|stratum|) rows
    of each stratum under a deterministic order. One shuffle (the
    window); oracle-expressible in SQL, unlike rate-based sampleBy."""
    w = Window.partitionBy(*strata).orderBy(*order)
    counts = Window.partitionBy(*strata)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(counts))
        .filter(F.col("__rn") <= F.ceil(F.col("__n") * F.lit(fraction)))
        .drop("__rn", "__n")
    )
