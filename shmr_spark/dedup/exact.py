"""Exact dedup: hash-groupBy on a content fingerprint, keep the
deterministic first record per group (min by a stable order column).

One shuffle on the fingerprint — the md5 is computed in the scan
stage, so at 100 TB the shuffle carries (fp, order, payload) rows and
nothing re-reads the text twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from shmr_spark.functions.hashing import fingerprint_md5


def dedup_exact_keep_first(
    df: DataFrame,
    text_col: str = "text",
    order_col: str | Column = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Drop exact (fingerprint-identical) duplicates, keeping the
    min-order record per group. Deterministic — unlike bare
    dropDuplicates — so oracle-checkable."""
    fp = fingerprint_md5(text_col, normalize=normalize)
    w = Window.partitionBy(fp).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
