"""TF-IDF term weighting — the classic sparse text representation,
fully distributed (the corpus size N joins in as a broadcast 1-row
aggregate, never a driver-side action).

weight(t, d) = tf(t, d) · (ln((N + 1)/(df(t) + 1)) + 1)   (smoothed)

Plan shape: explode tokens → (doc, term) counts [shuffle 1] → term
document-frequencies [shuffle 2, on term] → broadcast-join idf back →
optional per-doc top-k window. The oracle gate hash-compares weights
ROUNDED TO 6 DECIMALS on both engines (queries/text.py) — enough to
absorb libm ln() ULP differences while still pinning the arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int | None = None,
) -> DataFrame:
    """(id, term, tf, df, tfidf) rows; top_k keeps the k heaviest
    terms per document (ties broken by term)."""
    terms = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").alias("__n"))
    weighted = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (F.log((F.col("__n") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
        )
        .select(id_col, "term", "tf", "df", "tfidf")
    )
    if top_k is not None:
        w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
        weighted = (
            weighted.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= top_k)
            .drop("__rn")
        )
    return weighted
