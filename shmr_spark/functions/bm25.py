"""BM25 scoring — the retrieval-grade upgrade of TF-IDF (Okapi BM25):

score(t, d) = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))

Same distributed shape as functions/tfidf.py: two shuffles (doc-term
counts, term document frequencies), corpus stats (N, avgdl) join in as
broadcast 1-row aggregates. Used for term-weighted retrieval and as a
quality signal (salient-term concentration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = None,
) -> DataFrame:
    """(id, term, tf, df, bm25) rows, optionally top-k per doc."""
    toks = F.split(F.col(text_col), " ")
    docs = df.select(F.col(id_col), toks.alias("__toks")).withColumn(
        "__dl", F.size("__toks").cast("double")
    )
    terms = docs.select(id_col, "__dl", F.explode("__toks").alias("term"))
    tf = terms.groupBy(id_col, "term").agg(
        F.count("*").alias("tf"), F.first("__dl").alias("__dl")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = docs.agg(
        F.count("*").cast("double").alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    idf = F.log(
        1.0 + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("bm25", idf * (F.col("tf") * (k1 + 1.0)) / denom)
        .select(id_col, "term", "tf", "df", "bm25")
    )
    if top_k is not None:
        w = Window.partitionBy(id_col).orderBy(F.desc("bm25"), F.asc("term"))
        scored = (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= top_k)
            .drop("__rn")
        )
    return scored
