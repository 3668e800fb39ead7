"""Document chunking: split texts into overlapping token windows —
the standard LLM-training prep step (context-length packing).

Pure Column expressions: starts = sequence(1, n, stride), chunks =
slice per start, posexplode → one row per chunk. No UDF; the explode
is the only row-multiplying op and everything stays in the scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_chunk_tokens): token windows of
    `chunk_size` advancing by `chunk_size - overlap`. The final window
    may be shorter; every token appears in ≥ 1 chunk."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    toks = F.split(F.col(text_col), " ")
    # Last start caps at n - overlap: a start beyond that yields a
    # window fully contained in its predecessor (pure redundancy).
    # Coverage holds: the last start s satisfies s > n-overlap-stride
    # = n-chunk_size, so s+chunk_size-1 >= n.
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(toks) - F.lit(overlap), F.lit(1)),
        F.lit(stride),
    )
    chunks = F.transform(starts, lambda s: F.slice(toks, s, chunk_size))
    return (
        df.select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_idx", "__chunk"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.array_join("__chunk", " ").alias("chunk_text"),
            F.size("__chunk").cast("long").alias("n_chunk_tokens"),
        )
    )
