"""Incremental (append-only) exact dedup: dedup an incoming batch
against the persisted fingerprint state of the already-accepted
corpus, without re-reading the corpus texts.

This is the production shape at 100 TB: the corpus is never
re-deduplicated wholesale — each ingest batch is checked against a
small-per-row FINGERPRINT table (fp, keeper_id) that grows
append-only. Plan shape per batch:

1. fingerprint the batch in its scan stage (md5 of normalized text,
   same normalization as dedup/exact — a batch fp equals a state fp
   iff the texts are exact duplicates);
2. batch-internal first-wins (one shuffle on fp);
3. LEFT ANTI join survivors against the state on fp — the only
   contact with history, and it touches fingerprints, not texts.
   At scale, write the state bucketed by fp (bucketBy) so this join
   co-locates without a state-side shuffle;
4. the survivors' (fp, id) rows ARE the state delta — append them.

The reference has no incremental surface (its datasets are immutable
file globs, /root/reference/shmr/partitions.py:13-24); this extends
the exact-dedup capability the way an ingest pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from shmr_spark.functions.hashing import fingerprint_md5


def incremental_dedup_exact(
    new_docs: DataFrame,
    state: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """Rows of ``new_docs`` that survive dedup against ``state`` and
    against the batch itself (first-wins by id), with their ``__fp``
    column attached. The state delta to append for the next batch is
    ``result.select("__fp", F.col(id_col).alias("keeper_id"))`` —
    matching ``fingerprint_state``'s (__fp, keeper_id) schema.

    ``state`` needs one column: ``__fp`` (fingerprints of every
    already-accepted document). Build it from an accepted corpus with
    ``fingerprint_state``.
    """
    fp = fingerprint_md5(text_col, normalize=normalize).alias("__fp")
    batch = new_docs.select(fp, "*")
    w = Window.partitionBy("__fp").orderBy(id_col)
    batch_first = (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # no distinct() on the state side: LEFT ANTI results are unaffected
    # by duplicate right-side keys, and a distinct would force a full
    # shuffle of the append-only state table on every batch (defeating
    # a bucketed-by-fp state layout)
    return batch_first.join(state.select("__fp"), "__fp", "left_anti")


def fingerprint_state(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """(__fp, keeper id) state table of an accepted corpus — one row
    per distinct fingerprint, keeper = min id (deterministic)."""
    fp = fingerprint_md5(text_col, normalize=normalize).alias("__fp")
    return (
        docs.select(fp, F.col(id_col))
        .groupBy("__fp")
        .agg(F.min(id_col).alias("keeper_id"))
    )
