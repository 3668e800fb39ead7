"""Snapshot diff between two corpus versions — the change-detection
step of an incremental ingest pipeline (what changed between
yesterday's crawl and today's?).

Scale design: both sides are projected to (id, 64-bit content hash)
BEFORE the full outer join, so the only thing that crosses the
shuffle is 16 bytes per row — never the document payload. One
shuffle on the id, no windows, no collects. Downstream consumers
join the emitted id list back to whichever side they need
(added/changed → new snapshot, removed → old), which is a second
id-equi-join that AQE will co-plan with the first.

The comparison is hash-equality (xxhash64 over the compare columns):
a 2^-64 collision could mask a change, the standard trade for not
shuffling payloads; pass the payload columns themselves as
``compare_cols`` to a small diff if exactness is required.

Reference scope note: the reference engine (/root/reference/shmr) has
no multi-dataset diff; nearest primitive is partition.join
(/root/reference/shmr/partition.py:263). This operator is part of the
incremental-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Rows that differ between two snapshots.

    Output: id_cols + status ∈ {'added', 'removed', 'changed'}.
    Unchanged rows are filtered before the exchange wherever the
    planner can, and never emitted.
    """
    # xxhash64 SKIPS null inputs (the running hash passes through), so
    # hashing bare columns would let a value "move" between columns —
    # (text='en', lang=NULL) vs (text=NULL, lang='en') — fold the same
    # byte stream and masquerade as unchanged. Interleaving a per-column
    # null flag (never null itself) fixes the arity: the flag pattern
    # alone separates any two rows with different null layouts.
    def _h(cols):
        parts = []
        for c in cols:
            parts.append(F.col(c))
            parts.append(F.col(c).isNull().cast("int"))
        return F.xxhash64(*parts)

    h_old = old.select(*id_cols, _h(compare_cols).alias("__h_old"))
    h_new = new.select(*id_cols, _h(compare_cols).alias("__h_new"))
    joined = h_old.join(h_new, on=id_cols, how="full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
    )
    return (
        joined.select(*id_cols, status.alias("status"))
        .filter(F.col("status").isNotNull())
    )
