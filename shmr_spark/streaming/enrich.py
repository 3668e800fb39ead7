"""Stream-static enrichment: join a stream against a slowly-changing
dimension table.

The static side is planned per micro-batch — Spark re-resolves it
each trigger, so a dimension refreshed in place (overwrite of the
parquet/Delta path) is picked up without restarting the query. The
explicit broadcast keeps the join map-side: the stream partitioning
is untouched (no shuffle added to the hot path), which is the only
sane shape when the stream side is unbounded and the dim fits on an
executor. For dims too big to broadcast, pre-bucket both sides on
the key instead — never let a streaming stage shuffle-sort the
unbounded side per trigger.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: Column | Sequence[str] | str,
    how: str = "left",
) -> DataFrame:
    """Enrich a streaming DataFrame with broadcast dimension columns.
    ``how`` is 'left' by default: enrichment must not drop stream rows
    when the dim key is missing (use 'inner' to filter instead)."""
    if isinstance(on, str):
        on = [on]
    return stream.join(F.broadcast(dim), on, how)
