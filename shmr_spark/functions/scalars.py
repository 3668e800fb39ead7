"""In-plan scalar broadcast — the replacement for driver-side
``count()`` / ``first()`` scalars inside operator bodies.

Why this exists (round-8 policy, enforced by tests/test_gate_schemas'
job-group check): building a DataFrame must not run Spark jobs. A
plan-construction action executes part of the pipeline once for the
scalar and again on the caller's action, breaks lazy composition
(composing the operator under an unexecuted segment eagerly executes
that segment), and at 100 TB turns a free plan rewrite into a full
corpus pass. Instead, a 1-row aggregate rides the plan as a
broadcast nested-loop cross join — Catalyst broadcasts the single
row, every executor reads it locally, and the "scalar" is computed
exactly once at action time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["with_scalars"]


def with_scalars(df: DataFrame, scalars: DataFrame) -> DataFrame:
    """``df`` with the columns of the 1-row ``scalars`` frame appended
    to every row via a broadcast cross join. ``scalars`` must be a
    global aggregate (exactly one row — e.g. ``src.agg(...)``); the
    caller drops the scalar columns when done."""
    return df.crossJoin(F.broadcast(scalars))
