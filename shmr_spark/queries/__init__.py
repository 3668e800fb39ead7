"""Query registry — one named query per implemented operator
(SURVEY.md §2 inventory + the LLM-pipeline extensions), each paired
with an ANSI-SQL DuckDB oracle twin where SQL can express it.

Contract (driver, __spark_entry__.py): the Spark callable and the
oracle must produce identical column NAMES and value-hash-identical
contents at sf0.01. Conventions enforced here:

- every computed column is aliased identically on both sides;
- double aggregates go through exact decimal arithmetic
  (functions.numeric) so summation order can't break the hash;
- timestamps are cast to epoch-second BIGINTs on both sides so
  timezone/precision representation can't break it;
- every query has a deterministic row set (no bare LIMIT without
  ORDER BY).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL twin; None → rows-only check
    headline: bool = False  # include in bench.py timing set


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, headline: bool = False):
    """Register a (spark_fn, oracle_sql) pair."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect: registry fills) and
    return the registry."""
    from shmr_spark.queries import relational  # noqa: F401
    from shmr_spark.queries import analytics  # noqa: F401
    from shmr_spark.queries import text  # noqa: F401
    from shmr_spark.queries import vectors  # noqa: F401
    from shmr_spark.queries import advanced  # noqa: F401

    return REGISTRY
