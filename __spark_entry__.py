"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the shmr_spark package; this module only
adapts the registry (shmr_spark.queries.load_all) to the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from shmr_spark.pyship import ensure_package_shipped  # noqa: E402
from shmr_spark.queries import load_all  # noqa: E402


def _wrap(fn: Callable) -> Callable:
    """Ship the package to Python workers before any query runs —
    Arrow/RDD operators need `import shmr_spark` on the worker side
    regardless of the driver's cwd/PYTHONPATH."""

    def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_package_shipped(spark)
        return fn(spark, sf_dir)

    return inner


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape over lineitem) on sf0.001."""
    spec = load_all()["reduce_by_key_q1"]
    return _wrap(spec.fn)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(spec.fn) for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; queries without one get the rows-only check."""
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
