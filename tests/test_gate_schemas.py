"""Gate-output schema rule: every registry query's output columns
must be primitive scalars.

The driver's correctness harness canonicalizes both sides through
pandas before hashing, and pandas representation diverges for complex
types: DuckDB ``.df()`` lowers DECIMAL to float64 and LIST to numpy
arrays, while Spark ``toPandas()`` keeps ``decimal.Decimal`` objects
and Python lists. So a query whose OUTPUT schema contains
ARRAY/MAP/STRUCT (pandas sort crashes: "unhashable type: 'list'") or
DECIMAL (typed hash mismatches on representation even when values are
equal) can never hash-green in the driver gate — it was exactly this
class that produced the only two round-4 reds (``inverted_index``,
``dsum_decimal_overflow``).

Rule codified here (VERDICT round 4, "What's wrong"): complex and
decimal arithmetic stay INTERNAL — ship arrays as sorted joined
strings (``concat_ws`` / ``array_to_string``) and decimals cast to
string (never double: DuckDB's int128→double double-rounds).

The walk reads ``.schema`` off each query's DataFrame. For purely
declarative queries that is plan analysis only; queries whose BODIES
run driver actions (streaming replays via run_stream_to_memory,
apply_side_effect's foreach, centroid collects) execute those actions
to produce the DataFrame — so this is a ~1 min integration walk over
the registry, not a millisecond schema check.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from shmr_spark.queries import load_all

FORBIDDEN = (T.ArrayType, T.MapType, T.StructType, T.DecimalType)


def _registry():
    return load_all()


@pytest.fixture(scope="module")
def registry():
    return _registry()


def test_all_gate_outputs_are_primitive_scalars(spark, sf_dir, registry):
    violations: list[str] = []
    errors: list[str] = []
    for name, spec in registry.items():
        try:
            schema = spec.fn(spark, sf_dir).schema
        except Exception as exc:  # noqa: BLE001 - report, don't mask the sweep
            errors.append(f"{name}: schema derivation failed: {exc!r}")
            continue
        for field in schema.fields:
            if isinstance(field.dataType, FORBIDDEN):
                violations.append(
                    f"{name}.{field.name}: {field.dataType.simpleString()}"
                )
    assert not errors, "\n".join(errors)
    assert not violations, (
        "gate outputs must be primitive scalars (driver harness cannot "
        "hash DECIMAL/ARRAY/MAP/STRUCT through pandas):\n"
        + "\n".join(violations)
    )
