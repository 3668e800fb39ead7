"""Oracle-deterministic numeric aggregation.

Summing doubles is order-dependent, and Spark's partial/final
aggregation order differs from DuckDB's — a raw SUM(double) over 60k
rows diverges in the last bits and breaks the driver's value-hash
comparison. Fix: sum in EXACT integer space, scaled by 10⁶:

1. Per-row ``floor(x·10⁶ + 0.5) → int64``: identical IEEE multiply/
   add/floor on both engines → identical long. (The corpus's
   money/rate columns carry ≤ 2 decimal digits, so triple products
   have ≤ 6 — the scaled long represents them exactly.)
2. int64 summation is exact in any order. Overflow bound:
   |sum| < 2⁶³/10⁶ ≈ 9.2e12 — sf0.1's largest sum is ~1.6e9.
3. int64→double conversion is correctly rounded in BOTH engines even
   beyond 2⁵³ (verified empirically on 4000 samples in [2⁵³, 2⁶²)),
   then /10⁶ divides identical operands → identical double.
4. avg = sum_double / count: identical operands → identical result.

This is ~3× faster than the earlier decimal(28,6) route (long sums
stay in whole-stage codegen's primitive path; decimal sums carry a
struct with overflow tracking) — bench: TPC-H Q1 agg 1.1 s → 0.36 s
at sf0.1. The decimal form survives as ``dsum_dec`` for scales where
10⁶-scaled sums could overflow int64 (beyond ~sf1000 here): decimal
sums are exact to 10³⁸ and remain cross-engine-equal AS DECIMAL — but
must NOT be cast to double in DuckDB, whose int128→double conversion
rounds twice (verified: wrong by 1 ulp on ~25% of scale-10 values).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,6)"
_SCALE = 1000000.0


def _scaled_long(c: Column) -> Column:
    return F.floor(c * F.lit(_SCALE) + F.lit(0.5)).cast("long")


def dsum(col: Column | str) -> Column:
    """Exact, order-insensitive sum of a double column, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(_scaled_long(c)).cast("double") / F.lit(_SCALE)).cast("double")


def dsum_dec(col: Column | str) -> Column:
    """Exact sum as DECIMAL(38,6) — the beyond-int64-scale output form
    (keep it decimal end-to-end; see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC))


def davg(col: Column | str) -> Column:
    """Order-insensitive average: exact scaled sum (as double) /
    count — identical operands on both engines, identical result."""
    c = F.col(col) if isinstance(col, str) else col
    sum_dbl = F.sum(_scaled_long(c)).cast("double") / F.lit(_SCALE)
    return (sum_dbl / F.count(c)).cast("double")


def dmul(a: Column, b: Column) -> Column:
    """Per-row double multiply — deterministic (single IEEE op), safe
    to feed into dsum."""
    return (a * b).cast("double")


def sql_dsum(expr: str) -> str:
    """DuckDB twin of dsum() for oracle_sql strings.

    The operand is cast to DOUBLE first: DuckDB types the literal
    ``1000000.0`` as DECIMAL, and FLOAT * DECIMAL stays FLOAT — a
    float32 product that rounds differently from Spark's
    float→double promotion. The cast is a no-op for DOUBLE columns."""
    return (
        f"(CAST(CAST(SUM(CAST(floor(CAST(({expr}) AS DOUBLE) * 1000000.0 + 0.5)"
        f" AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000000.0)"
    )


def sql_davg(expr: str) -> str:
    """DuckDB twin of davg() (same DOUBLE-cast rule as sql_dsum)."""
    return (
        f"CAST((CAST(CAST(SUM(CAST(floor(CAST(({expr}) AS DOUBLE) * 1000000.0 + 0.5)"
        f" AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000000.0) / COUNT({expr}) AS DOUBLE)"
    )
