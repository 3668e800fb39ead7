"""Oracle-deterministic numeric aggregation.

Summing doubles is order-dependent, and Spark's partial/final
aggregation order differs from DuckDB's — a raw SUM(double) over 60k
rows diverges in the last bits and breaks the driver's value-hash
comparison. Fix: route oracle-facing sums through exact decimal
arithmetic at scale 6:

1. The corpus's money/rate columns carry ≤ 2 decimal digits, so any
   product of up to three of them has ≤ 6 — the per-row
   ``cast(double AS decimal(28,6))`` RECOVERS the exact decimal value
   (the double sits ~1e-10 from it, nowhere near a rounding boundary)
   identically on both engines. Verified empirically on every lineitem
   charge product.
2. Decimal summation is exact in any order.
3. The final decimal→double cast is exact on both engines while
   |sum|·10⁶ < 2⁵³ (|sum| < 9e9; sf0.1's largest sum is ~1.6e9): the
   int numerator fits a double. Verified empirically: DuckDB's
   decimal→double cast is correctly rounded at scale ≤ 6 but NOT at
   scale 10 (its int128→double conversion rounds twice).
4. avg = sum_double / count divides identical operands → identical
   IEEE result.

Scale-out note: at true 100 TB scale sums can exceed 9e9 — there the
query should emit the DECIMAL itself (dsum_dec: also exact and
engine-portable); the double cast exists because the harness compares
double columns. Deeper products (> 6 decimal digits) would need a
wider scale with the same numerator-cap analysis.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,6)"


def dsum(col: Column | str) -> Column:
    """Exact, order-insensitive sum of a double column, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def dsum_dec(col: Column | str) -> Column:
    """Exact sum kept as DECIMAL(38,4) — the 100 TB-safe output form."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC))


def davg(col: Column | str) -> Column:
    """Order-insensitive average: exact decimal sum (as double) /
    count — identical operands on both engines, identical result."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).cast("double")


def dmul(a: Column, b: Column) -> Column:
    """Per-row double multiply — deterministic (single IEEE op), safe
    to feed into dsum."""
    return (a * b).cast("double")


def sql_dsum(expr: str) -> str:
    """DuckDB twin of dsum() for oracle_sql strings."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB twin of davg()."""
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS DOUBLE)"
    )
