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

# |sum| (unscaled) above which the 10⁶-scaled int64 path can wrap:
# 2⁶³/10⁶ ≈ 9.22e12, held with ~2% headroom. Callers that KNOW their
# scale exceeds this (e.g. TPC-H revenue sums at sf100) pass
# max_abs_sum and dsum/davg transparently switch to the decimal path.
INT64_SAFE_ABS_SUM = 9.0e12

# A single int64 wrap shifts the sum by 2⁶⁴ ≈ 1.8e19; the float64
# shadow sum's accumulated error stays orders of magnitude below this
# for any realistic row count (n·ε·|partials| ≈ 2e15 even at 10¹²
# rows, plus ≤ 0.5·n scaled units of per-row rounding skew vs the
# floor()ed operand — 5e11 at 10¹² rows), so half a wrap is a safe
# detection threshold.
_WRAP_DETECT = 4.6e18


def _scaled_long(c: Column) -> Column:
    return F.floor(c * F.lit(_SCALE) + F.lit(0.5)).cast("long")


def _ansi_enabled() -> bool:
    """True when the active session runs ANSI SQL semantics (the Spark
    4 default), where sum(long) raises ARITHMETIC_OVERFLOW natively.
    No active session → assume non-ANSI and keep the guard."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        return False
    try:
        # no default argument: RuntimeConfig.get with a user default
        # RETURNS that default instead of the engine's effective value
        # (so a hardcoded "true" would mis-report Spark 3.x sessions,
        # whose effective ANSI default is false)
        val = spark.conf.get("spark.sql.ansi.enabled")
    except Exception:
        return False
    return str(val).lower() == "true"


def _checked_scaled_sum(c: Column) -> Column:
    """Scaled-long sum with overflow detection, fail-loudly contract.

    Under ANSI semantics (Spark 4 default) the engine itself raises on
    int64 wrap — sum(long) → ARITHMETIC_OVERFLOW — so the plain sum IS
    the checked sum: one aggregate, full codegen primitive path. (ANSI
    raises on any wrapped PARTIAL too; for the all-positive money
    columns this path serves, partials only undershoot the final sum,
    so there is no spurious trigger.)

    Under non-ANSI semantics sum(long) wraps silently; a parallel
    float64 shadow sum (also codegen-primitive) exposes the wrap and
    assert_true fails the query instead of returning a corrupt value.
    This doubles the aggregate count — the price of turning silent
    wraparound into an error — and is only paid in opted-out sessions;
    callers at genuinely overflowing scales should pass max_abs_sum."""
    s_long = F.sum(_scaled_long(c))
    if _ansi_enabled():
        return s_long.cast("double")
    # shadow = plain double sum of the RAW column, scaled after the
    # aggregate: one floor/multiply per row instead of two (Spark does
    # not CSE _scaled_long across separate aggregate functions), at the
    # cost of ≤ 0.5·n scaled units of rounding skew — negligible vs
    # _WRAP_DETECT (see above)
    s_shadow = F.sum(c) * F.lit(_SCALE)
    ok = s_long.isNull() | (F.abs(s_long.cast("double") - s_shadow) < F.lit(_WRAP_DETECT))
    guard = F.coalesce(
        F.assert_true(
            ok,
            F.lit(
                "dsum/davg int64 overflow: |sum| exceeds ~9.2e12 — pass "
                "max_abs_sum= to switch to the decimal path, or use dsum_dec"
            ),
        ).cast("double"),
        F.lit(0.0),
    )
    return s_long.cast("double") + guard


def dsum(col: Column | str, max_abs_sum: float | None = None) -> Column:
    """Exact, order-insensitive sum of a double column, as double.

    ``max_abs_sum``: caller's upper bound on |sum|. Above
    INT64_SAFE_ABS_SUM the scaled-int64 fast path could wrap, so the
    aggregate auto-switches to the decimal(28,6) path (exact to 10²²)
    cast to double. Without the hint, the fast path runs with runtime
    wrap detection that fails loudly rather than returning a wrapped
    sum. Note the decimal route's double cast is Spark-side correct
    but NOT DuckDB-hash-comparable (DuckDB's int128→double rounds
    twice), so oracled gate queries must stay below the int64 bound at
    gate scale — they do by ~3 orders of magnitude."""
    c = F.col(col) if isinstance(col, str) else col
    if max_abs_sum is not None and max_abs_sum >= INT64_SAFE_ABS_SUM:
        return dsum_dec(c).cast("double")
    return (_checked_scaled_sum(c) / F.lit(_SCALE)).cast("double")


def dsum_dec(col: Column | str) -> Column:
    """Exact sum as DECIMAL(38,6) — the beyond-int64-scale output form
    (keep it decimal end-to-end; see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC))


def davg(col: Column | str, max_abs_sum: float | None = None) -> Column:
    """Order-insensitive average: exact scaled sum (as double) /
    count — identical operands on both engines, identical result.
    Same overflow contract as dsum."""
    c = F.col(col) if isinstance(col, str) else col
    if max_abs_sum is not None and max_abs_sum >= INT64_SAFE_ABS_SUM:
        return (dsum_dec(c).cast("double") / F.count(c)).cast("double")
    sum_dbl = _checked_scaled_sum(c) / F.lit(_SCALE)
    return (sum_dbl / F.count(c)).cast("double")


def dmul(a: Column, b: Column) -> Column:
    """Per-row double multiply — deterministic (single IEEE op), safe
    to feed into dsum."""
    return (a * b).cast("double")


def dquant(col: Column | str) -> Column:
    """Quantize a double to 6 decimals with the SAME floor-based rule
    on both engines: floor(x·10⁶ + 0.5) / 10⁶ over identical IEEE
    doubles is identical everywhere, whereas ``round(x, 6)`` is a
    LIBRARY function — Spark routes through BigDecimal HALF_UP on the
    exact binary value, DuckDB through a float path — and the two
    disagree by 1 ulp on boundary values. That leak is invisible at
    gate scale and real at sf0.1: pagerank_trade_graph's per-iteration
    round() produced 3.061275 vs 3.061276 on one node of the 60k-edge
    graph (found by the round-9 sf0.1 parity sweep). Iterative float
    pipelines that need cross-engine bit-equality quantize with THIS
    pair (dquant / sql_dquant), not round(). The cross-engine identity
    holds for ANY sign; the caveat is only that floor(x+0.5) rounds
    exact halves toward +∞, so for negative inputs the tie-break
    DIRECTION differs from round-half-away conventions — callers that
    need parity with a round()-style oracle should keep inputs
    positive (every current caller does)."""
    c = F.col(col) if isinstance(col, str) else col
    return _scaled_long(c).cast("double") / F.lit(_SCALE)


def sql_dquant(expr: str) -> str:
    """DuckDB twin of dquant() (same DOUBLE-cast rule as sql_dsum;
    same sign caveat — exact halves round toward +∞)."""
    return (
        f"(CAST(CAST(floor(CAST(({expr}) AS DOUBLE) * 1000000.0 + 0.5)"
        f" AS BIGINT) AS DOUBLE) / 1000000.0)"
    )


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


def dsum_partial(col: Column | str) -> Column:
    """Partial (per-bucket) form of dsum for two-phase/salted
    aggregation: the exact scaled-int64 sum, still in long space.
    Merge with dsum_merge — NOT by summing decimals and casting.

    Why a decimal partial is wrong (found by the sf1 parity sweep,
    round 11): decimal(28,6) partials also sum exactly, but the final
    decimal→double conversion rounds the true rational T/10⁶ ONCE,
    while dsum/sql_dsum compute double(T)/10⁶ — int64→double first
    (correctly rounded), then an IEEE division. Once T exceeds 2⁵³
    the two paths differ by 1 ulp (salted_agg_revenue's sf1 group
    sums hit T ≈ 1.0e17: ...327.673 vs ...327.67299). Staying in
    long space end-to-end reproduces dsum bit-for-bit, since int64
    addition is associative across any partial split."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(_scaled_long(c))


def dsum_merge(partial_col: Column | str) -> Column:
    """Merge of dsum_partial buckets → the same double dsum returns.
    Caller contract matches dsum's un-hinted fast path: |total sum|
    must stay under INT64_SAFE_ABS_SUM."""
    p = F.col(partial_col) if isinstance(partial_col, str) else partial_col
    return (F.sum(p).cast("double") / F.lit(_SCALE)).cast("double")


def sql_dsum_partial(expr: str) -> str:
    """SQL twin of dsum_partial (parses identically in Spark SQL and
    DuckDB): the exact scaled-int64 partial sum, still in BIGINT
    space. Merge with sql_dsum_merge. Same DOUBLE-cast rule as
    sql_dsum."""
    return (
        f"CAST(SUM(CAST(floor(CAST(({expr}) AS DOUBLE) * 1000000.0 + 0.5)"
        f" AS BIGINT)) AS BIGINT)"
    )


def sql_dsum_merge(col: str) -> str:
    """SQL twin of dsum_merge: summing sql_dsum_partial buckets in
    int64 space reproduces sql_dsum bit-for-bit (int64 addition is
    associative across any split; the int64→double conversion and the
    /10⁶ division see identical operands)."""
    return f"(CAST(CAST(SUM({col}) AS BIGINT) AS DOUBLE) / 1000000.0)"
