"""Skew-resistant join and aggregation via salting.

Measured under real skew (tools/bench_skew.py: sf1-derived corpus,
one supplier owning ~30% of 6M lineitem rows, SKEW_BENCH.json):

- ``salted_join`` is the one that earns its keep: the naive shuffle
  join lands 32% of rows on one reducer (murmur3 bucket evidence in
  the bench output) and salting cuts the hot bucket to ~7.8% — 24%
  faster wall-clock even at local[32] scale, and the gap widens with
  data size since the straggler grows linearly.
- ``salted_agg`` did NOT beat the naive groupBy for algebraic
  aggregates (0.31 s naive vs 1.54 s salted): Spark's partial
  (map-side) aggregation already reduces each key to ONE row per map
  partition before the shuffle, so row-level skew never reaches the
  reducers, while salting pays an extra shuffle. Keep salted_agg for
  the cases partial aggregation can't compress: per-key state that
  grows with rows (collect_list/set-union style), distinct
  aggregates, or map-side hash tables that exceed memory and degrade
  to sort-based fallback. For plain sum/count/min/max, trust the
  engine's two-phase aggregate.

Algebraic aggregates only (sum/count/min/max + derived avg): each
declares its partial and merge forms below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shmr_spark.functions.numeric import dsum_merge, dsum_partial

# spec name → (partial_expr(col), merge_expr(partial_col))
# dsum stays in scaled-int64 space across BOTH phases so the salted
# result is bit-identical to dsum()/sql_dsum() at any magnitude: the
# earlier decimal(28,6) partial summed exactly too, but its final
# decimal→double cast rounds the true rational once, while dsum
# computes double(int64 total)/10⁶ — the paths differ by 1 ulp once
# the scaled total passes 2⁵³ (caught by the round-11 sf1 parity
# sweep on salted_agg_revenue; see dsum_partial's docstring).
_ALGEBRAIC = {
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "dsum": (
        lambda c: dsum_partial(F.col(c)),
        lambda p: dsum_merge(p),
    ),
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation immune to key skew.

    aggs: output_name → (spec, column), spec in {sum, dsum, count,
    min, max}. Result is row-identical to a direct
    df.groupBy(keys).agg(...) — asserted by the test suite and the
    salted_agg oracle query.
    """
    for name, (spec, _) in aggs.items():
        if spec not in _ALGEBRAIC:
            raise ValueError(f"{name}: non-algebraic spec {spec!r} cannot be salted")

    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(k) for k in df.columns]), F.lit(num_salts))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _ALGEBRAIC[spec][0](col).alias(f"__p_{name}")
            for name, (spec, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[spec][1](f"__p_{name}").alias(name)
            for name, (spec, _) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-immune equi-join for a small side that is too large to
    broadcast: salt the big side's key with a uniform bucket id and
    replicate the small side across all buckets (explode of a
    `sequence` — a bounded num_salts× fan-out of the SMALL side only).
    The shuffle key becomes (on, salt), spreading each hot key over
    num_salts reducers. Row-identical to big.join(small, on, how) for
    inner/left joins (asserted in tests + oracle).

    This is the manual fallback for engines/stages AQE skew-join
    doesn't cover (e.g. when the skewed side feeds an agg in the same
    stage); with AQE on, plain joins usually suffice.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts)),
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return salted_big.join(replicated, [on, "__salt"], how).drop("__salt")
