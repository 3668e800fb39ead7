"""Bloom-filter semi-join / anti-join reduction.

The 100 TB join problem this solves: a fact table too big to move
semi-joined against a dim table too big to BROADCAST as a hash
relation (tens of millions of keys), where a plain ``left_semi``
shuffles the ENTIRE fact table on the join key. A Bloom filter over
the dim keys is a few MB regardless of dim row width, broadcasts as a
plan literal, and pre-filters the fact scan down to (selectivity +
false-positive rate) of its rows BEFORE the exchange — the classic
semi-join reduction. The result is still EXACT: a confirming
``left_semi`` against the real key set removes Bloom false positives,
so ``bloom_semi_join(fact, dim, k) ≡ fact SEMI JOIN dim USING (k)``
row-for-row — which is how the gate query carries a plain IN-subquery
DuckDB oracle. Measured (tools/bench_bloom.py, BLOOM_BENCH.json): at
60M fact rows the reduction keeps 3.7 % of the scan and wins 2.1×
over the plain shuffle semi-join; at 6M the bitmap build still
outweighs the saved exchange (0.78 → 0.96 s) — this is a
big-fact-side operator, and when the dim fits in a broadcast, the
broadcast join beats both (SCALING.md has the full table).
``bloom_anti_join`` is the same reduction pointed the other way:
probe-MISS rows are definite non-matches and skip the exchange
entirely; only the probe-positive fraction is confirmed. Its trade
— the full-fact exchange for a second pruned scan — measures
~break-even on local narrow-column scans (4.24 → 4.11 s at 60M) and
pays in the wide-row / real-network regime where shuffle bytes, not
scans, are the cost. (Spark's own runtime bloom pruning —
``spark.sql.optimizer.runtime.bloomFilter.enabled`` — does this
opportunistically inside AQE; this operator makes the reduction an
explicit, testable plan step with a deterministic filter.)

Reference parity note: the reference engine has no semi-join reduction
(its join, /root/reference/shmr/partition.py:263, streams one file
against an in-memory dict); this is part of the §8 scale extension
surface.

Everything stays JVM-side: bit positions come from ``xxhash64``
(double hashing: pos_i = h1 + i·h2 mod m, Kirsch-Mitzenmacher), the
filter bitmap is OR-aggregated distributedly as 64-bit words, and the
only driver transfer is the finished bitmap — ``num_bits/64`` longs
(128 KiB at the 1M-bit default), the same bounded-collect class as
k-means centroids. The probe side is a pure expression over a literal
array, inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "build_bloom_bits",
    "bloom_might_contain",
    "bloom_semi_join",
    "bloom_anti_join",
]


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """Kirsch-Mitzenmacher double hashing: two independent xxhash64
    draws (seeded by a literal second argument — xxhash64 SKIPS null
    args, so the literal also keeps a NULL key from hashing to the
    empty input) combine into k positions.

    Both draws are reduced modulo num_bits BEFORE the i*h2 combine:
    Spark 4 runs ANSI mode by default, where ``i * <full-range int64>``
    raises ARITHMETIC_OVERFLOW instead of wrapping (for a uniform h2
    the chance that all k-1 products fit in int64 is ~1/(k-1)!). After
    the reduction every intermediate is < k * num_bits, overflow-free
    for any num_bits ≤ 2^59. pmod by the power-of-two num_bits
    preserves h2's low bit, so forcing it odd AFTER the reduction
    keeps it coprime with num_bits and the k positions cannot collapse
    onto one bit."""
    m = F.lit(num_bits)
    h1 = F.pmod(F.xxhash64(key, F.lit(0x5BD1)), m)
    h2 = F.pmod(F.xxhash64(key, F.lit(0x9E37)), m).bitwiseOR(F.lit(1))
    return [F.pmod(h1 + F.lit(i) * h2, m) for i in range(num_hashes)]


def build_bloom_bits(
    dim: DataFrame, key: str, num_bits: int = 1 << 20, num_hashes: int = 5
) -> list[int]:
    """Bloom bitmap over ``dim[key]`` as a dense list of
    ``num_bits/64`` signed 64-bit words.

    Distributed build: each key contributes k (word, mask) pairs, one
    shuffle of at most k rows per key aggregates ``bit_or`` per word
    (at most num_bits/64 groups), and only the finished words reach
    the driver. NULL keys are skipped — SQL semantics: NULL never
    equals anything, so a semi-join can never keep a NULL-key row.

    num_bits must be a power of two (cheap pmod, and the h2-odd
    coprimality argument in _positions relies on it)."""
    if num_bits & (num_bits - 1):
        raise ValueError(f"num_bits must be a power of two, got {num_bits}")
    n_words = num_bits // 64
    kc = F.col(key)
    pos = F.array(*_positions(kc, num_bits, num_hashes))
    words = (
        dim.where(kc.isNotNull())
        .select(F.explode(pos).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            _shl1(F.col("pos").cast("int") % 64).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()  # bounded: ≤ num_bits/64 rows (16k at default), never O(dim)
    )
    bits = [0] * n_words
    for r in words:
        bits[r["word"]] = r["bits"]
    return bits


def _shl1(numbits: Column) -> Column:
    """1L << numbits with a COLUMN shift amount (F.shiftleft only
    accepts a Python int there)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), numbits)


def _bits_literal(bits: list[int]) -> Column:
    """The bitmap as ONE plan constant. F.lit(list) builds CreateArray
    with len(list) literal CHILDREN — a 16k-node expression tree that
    takes seconds to construct and bloats every plan string. Instead:
    split a single string literal and cast — every node is foldable,
    so Catalyst's ConstantFolding collapses it to a single array
    Literal at optimization time (verified by plan inspection in
    tests/test_bloom.py)."""
    return F.split(F.lit(",".join(map(str, bits))), ",").cast("array<bigint>")


def bloom_might_contain(
    key: Column | str, bits: list[int], num_bits: int, num_hashes: int = 5
) -> Column:
    """Pure-expression membership probe against a built bitmap: AND
    over the k bit tests, each an element_at + bitwiseAND on a literal
    array<long> — no UDF, stays in codegen. A NULL key probes to NULL
    (so a WHERE drops it, matching semi-join semantics) — this needs
    an explicit isNotNull guard because xxhash64 SKIPS null arguments:
    without it a NULL key would hash to the constant seed-only
    positions and return a real (possibly true) boolean."""
    kc = F.col(key) if isinstance(key, str) else key
    arr = _bits_literal(bits)
    test = F.lit(True)
    for pos in _positions(kc, num_bits, num_hashes):
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        test = test & (word.bitwiseAND(_shl1(pos.cast("int") % 64)) != 0)
    return F.when(kc.isNotNull(), test)


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """EXACT semi-join with Bloom pre-reduction: filter the fact side
    by the dim-key Bloom filter (false positives only, never false
    negatives), then confirm survivors with a real ``left_semi``
    against the distinct dim keys. At scale the exchange moves only
    the pre-filtered rows; the confirm join clears the FP rate
    (~0.01 at the defaults for ≤ 10^5 keys — and ANY rate is safe,
    FPs cost shuffle bytes, not correctness)."""
    bits = build_bloom_bits(dim, key, num_bits, num_hashes)
    pre = fact.where(bloom_might_contain(key, bits, num_bits, num_hashes))
    return pre.join(dim.select(key).distinct(), key, "left_semi")


def bloom_anti_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """EXACT anti-join with Bloom short-circuit:
    ``bloom_anti_join(fact, dim, k) ≡ fact ANTI JOIN dim USING (k)``
    row-for-row. A negative Bloom probe is DEFINITE (no false
    negatives), so probe-miss rows pass the anti-join with no
    exchange at all; only probe-positive rows — selectivity + FP rate
    of the fact — go through a real confirming ``left_anti`` against
    the distinct dim keys, which removes the false positives.

    Scale shape: the fact is scanned twice (once per branch, both
    scans pruned/pushed-down), but the exchange — the expensive part
    at 100 TB — moves only the probe-positive fraction instead of
    every row. A plain ``left_anti`` shuffles 100% of the fact.

    PRECONDITION — deterministic ``fact``: the two branches are
    independent evaluations of the same plan, so a non-deterministic
    input (``df.sample(...)``, keys derived from ``F.rand()`` /
    ``monotonically_increasing_id()``) can land a row in both
    branches (duplicated) or neither (dropped). ``bloom_semi_join``
    references the fact once and has no such precondition. Callers
    with a non-deterministic source must materialize it first
    (``localCheckpoint()`` / write-read) — same contract as Spark's
    own multi-reference patterns (e.g. ``randomSplit`` consumers).

    Column ORDER: output follows the FACT's column order (the
    definite-miss branch is a plain filter). A plain
    ``fact.join(dim, "k", "left_anti")`` instead moves the key column
    first — same columns by NAME, different positions; positional
    consumers switching between the two spellings must select
    explicitly.

    NULL-key rows are KEPT, matching ``left_anti`` semantics (a NULL
    key equals nothing, so it never matches dim): the probe yields
    NULL for a NULL key, and ``~coalesce(probe, FALSE)`` routes it to
    the definite-miss branch. (SQL ``NOT IN`` differs — it DROPS
    NULL-key rows; gate oracles must use columns that are non-null or
    spell out the NULL handling.)"""
    bits = build_bloom_bits(dim, key, num_bits, num_hashes)
    probe = bloom_might_contain(key, bits, num_bits, num_hashes)
    definite_miss = fact.where(~F.coalesce(probe, F.lit(False)))
    confirmed = fact.where(F.coalesce(probe, F.lit(False))).join(
        dim.select(key).distinct(), key, "left_anti"
    )
    return definite_miss.unionByName(confirmed)
