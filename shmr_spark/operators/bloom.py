"""Bloom-filter semi-join / anti-join reduction.

The 100 TB join problem this addresses: a fact table semi-joined
against a dim whose keys should not ride a broadcast hash relation
(memory-tight executors, broadcast-disabled policies), where a plain
``left_semi`` shuffles the ENTIRE fact table on the join key. A
Bloom filter over the dim keys is a fraction of the key set's size
regardless of dim row width, rides the plan as a folded literal, and
pre-filters the fact scan down to (selectivity + false-positive
rate) of its rows BEFORE the exchange — the classic semi-join
reduction. The result is still EXACT: a confirming
``left_semi`` against the real key set removes Bloom false positives,
so ``bloom_semi_join(fact, dim, k) ≡ fact SEMI JOIN dim USING (k)``
row-for-row — which is how the gate query carries a plain IN-subquery
DuckDB oracle. Measured (tools/bench_bloom.py, BLOOM_BENCH.json): at
60M fact rows the reduction keeps 3.7 % of the scan and wins 2.0×
over the plain shuffle semi-join (3.80 → 1.89 s); at 6M the bitmap
build still outweighs the saved exchange (1.15 → 1.58 s) — this is a
big-fact-side operator. ``bloom_anti_join`` is the same reduction
pointed the other way: probe-MISS rows are definite non-matches and
skip the exchange entirely; only the probe-positive fraction is
confirmed. At 60M narrow rows it wins 1.76× (7.61 → 4.32 s), and the
regime the reduction exists for — wide rows, where shuffle bytes are
the cost — pays most: with an 11-column + 128-byte-payload fact at
60M rows, semi 12.96 → 3.29 s (3.9×) and anti 23.25 → 6.23 s (3.7×).

The same A/B also measured the losing regimes, and they bound this
operator on BOTH sides. Below ``AUTO_BROADCAST_MAX_RELATION_BYTES``: a
plain BROADCAST semi/anti join beats both the shuffle join and the
bloom reduction at every scale tried (0.36–2.1 s across three
corpora) — a bloom filter can only approximate the membership test a
broadcast hash relation performs exactly. ABOVE the threshold
(round-10 far-regime pass, 5M-key dim × 30M-row wide fact,
BLOOM_BENCH.json): the auto-sized literal bitmap (2^26 bits) OOMs a
24 GiB driver outright — the folded array literal rides in every
task binary (70–170 MB observed) and 32 concurrent tasks exhaust the
heap — while a cap-feasible bitmap (2^23 bits ≈ 1.7 bits/key) is
saturated (79 % of the fact passes the probe) and LOSES to the plain
shuffle join 1.7–2.3× on wall for an 18 % byte saving. So the
plan-literal bloom has no winning auto regime, and ``mode="auto"``
picks broadcast below the relation-bytes budget and plain shuffle
above it.
(The broadcast arm still won the LOCAL walls at the 5M-key far
point — the threshold is a cluster-byte budget, not a local-wall
crossover: broadcast traffic is relation × executors, 240 MB × N at
5M keys, which loses the byte race to the fixed 2.43 GB shuffle
past ~10 executors and by ~100× at the 1000-executor target.)
Above the threshold, Catalyst's own runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, on in this
build and plan-pinned in tests/test_plans.py) injects a PROPER
bloom reduction on the shuffle join (``bloom_filter_agg`` +
broadcast subquery, not a plan literal) exactly when the join is
selective enough to profit. The explicit ``mode="bloom"`` path remains for what it is
measured to be: a deterministic, testable reduction for
sub-budget-sized dims when broadcasting is disallowed (memory-tight executors,
``autoBroadcastJoinThreshold=-1`` policies) — its 2.0–3.9× wins over
the plain shuffle in that regime are real — and for the gate queries
that pin the bloom plan itself.

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
    "AUTO_BROADCAST_MAX_RELATION_BYTES",
    "build_bloom_bits",
    "bloom_might_contain",
    "bloom_semi_join",
    "bloom_anti_join",
]

# Regime threshold for mode="auto" (A/B-backed, BLOOM_BENCH.json /
# SCALING.md): broadcast semi/anti joins won every measured corpus
# where the dim fit — 370 / 3,700 / 2.5M / 5M keys, narrow and wide
# facts, 6M–60M rows — because a broadcast hash relation answers the
# membership test exactly where the bloom filter only pre-screens it.
# Every LOCAL wall clock (local[32] = one "executor") favors
# broadcast even at 5M keys, so the threshold is NOT a local-wall
# crossover; it is a CLUSTER-BYTE budget: broadcast traffic is
# relation-bytes × executors (every executor holds a full copy, and
# the relation competes with shuffle/execution memory), which loses
# the byte race to the row-linear shuffle past ~budget/relation
# executors and by ~100× at the 1000-executor target. The budget is
# therefore expressed in estimated RELATION BYTES, not keys (the
# round-10 1M-key constant was a proxy that assumed 8-byte keys):
# 48 MiB ≈ 1M long keys as a LongHashedRelation (≈48 B/entry) —
# comfortably inside executor memory on any production profile, 5×
# Spark's own default autoBroadcastJoinThreshold (10 MB, applied to
# byte estimates that routinely undershoot post-distinct key sets),
# and small enough that 1000 executors pull ≤48 GB aggregate.
# Above the budget auto picks the plain shuffle join (Catalyst's
# runtime bloom filter reduces it); the far/mid-regime passes
# measured both that byte reasoning and the literal bitmap's
# infeasibility there. The round-11 MID point (BLOOM_BENCH.json:
# 2.5M long keys ≈ 120 MB est. relation, 2.5× the budget) is the
# first measured LOCAL crossover: the plain shuffle anti-join wall
# already beats broadcast there (3.43 vs 4.49 s) while the semi
# still favors broadcast (2.11 vs 2.99 s) — i.e. the budget sits
# where the local evidence starts to flip, and the cluster byte
# math (120 MB × N executors vs the fixed ~2.4 GB shuffle) breaks
# even at only ~20 executors. Callers on known cluster profiles
# override per call (``broadcast_bytes_budget=``).
AUTO_BROADCAST_MAX_RELATION_BYTES = 48 * 1024 * 1024

# Broadcast-hash-relation cost per entry beyond the key payload
# (UnsafeHashedRelation/LongHashedRelation bookkeeping: ~40 B of
# pointers + row header per entry; a long key lands at the measured
# ≈48 B/entry total).
_HASH_RELATION_ENTRY_OVERHEAD_B = 40

# Fixed on-heap key widths by Spark type; variable-width keys
# (string/binary) are MEASURED (avg octet_length in the same
# estimate pass) or, on the no-job hint path, assumed this default.
_VARIABLE_KEY_WIDTH_DEFAULT_B = 16

# Hard cap on num_bits. The binding constraint is MEASURED, not the
# (comfortably satisfied) ANSI overflow margin: the bitmap is a
# folded array literal that rides in EVERY task binary, and the
# round-10 far-regime pass watched a 2^26-bit bitmap ship 70–170 MB
# task binaries and OOM a 24 GiB driver at 32-way task concurrency
# (BLOOM_BENCH.json far row / BUILD_LOG). 2^23 bits is a ~1 MB word
# array (≈ 20 MB observed binary) — safe — and at ~10 bits/key it
# covers dims up to ~800K keys, which matches the operator's
# measured winning regime (sub-broadcast-threshold dims); anything
# bigger belongs to Catalyst's runtime bloom filter, which
# broadcasts its filter properly instead of inlining it in the plan.
MAX_NUM_BITS = 1 << 23


def _check_num_bits(num_bits: int) -> None:
    """Validates the bitmap size. BREAKING vs rounds ≤ 9: the cap
    tightened 2^27 → 2^23 in round 10 after the far-regime pass
    measured bigger plan-literal bitmaps OOMing executors — callers
    that passed num_bits in (2^23, 2^27] now get this ValueError and
    should either drop to the cap or use mode="shuffle" (Catalyst's
    runtime bloom filter handles big dims with a broadcast filter)."""
    if num_bits & (num_bits - 1):
        raise ValueError(f"num_bits must be a power of two, got {num_bits}")
    if not 64 <= num_bits <= MAX_NUM_BITS:
        raise ValueError(
            f"num_bits must be in [64, 2^23], got {num_bits} — the bitmap "
            "is a plan literal shipped in every task binary (bigger "
            "bitmaps measurably OOM the executors); see MAX_NUM_BITS"
        )


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """Kirsch-Mitzenmacher double hashing: two independent xxhash64
    draws (seeded by a literal second argument — xxhash64 SKIPS null
    args, so the literal also keeps a NULL key from hashing to the
    empty input) combine into k positions.

    Both draws are reduced modulo num_bits BEFORE the i*h2 combine:
    Spark 4 runs ANSI mode by default, where ``i * <full-range int64>``
    raises ARITHMETIC_OVERFLOW instead of wrapping (for a uniform h2
    the chance that all k-1 products fit in int64 is ~1/(k-1)!). After
    the reduction every intermediate is < k * num_bits — and with
    num_bits capped at MAX_NUM_BITS (2^23, enforced by
    _check_num_bits), every position fits an int32 with margin, so
    the downstream word-index and shift-amount int casts can never
    hit an ANSI overflow either. pmod by the power-of-two num_bits
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
    coprimality argument in _positions relies on it) and ≤ MAX_NUM_BITS
    (the overflow/literal-size bound in _check_num_bits)."""
    _check_num_bits(num_bits)
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
    _check_num_bits(num_bits)
    kc = F.col(key) if isinstance(key, str) else key
    arr = _bits_literal(bits)
    test = F.lit(True)
    for pos in _positions(kc, num_bits, num_hashes):
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        test = test & (word.bitwiseAND(_shl1(pos.cast("int") % 64)) != 0)
    return F.when(kc.isNotNull(), test)


def _key_width_bytes(dim: DataFrame, key: str) -> int | None:
    """Fixed per-key byte width from the schema, or None for
    variable-width types (string/binary), which need measurement."""
    from pyspark.sql import types as T

    dt = dim.schema[key].dataType
    fixed = {
        T.ByteType: 1, T.ShortType: 2, T.IntegerType: 4, T.LongType: 8,
        T.FloatType: 4, T.DoubleType: 8, T.BooleanType: 1,
        T.DateType: 4, T.TimestampType: 8, T.TimestampNTZType: 8,
    }
    return fixed.get(type(dt))


def _estimate_keys(dim: DataFrame, key: str) -> tuple[int, int]:
    """(distinct keys, avg key bytes) for mode resolution / bitmap
    sizing: approx_count_distinct (plus avg octet_length for
    variable-width keys) is one partial-agg pass, no shuffle, 1-row
    action — strictly cheaper than the full dim scan + bitmap collect
    a bloom build costs. It IS an eager Spark job at plan-construction
    time (it re-runs the dim's lineage), which the joins document;
    callers composing plans lazily pass ``dim_keys_hint`` instead."""
    if dim.isStreaming:
        raise ValueError(
            "mode='auto' / num_bits=None need a distinct-key estimate, "
            "which runs an eager job — impossible on a streaming "
            "DataFrame; pass dim_keys_hint=, or an explicit mode AND "
            "num_bits"
        )
    width = _key_width_bytes(dim, key)
    aggs = [F.approx_count_distinct(key).alias("__n")]
    if width is None:
        aggs.append(F.avg(F.octet_length(F.col(key))).alias("__w"))
    row = dim.agg(*aggs).first()
    if width is None:
        width = int(row["__w"]) + 1 if row["__w"] is not None else (
            _VARIABLE_KEY_WIDTH_DEFAULT_B
        )
    return int(row["__n"]), width


def _relation_bytes(n_keys: int, key_width_b: int) -> int:
    """Estimated broadcast-hash-relation size for a distinct key set."""
    return n_keys * (key_width_b + _HASH_RELATION_ENTRY_OVERHEAD_B)


def _bits_for_keys(n_keys: int) -> int:
    """Bitmap size for an expected key count: ~10 bits/key (FP ≈ 1%
    at the default k=5), rounded up to a power of two, clamped to
    [64, MAX_NUM_BITS]. Past MAX_NUM_BITS/10 ≈ 800K keys the bits/key
    ratio — and with it the pre-filter's selectivity — decays (the
    result stays EXACT; the confirm join clears any FP rate, so
    saturation costs exchange bytes, never correctness — measured at
    5M keys: 79 % pass rate, slower than the plain shuffle join),
    which is why mode="auto" never routes here above the broadcast
    threshold."""
    target = 10 * max(1, n_keys)
    return max(64, min(MAX_NUM_BITS, 1 << (target - 1).bit_length()))


def _resolve_mode(
    dim: DataFrame,
    key: str,
    mode: str,
    dim_keys_hint: int | None = None,
    bytes_budget: int | None = None,
) -> tuple[str, int | None]:
    """Regime guard for the joins' ``mode="auto"`` default. Both
    sides are A/B-measured (BLOOM_BENCH.json): the broadcast join
    beats the bloom reduction at EVERY scale where the dim fits, and
    ABOVE the key threshold the literal bitmap is OOM-infeasible
    auto-sized / saturated-and-slower-than-plain cap-sized (the
    round-10 far-regime pass). So "auto" estimates the broadcast
    relation's BYTES — distinct keys × (key width + hash-relation
    entry overhead), from the caller's ``dim_keys_hint`` when given
    (schema/default width, no job) else one _estimate_keys job — and
    picks broadcast at or below the bytes budget
    (AUTO_BROADCAST_MAX_RELATION_BYTES unless the caller passed
    ``bytes_budget``), plain shuffle above it — where Catalyst's
    runtime bloom filter performs the reduction with a
    properly-broadcast filter. The literal-bitmap path runs only when
    forced with ``mode="bloom"``. Returns ``(mode, n_keys)`` so the
    caller can reuse the estimate for bitmap sizing instead of
    re-running it."""
    if mode in ("bloom", "broadcast", "shuffle"):
        return mode, dim_keys_hint
    if mode != "auto":
        raise ValueError(
            f"mode must be 'auto', 'bloom', 'broadcast' or 'shuffle', got {mode!r}"
        )
    if dim_keys_hint is not None:
        n_keys = dim_keys_hint
        width = _key_width_bytes(dim, key) or _VARIABLE_KEY_WIDTH_DEFAULT_B
    else:
        n_keys, width = _estimate_keys(dim, key)
    budget = (
        bytes_budget if bytes_budget is not None
        else AUTO_BROADCAST_MAX_RELATION_BYTES
    )
    return (
        "broadcast" if _relation_bytes(n_keys, width) <= budget else "shuffle"
    ), n_keys


def _warn_ignored_num_bits(
    num_bits: int | None, requested_mode: str, resolved_mode: str
) -> None:
    """An explicitly-sized bitmap only exists on the 'bloom' path —
    broadcast/shuffle plans build no bitmap at all. Before round 10,
    auto above the threshold took the bloom path and honored
    num_bits; silently dropping the caller's sizing intent now would
    hide the plan-shape change (r10 ADVICE), so say it out loud.
    Only AUTO resolution warns: a caller who forces
    mode='broadcast'/'shuffle' alongside num_bits made the plan
    choice explicitly."""
    if (
        num_bits is not None
        and requested_mode == "auto"
        and resolved_mode != "bloom"
    ):
        import warnings

        warnings.warn(
            f"num_bits={num_bits} is ignored: mode='auto' resolved to "
            f"{resolved_mode!r}, which builds no literal bitmap — pass "
            "mode='bloom' to force the sized-bitmap reduction",
            stacklevel=3,
        )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    num_bits: int | None = None,
    num_hashes: int = 5,
    mode: str = "auto",
    dim_keys_hint: int | None = None,
    broadcast_bytes_budget: int | None = None,
) -> DataFrame:
    """EXACT semi-join with Bloom pre-reduction: filter the fact side
    by the dim-key Bloom filter (false positives only, never false
    negatives), then confirm survivors with a real ``left_semi``
    against the distinct dim keys. At scale the exchange moves only
    the pre-filtered rows; the confirm join clears the FP rate
    (~0.01 at the defaults for ≤ 10^5 keys — and ANY rate is safe,
    FPs cost shuffle bytes, not correctness).

    ``mode``: "auto" (default) applies the regime guard — a dim whose
    estimated broadcast-relation bytes (distinct keys × key width +
    entry overhead) fit ``broadcast_bytes_budget`` (default
    AUTO_BROADCAST_MAX_RELATION_BYTES) runs the measured-faster
    broadcast semi-join; above it, a plain shuffle semi-join
    (Catalyst's runtime bloom filter supplies the reduction — the
    literal bitmap is measured OOM-or-saturated there,
    _resolve_mode). "bloom"/"broadcast"/"shuffle" force a path
    (the gate query and the plan tests force "bloom" so the reduction
    itself stays verified). Every mode returns the same rows — the
    choice is plan shape, not semantics. NOTE: ``num_bits`` is only
    honored when the resolved mode is "bloom" (the other plans build
    no bitmap); passing it under auto warns when it would be ignored.

    ``num_bits=None`` (default) sizes the bitmap from the dim's
    distinct-key count at ~10 bits/key (_bits_for_keys — FP ≈ 1%;
    a fixed default would be saturated for any dim much bigger than
    its assumption). Effectiveness bound:
    past ~800K keys the MAX_NUM_BITS cap dilutes bits/key and the
    pre-filter passes more non-matches (still exact — FPs cost
    exchange bytes, not correctness).

    CONSTRUCTION COST — ``mode="auto"`` or ``num_bits=None`` needs
    the key count, which runs ONE eager 1-row job (_estimate_keys,
    re-executing the dim's lineage) when this function is CALLED,
    not when the plan runs. Callers composing lazy plans (or using a
    dim with expensive lineage / a streaming dim) pass
    ``dim_keys_hint=`` — then no job runs before the action."""
    requested = mode
    mode, n_keys = _resolve_mode(
        dim, key, mode, dim_keys_hint, broadcast_bytes_budget
    )
    _warn_ignored_num_bits(num_bits, requested, mode)
    keys = dim.select(key).distinct()
    if mode == "broadcast":
        return fact.join(F.broadcast(keys), key, "left_semi")
    if mode == "shuffle":
        # >threshold auto regime: plain shuffle semi-join; Catalyst's
        # runtime bloom filter injects the fact-side reduction when
        # the join is selective (plan-pinned in tests/test_plans.py)
        return fact.join(keys, key, "left_semi")
    if num_bits is None:
        if n_keys is None:
            n_keys, _ = _estimate_keys(dim, key)
        num_bits = _bits_for_keys(n_keys)
    bits = build_bloom_bits(dim, key, num_bits, num_hashes)
    pre = fact.where(bloom_might_contain(key, bits, num_bits, num_hashes))
    return pre.join(keys, key, "left_semi")


def bloom_anti_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    num_bits: int | None = None,
    num_hashes: int = 5,
    mode: str = "auto",
    dim_keys_hint: int | None = None,
    broadcast_bytes_budget: int | None = None,
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
    spell out the NULL handling.)

    ``mode``: "auto" (default) applies the regime guard — a dim whose
    estimated broadcast-relation bytes fit ``broadcast_bytes_budget``
    (default AUTO_BROADCAST_MAX_RELATION_BYTES) runs the
    measured-faster broadcast anti-join; above it, a plain shuffle
    anti-join (see bloom_semi_join — the literal bitmap is measured
    OOM-or-saturated there). Both single-reference plans sidestep the
    two-branch determinism precondition above.
    "bloom"/"broadcast"/"shuffle" force a path. Every mode returns
    the same rows in the FACT's column order — the choice is plan
    shape, not semantics. ``num_bits`` is only honored on the "bloom"
    path (see bloom_semi_join).

    ``num_bits=None`` sizes the bitmap from the key count, and
    ``mode="auto"``/``num_bits=None`` cost one eager 1-row job at
    call time unless ``dim_keys_hint`` is given — see
    bloom_semi_join's docstring for both contracts (identical
    here)."""
    requested = mode
    mode, n_keys = _resolve_mode(
        dim, key, mode, dim_keys_hint, broadcast_bytes_budget
    )
    _warn_ignored_num_bits(num_bits, requested, mode)
    keys = dim.select(key).distinct()
    if mode == "broadcast":
        # a string-`on` join moves the key column first — re-select to
        # keep the documented fact-column-order contract mode-invariant
        return fact.join(F.broadcast(keys), key, "left_anti").select(fact.columns)
    if mode == "shuffle":
        # >threshold auto regime (see bloom_semi_join); single fact
        # reference, so the two-branch determinism precondition below
        # does not apply here either
        return fact.join(keys, key, "left_anti").select(fact.columns)
    if num_bits is None:
        if n_keys is None:
            n_keys, _ = _estimate_keys(dim, key)
        num_bits = _bits_for_keys(n_keys)
    bits = build_bloom_bits(dim, key, num_bits, num_hashes)
    probe = bloom_might_contain(key, bits, num_bits, num_hashes)
    definite_miss = fact.where(~F.coalesce(probe, F.lit(False)))
    confirmed = fact.where(F.coalesce(probe, F.lit(False))).join(
        keys, key, "left_anti"
    )
    return definite_miss.unionByName(confirmed)
