"""The composed training-data flow, end to end, as ONE query:

    clean/normalize → quality + token annotate → language/quality +
    repetition filter → exact dedup → MinHash near-dup cluster dedup →
    token-budget select → sequence pack → sorted-shard assignment

Each stage is the production operator the registry gates individually
(dedup/exact.py, dedup/minhash.py, dedup/clusters.py,
operators/selection.py, operators/packing.py, operators/ranking.py);
this module composes them into the one flow a real corpus build runs,
so the bench can time it end-to-end at scale and the tests can assert
the cross-stage invariant chain (counts only shrink, survivors are
near-dup-free, packing conserves tokens, shards are balanced). The
composition introduces no new shuffles; its only driver-side action
is one bounded aggregate over the persisted survivor projection (the
token total and max doc id that size the pack/shard bucket widths —
round 11 folded both into the one action; round 12 folded the
quality-mode selection's per-bucket token totals into it too, so the
budget cut's offsets ride the plan as a driver-built local relation
instead of two extra per-action passes; round 13 gave the DSIR-mode
auto-scaled cut the same treatment via a two-step action — min/max
first, bucket totals grouped by the literal affine map second) —
taken at the same materialization point a production build writes to
storage.
"""

from __future__ import annotations

import threading
import warnings

from py4j.protocol import Py4JError
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shmr_spark.catalog import load_table
from shmr_spark.dedup import minhash_near_duplicates
from shmr_spark.dedup.clusters import dedup_keep_cluster_representative
from shmr_spark.dedup.exact import dedup_exact_keep_first
from shmr_spark.functions.text import quality_score, token_count, tokens
from shmr_spark.operators.packing import pack_sequences
from shmr_spark.operators.ranking import range_shards
from shmr_spark.operators.selection import (
    auto_scaled_bucket,
    score_bucket,
    select_by_token_fraction_from_totals,
)

# Survivor caches from previous invocations, keyed by (session,
# corpus, params) and REPLACED when the same invocation repeats (the
# bench loop re-runs identical args in one session; without eviction
# each repetition would leak a corpus-sized cache). Replacement is
# PLAN-AWARE: Spark caches by canonicalized plan, so a same-args
# repeat's frames alias the previous entries — those are retained
# (unpersisting the old handle would drop the shared entry), and
# only frames whose plan left the slot (a mode-specific frame like
# the DSIR ranking) are actually unpersisted. Keying by the
# full argument tuple means two concurrent pipelines over different
# corpora/configs each keep their own live cache — call-order
# clobbering (the round-5 advice finding) needed only ONE global
# slot to go wrong. The residual hazard is two CONCURRENT calls with
# identical arguments: the second evicts the first's cache and the
# first recomputes (a perf hit, never wrong results) — repeated
# identical invocations are assumed sequential, which is the bench's
# actual pattern.
_cache_slots: dict[tuple, tuple[DataFrame, ...]] = {}
_cache_lock = threading.Lock()


def clear_pipeline_caches() -> int:
    """Unpersist and drop every cached survivor frame. Slots are only
    replaced on same-args re-invocation, so a caller that sweeps
    DIFFERENT configs/corpora in one session (the bench's base→10×
    alternation) accumulates one corpus-sized MEMORY_AND_DISK cache
    per distinct slot until it calls this between phases. Returns the
    number of caches released."""
    with _cache_lock:
        dropped = list(_cache_slots.values())
        _cache_slots.clear()
    for slot_dfs in dropped:
        for df in slot_dfs:
            try:
                df.unpersist()
            except Exception:
                pass  # slot's session already stopped
    return len(dropped)


def training_pipeline(
    spark: SparkSession,
    sf_dir: str,
    budget_fraction: float = 0.5,
    neardup_threshold: float = 0.8,
    pack_budget: int = 2048,
    n_shards: int = 16,
    dsir_target=None,
    dsir_hash_buckets: int | None = None,
    dsir_ngrams: int = 1,
) -> DataFrame:
    """Run the full flow over ``sf_dir``'s documents table; returns
    the final shard table (doc_id, quality, n_tokens, start_tok,
    pack_id, shard_id).

    ``budget_fraction`` sizes the token-budget cut relative to the
    surviving corpus's token mass, so the pipeline is scale-free: no
    absolute constant goes stale when the corpus grows 10×. The cut
    needs the total (one extra pass over the survivors), so the
    deduped projection is PERSISTED first — the production shape: the
    output of an expensive dedup stage is always materialized (there,
    written to storage; here, MEMORY_AND_DISK) before fan-out to
    selection + stats, never recomputed per consumer.

    ``dsir_target`` (optional boolean Column over the documents
    columns, e.g. ``F.col("lang") == "en"``) switches the selection
    stage's ranking from the per-row quality heuristic to the DSIR
    importance log-weight toward that target domain
    (functions/dsir.py), length-normalized to the per-token mean —
    same greedy token-fraction cut, different order. Opt-in because
    it adds the DSIR scoring pass (one
    (doc, token) partial-aggregated explode + a broadcast-sized
    count relation) over the persisted exact-dedup frame.

    ``dsir_hash_buckets`` / ``dsir_ngrams`` select the hashed
    bounded-feature estimator (the production configuration for raw
    web-scale corpora, where the count relation must be ≤B rows by
    construction rather than Heaps-bounded) and the paper's
    unigram+bigram feature set; both pass straight through to
    ``dsir_logweights``. The per-token mean stays the ranking score
    in every mode — n_tokens counts tokens regardless of feature
    space.
    """
    docs = load_table(spark, sf_dir, "documents")

    cleaned = (
        docs.select(
            "doc_id",
            "lang",
            F.trim(F.regexp_replace(F.lower("text"), " +", " ")).alias("text"),
        )
        .withColumn("quality", quality_score("text"))
        .withColumn("n_tokens", token_count("text").cast("long"))
        # Gopher-style repetition gate, in its IN-SCAN form: the
        # duplicate-token fraction as a native array expression — zero
        # shuffles, unlike the full per-gram explode operator
        # (functions/lm.py repetition_metrics), which is the right
        # shape only when the per-gram counts themselves are wanted.
        # Threshold 0.7 ≈ the corpus p95 (sf0.1: p50 0.536, p95
        # 0.697, max 0.731) — cuts the most-degenerate ~5% tail.
        .withColumn(
            "dup_token_frac",
            1
            - F.size(F.array_distinct(tokens("text"))).cast("double")
            / F.size(tokens("text")).cast("double"),
        )
    )

    kept = cleaned.filter(
        (F.col("quality") > 0.5)
        & (F.col("n_tokens") >= 5)
        & (F.col("dup_token_frac") <= 0.7)
    )

    from pyspark import StorageLevel

    # The exact-dedup output has TWO consumers (minhash banding and
    # the cluster-representative join), each of which would otherwise
    # recompute clean→annotate→filter→dedup from the scan. Persist it
    # — the same "materialize after an expensive dedup stage" shape as
    # the survivor projection below (in production, a write to
    # storage). Measured at sf0.1: 8.10 → 7.21 s end-to-end (round
    # 11). Tracked in the cache slot so eviction follows the slot's
    # plan-aware replacement rule below.
    exact = dedup_exact_keep_first(kept, "text", "doc_id").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pairs = minhash_near_duplicates(exact, threshold=neardup_threshold)
    surv = dedup_keep_cluster_representative(exact, pairs)

    slot = (
        # applicationId, not id(spark): CPython can reuse an id()
        # after a stopped session is collected, aliasing a dead
        # session's slot; the app id is stable and unique per app
        # (and persistence is context-level, so two sessions on one
        # context sharing a slot is correct, not a collision).
        spark.sparkContext.applicationId,
        sf_dir,
        budget_fraction,
        neardup_threshold,
        pack_budget,
        n_shards,
        # NOT keyed by dsir_target: Spark's CacheManager keys cached
        # data by canonicalized PLAN, and exact/scored have identical
        # plans in both modes — mode-separate slots would hold
        # handles to the one shared cache entry, so evicting either
        # slot would drop the other mode's live cache out from under
        # it. One slot per (corpus, params); an alternating
        # quality/DSIR sweep replaces it per call (recompute, never
        # wrong results), same as any other changed-config sweep.
    )
    scored = surv.select("doc_id", "quality", "n_tokens").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if dsir_target is not None:
        from shmr_spark.functions.dsir import dsir_logweights

        # Score the PERSISTED exact-dedup frame (the last point with
        # text that is materialized — scoring surv would recompute
        # the whole minhash banding lineage); the join onto scored
        # restricts weights to the near-dup survivors, and estimating
        # the target/raw distributions over the exact-deduped pool is
        # the paper's setting (DSIR runs pre-selection, not
        # post-near-dup). Two selection-specific constraints
        # (code-review findings, round 11):
        # - the cut ranks by the PER-TOKEN mean log-weight, not the
        #   raw sum: the sum grows with document length (unbounded
        #   either sign), while the mean is bounded by
        #   max |per-token term| ≤ ln(corpus_tokens + V) — ~32 at
        #   10¹⁴ tokens (and the length-debiased ranking is what a
        #   budget cut wants anyway: the raw sum double-counts
        #   length, which the token-budget cut already charges for).
        #   The score is bucketed AUTO-SCALED (round-12 advice
        #   finding): dsir_score concentrates near 0 (|score| < 0.23
        #   measured at sf0.1), so a static floor(score·K) against
        #   the ±32 worst-case bound populated only a handful of
        #   buckets and the per-bucket cumulative window ran large
        #   corpus fractions in single tasks. The affine map from the
        #   observed min/max into [0, 1024) buckets keeps the
        #   populated-bucket count tracking the observed spread at
        #   any corpus size while the offsets relation stays ≤ 1024
        #   rows (output unchanged — the prefix sum is exact under
        #   any order-preserving bucketing, asserted in tests);
        # - the ranked frame is PERSISTED before the cut: the
        #   pack/quality joins re-reference the selection, so an
        #   unpersisted DSIR lineage would re-run the (doc, token)
        #   explode + aggregations several times per action. It joins
        #   the cache slot below so eviction tracks it.
        ranked = (
            scored.join(
                dsir_logweights(
                    exact,
                    dsir_target,
                    hash_buckets=dsir_hash_buckets,
                    ngrams=dsir_ngrams,
                ).select(
                    "doc_id",
                    (F.col("logweight") / F.col("n_tokens")).alias(
                        "dsir_score"
                    ),
                ),
                "doc_id",
            ).persist(StorageLevel.MEMORY_AND_DISK)
        )
        # DSIR-mode selection is built AFTER the survivor-stats
        # action below (optimization round 13, the quality-mode r12
        # fold's twin): the auto-scaled cut's min/max, bucket offsets
        # and token total all become driver-side literals via a
        # two-step action instead of in-plan sub-plans re-executed by
        # every downstream action.
        sel = None
        slot_frames = (exact, scored, ranked)
    else:
        # Quality-mode selection is built AFTER the survivor-stats
        # action below, which also collects the per-bucket token
        # totals its cut needs (r12 optimization: the in-plan
        # offsets/total sub-plans re-executed per action).
        sel = None
        slot_frames = (exact, scored)

    # pop+insert under ONE lock hold: a pop-then-reacquire window
    # would let two identical concurrent calls interleave so the
    # second's insert overwrites (and orphans, never unpersisting)
    # the first's entry
    with _cache_lock:
        prev = _cache_slots.pop(slot, None)
        _cache_slots[slot] = slot_frames
    if prev is not None:
        # PLAN-AWARE eviction (round-11 review finding): Spark's
        # CacheManager keys cached data by canonicalized plan, so on
        # a same-args repeat the new persist() calls were no-ops
        # against the PREVIOUS call's live entries — unpersisting the
        # old handles here would drop the shared entry out from under
        # the frames just "persisted" above, running the repeat fully
        # uncached. Only evict prev frames whose plan is NOT among
        # the new slot's (e.g. a previous DSIR ranked frame for a
        # different target, which is not part of the slot key).
        def _same_plan(a: DataFrame, b: DataFrame) -> bool:
            # Fails OPEN to retention (round-12 advice finding): a
            # reflection failure here must degrade to a cache leak
            # (skip the unpersist, keep the previous entry alive),
            # never to silently dropping a shared cache entry out
            # from under the frames persisted above — which is the
            # exact defect this plan comparison exists to prevent.
            # Only the expected Py4J/attribute errors are swallowed
            # (and warned about); anything else propagates.
            try:
                return bool(
                    a._jdf.queryExecution()
                    .analyzed()
                    .sameResult(b._jdf.queryExecution().analyzed())
                )
            except (Py4JError, AttributeError) as exc:
                warnings.warn(
                    "training_pipeline: plan comparison failed "
                    f"({exc!r}); retaining the previous slot's cache "
                    "entry (fail-open — a leak, not an uncached "
                    "repeat)",
                    RuntimeWarning,
                    stacklevel=2,
                )
                return True

        for df in prev:
            if any(_same_plan(df, nf) for nf in slot_frames):
                continue
            try:
                df.unpersist()
            except Exception:
                # best-effort: the previous slot's session may already
                # be stopped; its JVM-side cache died with it
                pass

    # Explicit buckets for BOTH two-phase scans below: their default
    # in-plan min/max (ranking._auto_bucketed) would add one
    # action-time pass over the selection→packing segment EACH just
    # to size the cells. Both key ranges are known up front — doc_id
    # ≤ max(doc_id) over the survivors, start_tok < fraction·total —
    # so fixed-width coarsenings derive from ONE cheap aggregate over
    # the already-persisted survivors: the expensive segment executes
    # exactly once per action, and both bucket counts stay ≤ ~4096 at
    # any corpus size. (Survivor doc_ids/token totals are dense,
    # non-outlier domains, so fixed-width cells cannot collapse —
    # the skew caveat on prefix_sum's bucket contract.)
    if dsir_target is not None:
        # DSIR mode folds the auto-scaled selection cut into TWO
        # bounded driver actions over the persisted ranked frame
        # (optimization round 13; the r12 quality-mode fold could not
        # cover this because the bucketing needs the score min/max
        # before the totals can be grouped):
        #   1. min/max of dsir_score + the survivor stats (ranked has
        #      exactly the survivor doc set — dsir_logweights emits
        #      every document of its input once and the join keys the
        #      scored projection — so sum(n_tokens)/max(doc_id) here
        #      equal the scored-frame aggregate they replace);
        #   2. per-bucket token totals grouped by the LITERAL affine
        #      bucket map (auto_scaled_bucket — bit-identical floors
        #      to the in-plan broadcast min/max form, see its
        #      docstring), ≤1024 rows collected.
        # select_by_token_fraction_from_totals then derives the
        # offsets as a driver-built local relation and the cut as a
        # literal integer budget (the decimal arithmetic replicated
        # digit-for-digit, asserted in tests), so downstream actions
        # stop re-executing the min/max aggregate, the offsets
        # groupBy+single-partition-window and the total-token
        # aggregate that the in-plan auto-scaled cut re-inlined at
        # every reference.
        stats = ranked.agg(
            F.min("dsir_score").alias("lo"),
            F.max("dsir_score").alias("hi"),
            F.sum("n_tokens").alias("t"),
            F.max("doc_id").alias("m"),
        ).collect()[0]
        total_tokens = stats["t"] or 0
        max_doc_id = stats["m"] or 0
        dsir_bucket = auto_scaled_bucket(
            "dsir_score", stats["lo"], stats["hi"], 1024
        )
        bucket_rows = (
            ranked.groupBy(dsir_bucket.alias("__bucket"))
            .agg(F.sum("n_tokens").alias("__btot"))
            .collect()
        )
        sel = (
            select_by_token_fraction_from_totals(
                ranked,
                [(r["__bucket"], r["__btot"]) for r in bucket_rows],
                fraction=budget_fraction,
                score_col="dsir_score",
                score_buckets=1024,
                bucket_expr=dsir_bucket,
            )
            .join(scored.select("doc_id", "quality"), "doc_id")
            # lazily checkpoint the DSIR selection (r13; the
            # perplexity_buckets lesson): persist() substitutes the
            # cache at EXECUTION, but Catalyst still re-analyzes the
            # full dsir_logweights lineage under every downstream
            # reference (pack join, quality re-attach, shard ranking)
            # on every action — the DSIR pipeline plan was 583
            # Exchange / 7156 lines vs quality mode's 124/2130, all
            # driver-side analysis cost. The checkpoint truncates the
            # logical plan at the selection boundary; rows identical
            # (asserted against the unchanged quality/DSIR invariant
            # tests). Quality mode stays un-checkpointed: its
            # selection sub-plan is cheap (r12 measured the persist
            # variant neutral) and its plan is already an order of
            # magnitude smaller.
            .localCheckpoint(eager=False)
        )
    else:
        # Quality mode folds the selection's bucket-offset relation
        # into this SAME action (optimization round 12): grouping the
        # survivor stats by the selection's exact score-bucket
        # expression yields the per-bucket token totals (≤1001 rows
        # collected — bounded at any corpus size), from which
        # select_by_token_fraction_from_totals derives the offsets as
        # a driver-built local relation and the cut as a literal
        # integer budget. Every subsequent action over the pipeline
        # output then skips the two extra passes over the persisted
        # survivors (the offsets groupBy+window and the total-token
        # aggregate) that the in-plan fraction cut re-executed each
        # time. Output is bit-identical (the decimal cut arithmetic
        # is replicated digit-for-digit; asserted in tests). DSIR
        # mode keeps the in-plan auto-scaled cut: its bucketing
        # depends on an in-plan min/max that cannot join this action
        # without adding a second one.
        bucket_rows = (
            scored.groupBy(
                score_bucket("quality", 1000).alias("__bucket")
            )
            .agg(
                F.sum("n_tokens").alias("__btot"),
                F.max("doc_id").alias("__bmax"),
            )
            .collect()
        )
        total_tokens = sum(int(r["__btot"]) for r in bucket_rows)
        max_doc_id = max(
            (int(r["__bmax"]) for r in bucket_rows), default=0
        )
        sel = select_by_token_fraction_from_totals(
            scored,
            [(r["__bucket"], r["__btot"]) for r in bucket_rows],
            fraction=budget_fraction,
        )
    id_width = max(1, int(max_doc_id) // 4096 + 1)
    doc_bucket = F.floor(F.col("doc_id") / F.lit(id_width)).cast("long")

    packed = pack_sequences(
        sel.select("doc_id", "n_tokens"), budget=pack_budget,
        bucket=doc_bucket,
    ).join(sel.select("doc_id", "quality"), "doc_id")

    width = max(1, int(total_tokens * budget_fraction) // 4096 + 1)
    shard_bucket = F.floor(F.col("start_tok") / F.lit(width)).cast("long")

    return range_shards(
        packed,
        key_col="start_tok",
        id_col="doc_id",
        n_shards=n_shards,
        bucket=shard_bucket,
    )
