"""Decade-up twin of test_scaling.py (VERDICT r9 task 6): the
round-9 100x shuffle-byte audit re-measured as a standing test
instead of a one-shot artifact that ages.

tools/audit_100x.py measured every headline query between the 10x
corpus (.scaled/sf1) and the derived 100x corpus (.scaled/sf10_100x,
60M lineitem rows) and found a clean split: join-shaped exchanges
are byte-LINEAR in rows (9.88-10.0x for 10x more rows) and
aggregation-shaped exchanges are byte-CONSTANT (partial aggregation
absorbs the row growth inside the scan). This file pins one decade
of that split per shape class with the same [0.5x, 3x]-of-row-ratio
band test_scaling.py uses one decade down — a lost merge pin, an
exploded join, or a dropped map-side combine fails here instead of
surfacing as a 1000-executor cluster bill.

Corpora are built through the SAME builder the audit used
(tools.make_scaled_sf.make_scaled — deterministic key-shifted
replication, ~2 min cold, no-op when cached), so the test re-runs
the round-9 evidence rather than trusting it.
"""

from __future__ import annotations

import os

import pytest

from shmr_spark.metrics import noop_sink, shuffle_bytes_of
from shmr_spark.queries import load_all

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# honor the SHMR_TEST_SF_DIR relocation convention (tests/conftest.py)
# like test_scaling.py: derive the testdata root from the override's
# parent and take its sf0.1 sibling; SPARK_GRAFT_SF_DIR (the bench/
# audit convention) still wins if set explicitly
_ROOT = os.path.dirname(
    os.environ.get("SHMR_TEST_SF_DIR", "/root/testdata/sf0.001").rstrip("/")
)
BASE = os.environ.get("SPARK_GRAFT_SF_DIR", os.path.join(_ROOT, "sf0.1"))
D10 = os.path.join(REPO, ".scaled", "sf1")
D100 = os.path.join(REPO, ".scaled", "sf10_100x")

# heavy: ~18 min of 100x-corpus executions re-deriving the committed
# AUDIT_100X evidence — excluded from the default (driver-window) run,
# mandatory once per round via `pytest -m heavy` (see pytest.ini)
pytestmark = [
    pytest.mark.heavy,
    pytest.mark.skipif(
        not os.path.isdir(BASE), reason=f"needs the sf0.1 corpus at {BASE}"
    ),
]

ROW_RATIO = 10.0  # sf10_100x holds 10x the rows of sf1 in every fact
LO, HI = 0.5 * ROW_RATIO, 3.0 * ROW_RATIO

# the audit's two shape classes, one decade up (AUDIT_100X.json):
# join-shaped exchanges move row-proportional payloads...
# (order_value_deciles and vocab_growth are the round-10 de-funneled
# two-phase scans — measured 10.1x/9.0x at this step;
# missing_id_ranges is the round-11 rank-space rewrite — its
# distinct + range + per-partition-lag exchanges are all linear in
# distinct keys; pinning them here keeps each single-task-window fix
# byte-verified, not just plan-verified)
JOIN_LINEAR = [
    "join_three_way",
    "sql_q5_region_revenue",
    "order_value_deciles",
    "vocab_growth",
    "missing_id_ranges",
    # the r11 corpus-statistical quality tier (functions/lm.py): both
    # exchange distinct (doc, gram) rows — linear in documents. The
    # LM measured 16.8x for 10x rows at this step: above 10x because
    # one local JVM's partial-agg hash tables saturate at 100x and
    # emit partially-uncollapsed runs (on a real cluster per-task
    # input is bounded by maxPartitionBytes, so collapse quality is a
    # partition-size constant, not a corpus-size function) — inside
    # the linear band, nowhere near quadratic
    "lm_perplexity",
    "repetition_metrics",
    # DSIR (functions/dsir.py) is the tier's order-0 member: the
    # exchange is distinct (doc, token) pairs, the token-count
    # relation is broadcast, and the fixed-k selection is TakeOrdered
    # (no sort exchange) — measured 10.9x for 10x rows at this step
    "dsir_select",
    # r12: the NB classifier's exchange is distinct (doc, token)
    # pairs on both splits (the model itself is broadcast) — measured
    # 24.6x for 10x rows: above 10x for the same partial-agg
    # saturation reason as lm_perplexity's 16.8x, inside the band
    "nb_lang_classifier",
    # r12: the binary-margin selector shares the shape (S=2, fixed-k
    # TakeOrdered finish) — measured 17.3x for 10x rows
    "nb_target_select",
    # r12: CCNet terciles — the LM-score exchange (linear) plus one
    # extra upstream pass for the bucket totals (the two-phase rank's
    # documented cost; the third pass was eliminated, 168 -> 100 MB
    # at 10x). Measured 15.6x for 10x rows
    "perplexity_buckets",
    # r12: per-language curriculum shards — the grouped two-phase
    # rank over one compact quality row per doc. Measured 7.08x for
    # 10x rows (mildly sub-linear: the totals/offsets side is
    # group-bounded)
    "curriculum_shards",
]
# ...aggregation-shaped exchanges move group-level payloads — partial
# aggregation collapses the 10x row growth before the exchange, so
# bytes must stay ~flat (measured 1.0x / 1.98x; band <= 3x)
# (corpus_datacard is the r12 member: the datasheet aggregate's
# exchange is one partial-agged row per (source, partition) —
# measured 0.97x at this step)
AGG_CONSTANT = [
    "dedup_exact",
    "reduce_by_key_q1",
    "corpus_datacard",
    # r12 corpus diagnostics: both gates' exchanges are bounded by
    # DISTINCT (source, token) / (gram, source-set) pairs, which the
    # key-shifted replication leaves unchanged — measured 1.05x
    # (source KL; single-scan collect_list shape, 146 KB at 10x) and
    # 1.00x (overlap; the per-gram source-set relation is built once
    # and ReusedExchange-d, so the repeat is byte-identical, 77 MB
    # at 10x) at this step
    "source_unigram_kl",
    "cross_source_overlap",
]
# mixed shape: one side linear in docs, the other a distinct set that
# is CONSTANT on the replicated corpus (13-gram decontamination's
# train gram set — replication adds no new grams). Measured 4.87x for
# 10x rows; the band tops out BELOW linear (8x < ROW_RATIO) so the
# failure it documents can actually fire: at or past linear means the
# distinct collapse before the join was lost (the exchange would then
# carry gram instances), and quadratic means pair enumeration
MIXED_SUBLINEAR = ["ngram_decontamination"]
MIXED_HI = 8.0


@pytest.fixture(scope="module")
def corpora(spark):
    from tools.make_scaled_sf import make_scaled

    make_scaled(spark, 10, BASE, D10)
    make_scaled(spark, 100, BASE, D100)
    return D10, D100


def _ratio(spark, name, corpora):
    # ONE execution per scale: shuffle BYTES are plan-determined, not
    # warmth-determined — measured r13 on the four heaviest members
    # (lm_perplexity, ngram_decontamination, perplexity_buckets,
    # join_three_way at both scales): cold and warm byte counts are
    # identical in all 8 cases, and the former warm-then-measure
    # order both doubled the sweep's wall and once put the MEASURED
    # pass on a GC-degraded second run (lm_perplexity@100x: 29 s
    # cold, 412 s for the repeat in one session). Wall-time tests
    # warm; byte tests don't need to.
    d10, d100 = corpora
    spec = load_all()[name]
    measured = {}
    for d in (d10, d100):
        measured[d] = shuffle_bytes_of(spark, lambda: noop_sink(spec.fn(spark, d)))
    small, big = measured[d10], measured[d100]
    assert small["write"] > 0, (
        f"{name} moved no shuffle bytes at 10x — plan stopped shuffling "
        "(swap the query out) or the status-store instrument broke"
    )
    return big["write"] / small["write"]


@pytest.mark.parametrize("name", JOIN_LINEAR)
def test_join_exchanges_stay_byte_linear_at_100x(spark, name, corpora):
    ratio = _ratio(spark, name, corpora)
    assert LO <= ratio <= HI, (
        f"{name}: 10x->100x shuffle-write ratio {ratio:.2f}x for "
        f"{ROW_RATIO:.0f}x rows (band [{LO:.0f}x, {HI:.0f}x]; audit "
        "measured 9.97x). Superlinear = diff the executed join "
        "strategies per SCALING.md before treating as a regression"
    )


@pytest.mark.parametrize("name", AGG_CONSTANT)
def test_agg_exchanges_stay_byte_constant_at_100x(spark, name, corpora):
    ratio = _ratio(spark, name, corpora)
    assert ratio <= 3.0, (
        f"{name}: 10x->100x shuffle-write ratio {ratio:.2f}x — the "
        "partial (map-side) aggregation stopped absorbing row growth "
        "before the exchange (audit measured 1.0x/1.98x)"
    )


def test_indexed_ann_probe_and_build_exchanges_at_100x(spark, corpora):
    """The persistent-IVF ANN path (similarity_indexed_topk +
    similarity/index.py), at a PINNED cache state (r11 verdict task
    4 — the audit's 10x/100x rows were previously taken warm/cold
    and the ratio came out null):

    - the WARM probe (index built, one throwaway probe first) moves
      ZERO shuffle bytes at BOTH scales — centroid resolution is a
      k-row driver collect, the corpus scan is partition-pruned, and
      top-k is TakeOrdered; nothing exchanges, at any corpus size;
    - the index BUILD's exchange is byte-CONSTANT (measured 237 KB at
      10x vs 233 KB at 100x): it carries k-means partial aggregates
      (per-partition k×dim sums), and the partitionBy write itself
      never shuffles — so the one corpus-sized data movement in the
      whole path is the storage write, which is scan-shaped."""
    import shutil
    import tempfile

    from shmr_spark.catalog import load_table
    from shmr_spark.similarity import build_ivf_index

    d10, d100 = corpora
    spec = load_all()["similarity_indexed_topk"]
    build = {}
    for d in (d10, d100):
        noop_sink(spec.fn(spark, d))  # warm: build index + one probe
        probe = shuffle_bytes_of(spark, lambda: noop_sink(spec.fn(spark, d)))
        assert probe["write"] == 0, (
            f"warm indexed probe at {d} wrote {probe['write']} shuffle "
            "bytes — the storage-pruned plan started exchanging"
        )
        emb = load_table(spark, d, "embeddings")
        tmp = tempfile.mkdtemp(prefix="shmr_ivf_100x_")
        try:
            build[d] = shuffle_bytes_of(
                spark, lambda: build_ivf_index(emb, tmp, n_cells=8, kmeans_iters=2)
            )["write"]
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    assert build[d10] > 0, "index build moved no shuffle bytes at 10x"
    ratio = build[d100] / build[d10]
    assert ratio <= 3.0, (
        f"IVF build exchange ratio {ratio:.2f}x at 10x->100x — the "
        "k-means partial aggregation stopped absorbing row growth "
        "(measured ~1.0x: the exchange is per-partition k×dim sums)"
    )


@pytest.mark.parametrize("name", MIXED_SUBLINEAR)
def test_mixed_exchanges_stay_sublinear_at_100x(spark, name, corpora):
    ratio = _ratio(spark, name, corpora)
    assert ratio <= MIXED_HI, (
        f"{name}: 10x->100x shuffle-write ratio {ratio:.2f}x for "
        f"{ROW_RATIO:.0f}x rows (measured 4.87x; band {MIXED_HI:.0f}x, "
        "below linear on purpose) — reaching linear means the "
        "distinct-set collapse before the join was lost; past it, "
        "pair enumeration"
    )
