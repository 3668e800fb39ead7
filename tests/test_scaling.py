"""Shuffle-byte linearity regression net (VERDICT r8 task 5).

SCALING.md's reading rule — shuffle bytes should grow ~linearly with
input rows; a superlinear ratio means "diff the executed join
strategies first" — was judge/builder lore until this file. Here it
is a standing test: three headline-class queries with measured,
stable ~10x byte ratios between sf0.001 and sf0.01 (10x rows in
every fact table) are pinned to a band of [0.5x, 3x] of the row
ratio. A plan change that starts moving superlinear bytes (a lost
broadcast, an exploded join, a dropped partial aggregation) fails
here at test time instead of surfacing as a 100 TB cluster bill.

Query selection (probed, round 9): queries whose exchanges carry
row-proportional payloads —
  join_three_way         9.2x   (fact-fact-dim join exchanges)
  sql_q5_region_revenue  9.3x   (6-table join + agg)
  sessionize             9.8x   (event-time window repartition)
Deliberately NOT pinned: queries whose shuffles carry group-level or
constant-size payloads (reduce_by_key_q1, text_stats, topk_per_group
measure ~1.0x — partial aggregation absorbs the row growth before
the exchange, which is the *desired* sublinear case and would make a
linearity band vacuous) and regime-boundary crossers (q3_top_orders
legitimately jumps when AQE stops broadcasting a grown side —
allowlisted story in SCALING.md, not a per-commit invariant at these
tiny scales where it measures ~5.5x anyway).
"""

from __future__ import annotations

import os

import pytest

from shmr_spark.metrics import noop_sink, shuffle_bytes_of
from shmr_spark.queries import load_all

# honor the SHMR_TEST_SF_DIR relocation convention (tests/conftest.py):
# this test needs TWO scale factors, so it derives the testdata root
# from the override's parent and skips if the sibling is absent
_ROOT = os.path.dirname(
    os.environ.get("SHMR_TEST_SF_DIR", "/root/testdata/sf0.001").rstrip("/")
)
SMALL = os.path.join(_ROOT, "sf0.001")
BIG = os.path.join(_ROOT, "sf0.01")

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(SMALL) and os.path.isdir(BIG)),
    reason=f"needs both {SMALL} and {BIG}",
)
ROW_RATIO = 10.0  # every fact table is 10x rows between the two SFs

# byte-ratio band: [0.5x, 3x] of the row ratio (the VERDICT-specified
# tolerance). Below 5x = the exchange stopped scaling with rows —
# fine in itself but means the query no longer guards linearity and
# should be swapped out; above 30x = superlinear bytes, the 100 TB
# red flag this test exists for.
LO, HI = 0.5 * ROW_RATIO, 3.0 * ROW_RATIO

PINNED = ["join_three_way", "sql_q5_region_revenue", "sessionize"]


@pytest.mark.parametrize("name", PINNED)
def test_shuffle_bytes_scale_linearly(spark, name):
    spec = load_all()[name]
    measured = {}
    for d in (SMALL, BIG):
        # warm pass: parquet footer reads and codegen compilation
        # schedule jobs whose (zero-shuffle) noise would land inside
        # the bracketed measurement on first touch
        noop_sink(spec.fn(spark, d))
        measured[d] = shuffle_bytes_of(spark, lambda: noop_sink(spec.fn(spark, d)))
    small, big = measured[SMALL], measured[BIG]
    assert small["write"] > 0, (
        f"{name} moved no shuffle bytes at sf0.001 — either the plan "
        "stopped shuffling (re-probe and swap the query out of PINNED) "
        "or the status-store instrument broke"
    )
    ratio = big["write"] / small["write"]
    assert LO <= ratio <= HI, (
        f"{name}: shuffle-write ratio {ratio:.2f}x for {ROW_RATIO:.0f}x rows "
        f"(band [{LO:.0f}x, {HI:.0f}x]; base {small['write']}B -> "
        f"{big['write']}B). Superlinear = diff the executed join "
        "strategies (broadcast->shuffle regime boundary?) per SCALING.md "
        "before treating as a regression; sublinear = the exchange no "
        "longer carries row-proportional payload, swap in a query that does"
    )
