"""Unit tests for the sf1 parity sweep's retry plumbing
(tools/parity_sf1.py) — pure parsing/bookkeeping, no Spark session.

The round-12 advice finding: a single-gate retry that crashes before
printing any verdict used to leave the gate's PREVIOUS entry in
place, so the artifact kept a stale detail (e.g. "chunk N exceeded
wall") that misattributed what actually happened on the retry. The
fallback now writes a fresh FAIL naming the no-verdict exit.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from tools import parity_sf1  # noqa: E402


def test_parse_into_recognizes_all_verdict_forms():
    gates: dict[str, dict] = {}
    parity_sf1._parse_into(
        gates,
        [
            "ok   alpha: 123 rows hash-match",
            "ok   beta: rows-only (7 rows)",
            "FAIL gamma: first differing row ...",
        ],
    )
    assert gates["alpha"] == {"rows": 123, "status": "hash-match"}
    assert gates["beta"] == {"rows": 7, "status": "rows-only"}
    assert gates["gamma"]["status"] == "FAIL"


def test_retry_overwrites_with_fresh_verdict(monkeypatch):
    gates = {
        "alpha": {"status": "FAIL", "detail": "chunk 3 exceeded 2400s wall"},
    }
    monkeypatch.setattr(
        parity_sf1,
        "_run_one",
        lambda sf1, name, t: [f"ok   {name}: 55 rows hash-match"],
    )
    retried = parity_sf1._retry_gates("/nonexistent", gates, ["alpha"])
    assert retried == ["alpha"]
    assert gates["alpha"] == {"rows": 55, "status": "hash-match"}


def test_retry_no_verdict_writes_fresh_fail(monkeypatch):
    """A retry that exits silently must NOT keep the stale chunk-
    timeout detail — the artifact records what the retry actually
    did (nothing)."""
    stale = {"status": "FAIL", "detail": "chunk 9 exceeded 2400s wall"}
    gates = {"alpha": dict(stale)}
    monkeypatch.setattr(
        parity_sf1, "_run_one", lambda sf1, name, t: []
    )
    parity_sf1._retry_gates("/nonexistent", gates, ["alpha"])
    assert gates["alpha"]["status"] == "FAIL"
    assert "no verdict" in gates["alpha"]["detail"]
    assert "chunk 9" not in gates["alpha"]["detail"]


def test_retry_timeout_keeps_synthesized_fail(monkeypatch):
    """_run_one's own timeout path synthesizes a FAIL line — the
    retry records that, not the previous entry."""
    gates = {"alpha": {"status": "FAIL", "detail": "chunk 1 exceeded"}}
    monkeypatch.setattr(
        parity_sf1,
        "_run_one",
        lambda sf1, name, t: [
            f"FAIL {name}: single-gate retry exceeded {t}s wall"
        ],
    )
    parity_sf1._retry_gates("/nonexistent", gates, ["alpha"])
    assert "single-gate retry exceeded" in gates["alpha"]["detail"]


def test_prune_stale_drops_unregistered_entries():
    """A renamed/removed gate's artifact entry must be pruned, not
    retried — a retry of a nonexistent gate can never produce a
    verdict, so a stale FAIL would wedge the artifact permanently
    (r12 review finding)."""
    gates = {
        "alpha": {"status": "hash-match", "rows": 3},
        "renamed_away": {"status": "FAIL", "detail": "chunk 2 exceeded"},
        "beta": {"status": "rows-only", "rows": 9},
    }
    stale = parity_sf1._prune_stale(gates, ["alpha", "beta", "gamma"])
    assert stale == ["renamed_away"]
    assert set(gates) == {"alpha", "beta"}
