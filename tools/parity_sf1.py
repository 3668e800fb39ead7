"""One-decade-up oracle evidence (r10 verdict task 6, widened twice
in r11): run the check_parity gate at sf1 (the cached 10x corpus,
.scaled/sf1) for the ENTIRE registry — 10 bench headliners + 5 LLM
flagships first (the costliest chunks, isolated), then every
remaining registered gate in chunks of 8 — and record the result as
PARITY_SF1.json. The postings-join near-dup oracles (round 10) made
the dedup twins feasible in DuckDB at this scale; the first widening
(driver window, 64 gates) caught the >2^53 salted-dsum divergence,
which motivated going full-registry.

Run: python tools/parity_sf1.py  → one JSON line + artifact. Gates
     that FAIL on the shared per-chunk wall cap are automatically
     re-run serially, ONE gate per check_parity invocation with a
     generous cap (slow chunks hit the shared cap because eight sf1
     oracles serialize inside one invocation, not because any single
     gate is pathological) — the r11 verdict's "fold the straggler
     retry into the artifact pipeline" task. Every retried gate is
     recorded in the artifact's "retried" list, so provenance lives
     in the artifact itself, not in out-of-repo logs.
     python tools/parity_sf1.py --retry  → the same single-gate
     re-run pass against an EXISTING artifact's FAIL/missing gates,
     patching it in place (for resuming after an interrupted sweep).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HEADLINERS = [
    "asof_join_prev",
    "join_three_way",
    "q3_top_orders",
    "sql_q5_region_revenue",
    "q6_promo_revenue",
    "reduce_by_key_q1",
    "text_stats",
    "window_tumbling",
    "dedup_exact",
    "similarity_topk",
]
LLM_FLAGSHIPS = [
    "dedup_minhash",
    "knn_join_lsh",
    "dedup_corpus_neardup",
    "pack_sequences",
    "similarity_indexed_topk",
]


# One check_parity invocation per chunk: the corpus-wide CC dedup's
# two sides take ~7 min combined at sf1 (Spark 109 s + DuckDB 298 s,
# measured round 11), so a single 15-gate run outlives practical
# watchdog timeouts; chunking also isolates a hang to a named group.
# A per-chunk wall cap (CHUNK_TIMEOUT_S) turns a pathological sf1
# oracle into a named FAIL instead of a stuck sweep.
CHUNK_TIMEOUT_S = 2400


def _registry_chunks() -> list[list[str]]:
    """The ENTIRE registry (window order first, then module order),
    minus the flagship chunks above, in chunks of 8 — the r11
    widening took the sweep from the 64-gate driver window to all
    registered gates (193 as of round 12), so the 10x oracle decade
    covers every gate the sf0.1 artifact covers."""
    import sys as _sys

    _sys.path.insert(0, REPO)
    from shmr_spark.queries import load_all

    seen = set(HEADLINERS) | set(LLM_FLAGSHIPS)
    rest = [n for n in load_all() if n not in seen]
    return [rest[i : i + 8] for i in range(0, len(rest), 8)]


CHUNKS = [
    HEADLINERS,
    ["dedup_corpus_neardup"],
    ["dedup_minhash", "knn_join_lsh", "pack_sequences",
     "similarity_indexed_topk"],
    *_registry_chunks(),
]


RETRY_TIMEOUT_S = 3600


def _run_one(sf1: str, name: str, timeout_s: int) -> list[str]:
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "check_parity.py"),
             sf1, name],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=timeout_s,
        )
        return proc.stdout.splitlines()
    except subprocess.TimeoutExpired:
        return [f"FAIL {name}: single-gate retry exceeded {timeout_s}s wall"]


def _parse_into(gates: dict[str, dict], lines: list[str]) -> None:
    for line in lines:
        m = re.match(r"ok\s+(\S+): (\d+) rows hash-match", line)
        if m:
            gates[m.group(1)] = {
                "rows": int(m.group(2)), "status": "hash-match",
            }
            continue
        m = re.match(r"ok\s+(\S+): rows-only \((\d+) rows\)", line)
        if m:
            gates[m.group(1)] = {
                "rows": int(m.group(2)), "status": "rows-only",
            }
            continue
        m = re.match(r"FAIL (\S+): (.*)", line)
        if m:
            gates[m.group(1)] = {
                "status": "FAIL", "detail": m.group(2)[:300],
            }


def _retry_gates(sf1: str, gates: dict[str, dict], todo: list[str]) -> list[str]:
    """Re-run ``todo`` serially, one check_parity invocation each,
    updating ``gates`` in place. A retry that exits without printing
    any verdict line for its gate (a crash before output, as opposed
    to a timeout, which synthesizes its own FAIL) gets a FRESH FAIL
    entry — never a silently-kept stale detail that would
    misattribute what happened on the retry. Returns ``todo`` (the
    retried names, for the artifact's provenance field)."""
    for i, name in enumerate(todo):
        parsed: dict[str, dict] = {}
        _parse_into(parsed, _run_one(sf1, name, RETRY_TIMEOUT_S))
        if name in parsed:
            gates[name] = parsed[name]
        else:
            gates[name] = {
                "status": "FAIL",
                "detail": "single-gate retry produced no verdict "
                "(exit without output)",
            }
        print(f"[retry] {i + 1}/{len(todo)} {name}: "
              f"{gates[name]['status']}", file=sys.stderr)
    return todo


def _prune_stale(gates: dict[str, dict], registry: list[str]) -> list[str]:
    """Drop artifact entries whose gate is no longer registered
    (renamed/removed since the sweep). Left in place, a stale FAIL
    would join the retry todo, the single-gate re-run would produce
    no verdict for a nonexistent gate, and the artifact would wedge
    in a permanently-failing state no re-run could clear."""
    stale = [n for n in gates if n not in registry]
    for n in stale:
        del gates[n]
    return stale


def retry() -> None:
    """Re-run an existing artifact's FAIL/missing gates and patch
    PARITY_SF1.json in place (resume path; the main sweep now runs
    the same pass automatically). Gates registered AFTER the sweep
    was taken are swept in too, so registry growth between full
    sweeps never leaves the artifact silently short, and entries for
    gates that have LEFT the registry are pruned rather than
    retried into a wedged FAIL."""
    import sys as _sys

    _sys.path.insert(0, REPO)
    from shmr_spark.queries import load_all

    sf1 = os.path.join(REPO, ".scaled", "sf1")
    if not os.path.exists(os.path.join(sf1, "_COMPLETE")):
        raise SystemExit(
            f"sf1 corpus missing at {sf1} — run tools/make_scaled_sf.py"
        )
    path = os.path.join(REPO, "PARITY_SF1.json")
    with open(path) as f:
        result = json.load(f)
    gates = result["gates"]
    registry = list(load_all())
    stale = _prune_stale(gates, registry)
    if stale:
        print(f"[retry] pruned {len(stale)} unregistered gate entries: "
              f"{stale}", file=sys.stderr)
    todo = sorted(
        set(n for n, g in gates.items() if g.get("status") == "FAIL")
        | set(n for n in result.get("missing", []) if n in registry)
        | set(n for n in registry if n not in gates)
    )
    if not todo and not stale:
        print("nothing to retry")
        return
    retried = _retry_gates(sf1, gates, todo) if todo else []
    failures = sum(1 for g in gates.values() if g["status"] == "FAIL")
    missing = [n for n in registry if n not in gates]
    result.update(
        gates_total=len(registry),
        gates=dict(sorted(gates.items())),
        hash_matched=sum(
            1 for g in gates.values() if g["status"] == "hash-match"
        ),
        failures=failures + len(missing),
        missing=missing,
        retried=sorted(
            set(n for n in result.get("retried", []) if n in registry)
            | set(retried)
        ),
    )
    line = json.dumps(result)
    print(line)
    with open(path, "w") as f:
        f.write(line + "\n")
    if result["failures"]:
        sys.exit(1)


def main() -> None:
    sf1 = os.path.join(REPO, ".scaled", "sf1")
    if not os.path.exists(os.path.join(sf1, "_COMPLETE")):
        raise SystemExit(f"sf1 corpus missing at {sf1} — run tools/make_scaled_sf.py")
    names = HEADLINERS + LLM_FLAGSHIPS + [n for c in CHUNKS[3:] for n in c]
    stdout_lines: list[str] = []
    for i, chunk in enumerate(CHUNKS):
        try:
            proc = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "tools", "check_parity.py"),
                 sf1, *chunk],
                capture_output=True,
                text=True,
                cwd=REPO,
                timeout=CHUNK_TIMEOUT_S,
            )
            stdout_lines.extend(proc.stdout.splitlines())
        except subprocess.TimeoutExpired as exc:
            partial = (exc.stdout or b"")
            if isinstance(partial, bytes):
                partial = partial.decode("utf-8", "replace")
            stdout_lines.extend(partial.splitlines())
            # a gate that already printed a verdict (ok OR a real
            # FAIL with its diagnosis) keeps it; only silent gates
            # get the synthesized timeout FAIL
            done = {
                m.group(1)
                for line in partial.splitlines()
                if (m := re.match(r"(?:ok\s+|FAIL )(\S+):", line))
            }
            for n in chunk:
                if n not in done:
                    stdout_lines.append(
                        f"FAIL {n}: chunk {i} exceeded "
                        f"{CHUNK_TIMEOUT_S}s wall"
                    )
        print(f"[parity_sf1] chunk {i + 1}/{len(CHUNKS)} done "
              f"({', '.join(chunk[:3])}...)", file=sys.stderr)
    gates: dict[str, dict] = {}
    for line in stdout_lines:
        m = re.match(r"ok\s+(\S+): (\d+) rows hash-match", line)
        if m:
            gates[m.group(1)] = {"rows": int(m.group(2)), "status": "hash-match"}
            continue
        m = re.match(r"ok\s+(\S+): rows-only \((\d+) rows\)", line)
        if m:
            gates[m.group(1)] = {"rows": int(m.group(2)), "status": "rows-only"}
            continue
        m = re.match(r"FAIL (\S+): (.*)", line)
        if m:
            gates[m.group(1)] = {"status": "FAIL", "detail": m.group(2)[:300]}
    # BUILT-IN straggler retry (r11 verdict task 5): gates that
    # FAILed on the shared per-chunk wall cap (or never printed a
    # verdict) re-run serially, one per invocation — the retried
    # names are recorded so the artifact carries the provenance a
    # hand-patched sweep kept only in /tmp logs
    todo = sorted(
        set(n for n, g in gates.items() if g["status"] == "FAIL")
        | set(n for n in names if n not in gates)
    )
    retried = _retry_gates(sf1, gates, todo) if todo else []
    failures = sum(1 for g in gates.values() if g["status"] == "FAIL")
    missing = [n for n in names if n not in gates]
    result = {
        "metric": "parity_sf1",
        "sf_dir": sf1,
        "gates_total": len(names),
        "hash_matched": sum(
            1 for g in gates.values() if g["status"] == "hash-match"
        ),
        "failures": failures + len(missing),
        "missing": missing,
        "retried": retried,
        "exclusions": [],
        "gates": dict(sorted(gates.items())),
        "note": (
            "FULL registry sweep at sf1 (10x the sf0.1 parity "
            "artifact's scale): 10 bench headliners + 5 LLM flagships "
            "first, then every remaining registered gate in chunks of "
            "8 with a per-chunk wall cap; wall-cap stragglers auto-"
            "retried serially (one gate per invocation, names under "
            "'retried'). The r11 widening from the 64-gate driver "
            "window to the whole registry is what caught the >2^53 "
            "salted-dsum 1-ulp divergence."
        ),
    }
    line = json.dumps(result)
    print(line)
    with open(os.path.join(REPO, "PARITY_SF1.json"), "w") as f:
        f.write(line + "\n")
    if result["failures"]:
        sys.exit(1)


if __name__ == "__main__":
    if "--retry" in sys.argv[1:]:
        retry()
    else:
        main()
