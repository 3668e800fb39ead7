"""Full-registry parity sweep → artifact: run check_parity for every
gate at a given sf dir and record the per-gate outcome as a JSON
artifact (the PARITY_SF01.json format).

Run: python tools/parity_sweep.py [sf_dir] [artifact_path]
Defaults: /root/testdata/sf0.1 → PARITY_SF01.json
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sweep(sf_dir: str, artifact: str, note: str) -> int:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_parity.py"), sf_dir],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    gates: dict[str, dict] = {}
    failures = 0
    for line in proc.stdout.splitlines():
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
            failures += 1
    result = {
        "metric": "parity_sweep",
        "sf_dir": sf_dir,
        "gates_total": len(gates),
        "hash_matched": sum(
            1 for g in gates.values() if g["status"] == "hash-match"
        ),
        "failures": failures,
        "exclusions": [],
        "note": note,
        "gates": dict(sorted(gates.items())),
    }
    with open(artifact, "w") as f:
        f.write(json.dumps(result) + "\n")
    print(
        f"{result['hash_matched']}/{result['gates_total']} hash-matched, "
        f"{failures} failures -> {artifact}"
    )
    return failures


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    artifact = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "PARITY_SF01.json")
    )
    note = (
        "full-registry Spark-vs-DuckDB value-hash parity "
        f"(tools/check_parity.py via tools/parity_sweep.py) at {sf_dir}."
    )
    raise SystemExit(1 if sweep(sf_dir, artifact, note) else 0)


if __name__ == "__main__":
    main()
