"""Sweep every registry oracle's DuckDB result type for widths Spark
cannot emit: DuckDB widens un-cast integer aggregates (SUM over int
expressions, count_if) to HUGEINT, and the driver's typed value-hash
then mismatches against Spark's BIGINT even when the values are equal
(see VERDICT r3 — validate_orders / bool_aggregates). Python-value
comparison (tools/check_parity.py) erases width, so this sweep is the
only local gate for the class.

Usage: python tools/oracle_type_sweep.py [sf_dir]
Exit 1 if any oracle column binds to HUGEINT/UHUGEINT or an unsigned
integer type.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from shmr_spark.catalog import TABLES  # noqa: E402
from shmr_spark.queries import load_all  # noqa: E402

BAD_TYPES = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    registry = load_all()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    flagged = []
    n_oracled = 0
    for name, spec in sorted(registry.items()):
        if spec.oracle is None:
            continue
        n_oracled += 1
        try:
            rows = con.execute("DESCRIBE " + spec.oracle).fetchall()
        except Exception as e:  # noqa: BLE001
            flagged.append(name)
            print(f"FAIL {name}: DESCRIBE error: {type(e).__name__}: {e}")
            continue
        bad = [(col, typ) for col, typ, *_ in rows if typ.upper() in BAD_TYPES]
        if bad:
            flagged.append(name)
            print(f"FAIL {name}: {bad}")
    print(f"\nswept {n_oracled} oracles; {len(flagged)} flagged"
          + (f": {flagged}" if flagged else ""))
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
