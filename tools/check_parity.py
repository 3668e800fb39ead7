"""Local replica of the driver's correctness gate: run every registry
query on Spark and its oracle on DuckDB over the same sf dir, compare
row count + column names + order-insensitive values, print a verdict
per query with a value-level diff on mismatch.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from shmr_spark import get_spark  # noqa: E402
from shmr_spark.catalog import TABLES  # noqa: E402
from shmr_spark.queries import load_all  # noqa: E402


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


# Queries whose result is empty BY DESIGN — they assert emptiness
# (anti-join / set-difference over sets that provably cover each
# other), so 0 rows IS the proof. Every other query producing 0
# oracle rows is a VACUOUS green: the comparison passes while
# exercising nothing (the round-5 lesson — q7's nation pair had no
# trades at sf0.001, and a too-high cosine threshold once
# green-lit an empty near-dup gate). Those fail loudly here.
VACUOUS_OK = {
    "join_anti",  # proves referential cover: no customer without nation
    "set_except",  # proves set cover: keys minus superset is empty
    "referential_integrity",  # violation scan — empty = intact corpus
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    registry = load_all()

    spark = get_spark(app_name="check_parity", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        # testdata tables are single parquet FILES; scaled corpora
        # (.scaled/sf1 etc.) are Spark parquet DIRECTORIES — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )

    failures = []
    for name, spec in sorted(registry.items()):
        if only and name not in only:
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            continue
        if spec.oracle is None:
            if not s_rows and name not in VACUOUS_OK:
                failures.append(name)
                print(f"FAIL {name}: VACUOUS rows-only gate (0 rows)")
            else:
                print(f"ok   {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            res = con.execute(spec.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            continue

        if not d_rows and not s_rows and name not in VACUOUS_OK:
            # only when BOTH sides are empty: an oracle-empty /
            # spark-nonempty result is a real divergence and must
            # fall through to the rowcount diff below, not be
            # misdiagnosed as a query-shape problem
            failures.append(name)
            print(
                f"FAIL {name}: VACUOUS — both sides returned 0 rows at this "
                "SF; an empty-vs-empty match proves nothing (reshape the "
                "query or whitelist it in VACUOUS_OK with a reason)"
            )
            continue
        if sorted(s_cols) != sorted(d_cols):
            failures.append(name)
            print(f"FAIL {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
            continue
        if len(s_rows) != len(d_rows):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            continue
        _, sn = _norm_rows(s_cols, s_rows)
        _, dn = _norm_rows(d_cols, d_rows)
        # python-type audit (proxy for the driver's schema compare):
        # a Decimal-vs-float or date-vs-datetime divergence hashes
        # differently even when values look equal
        if sn and dn:
            tmis = [
                (i, type(a).__name__, type(b).__name__)
                for i, (a, b) in enumerate(zip(sn[0], dn[0]))
                if a is not None and b is not None and type(a) is not type(b)
            ]
            if tmis:
                failures.append(name)
                print(f"FAIL {name}: cell-type mismatch {tmis}")
                continue
        if sn != dn:
            failures.append(name)
            ndiff = sum(1 for a, b in zip(sn, dn) if a != b)
            print(f"FAIL {name}: {ndiff}/{len(sn)} rows differ after sort")
            for a, b in zip(sn, dn):
                if a != b:
                    print(f"  spark: {a}\n  duck : {b}")
                    break
        else:
            print(f"ok   {name}: {len(s_rows)} rows hash-match")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
