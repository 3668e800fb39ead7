"""Deterministic N× scale-up of a test-data sf dir (default: sf0.1 →
a sf1-equivalent corpus) for bench scale checks.

TESTDATA.md's corpus tops out at sf0.1; plans that only work at that
size (broadcast thresholds, AQE switches, skew behavior) need a bigger
run to show themselves. This derives one, WITHOUT touching the
read-only /root/testdata: each fact/doc table is replicated N times
with key OFFSETS that preserve every foreign-key relationship
(copy i shifts custkey/orderkey/partkey/suppkey/user_id/... by
i × (max_key + 1)), so join selectivities and group cardinalities
scale the way a real sf1 corpus would. Dimension tables (region,
nation) stay fixed, as in TPC-H. Timestamps are kept, so event-time
windows get N× denser — the realistic direction at scale.

Run: python tools/make_scaled_sf.py [N] [base_dir] [out_dir]
Defaults: N=10, base=/root/testdata/sf0.1, out=/root/repo/.scaled/sf1
Output is cached (skips if out_dir exists and is complete).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from shmr_spark.catalog import TABLES, load_table  # noqa: E402

# per-table: columns that carry entity keys to offset per copy, and the
# entity that defines each column's stride (so FKs stay consistent)
_KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

# entity → (table, key column) that defines its stride
_STRIDE_SOURCE = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}


def _strides(spark, base_dir: str) -> dict[str, int]:
    out = {}
    for entity, (table, col) in _STRIDE_SOURCE.items():
        mx = load_table(spark, base_dir, table).agg(F.max(col)).collect()[0][0]
        out[entity] = int(mx) + 1
    return out


def _replicate(df: DataFrame, n: int, offsets: dict[str, int]) -> DataFrame:
    copies = []
    for i in range(n):
        c = df
        for col, stride in offsets.items():
            c = c.withColumn(col, (F.col(col) + F.lit(i * stride)).cast("long"))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def make_scaled(spark, n: int, base_dir: str, out_dir: str) -> None:
    import shutil

    done_marker = os.path.join(out_dir, "_COMPLETE")
    # the cache key is (base corpus, factor): a marker from a different
    # base (or an interrupted build) must not be reused silently
    key = f"{os.path.abspath(base_dir)}|n={n}\n"
    if os.path.exists(done_marker):
        with open(done_marker) as f:
            if f.read() == key:
                return
        shutil.rmtree(out_dir)  # stale corpus from a different base/factor
    os.makedirs(out_dir, exist_ok=True)
    strides = _strides(spark, base_dir)
    for table in TABLES:
        df = load_table(spark, base_dir, table)
        keyed = _KEYED.get(table)
        if keyed:
            offsets = {col: strides[entity] for col, entity in keyed.items()}
            df = _replicate(df, n, offsets)
        # one parquet FILE per table, matching the base corpus layout
        # (load_table reads "<table>.parquet" as a directory too, but
        # keeping files lets duck/parity tooling read both the same way)
        target = os.path.join(out_dir, f"{table}.parquet")
        df.coalesce(max(1, min(n, 8))).write.mode("overwrite").parquet(target + ".dir")
        # a directory named <table>.parquet is read identically by
        # spark.read.parquet and duckdb read_parquet('<dir>/*.parquet');
        # clear any remnant of an interrupted earlier build first
        if os.path.exists(target):
            shutil.rmtree(target)
        os.rename(target + ".dir", target)
    with open(done_marker, "w") as f:
        f.write(key)


def make_skewed(
    spark,
    base_dir: str,
    out_dir: str,
    hot_key: int = 1,
    hot_tenths: int = 3,
) -> None:
    """Derive a HOT-KEY corpus from a (scaled) sf dir for skew
    benchmarks: lineitem's l_suppkey is rewritten so ~hot_tenths/10 of
    all rows land on one supplier (deterministic xxhash64 gate on
    (l_orderkey, l_linenumber) — no RNG, append-stable). Only the two
    tables the skew benches read (lineitem, supplier) are written.

    This models the real 100 TB failure shape: one hot entity (a
    language, a null-ish default key, one megacustomer) owning a
    constant fraction of a fact table."""
    import shutil

    done_marker = os.path.join(out_dir, "_COMPLETE")
    key = f"{os.path.abspath(base_dir)}|hot={hot_key}|tenths={hot_tenths}\n"
    if os.path.exists(done_marker):
        with open(done_marker) as f:
            if f.read() == key:
                return
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    li = load_table(spark, base_dir, "lineitem").withColumn(
        "l_suppkey",
        F.when(
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10))
            < F.lit(hot_tenths),
            F.lit(hot_key).cast("long"),
        ).otherwise(F.col("l_suppkey")),
    )
    for name, df in (
        ("lineitem", li),
        ("supplier", load_table(spark, base_dir, "supplier")),
    ):
        target = os.path.join(out_dir, f"{name}.parquet")
        df.coalesce(8).write.mode("overwrite").parquet(target + ".dir")
        if os.path.exists(target):
            shutil.rmtree(target)
        os.rename(target + ".dir", target)
    with open(done_marker, "w") as f:
        f.write(key)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(REPO, ".scaled", "sf1")
    from shmr_spark import get_spark

    spark = get_spark(app_name="make_scaled_sf")
    make_scaled(spark, n, base, out)
    print(out)


if __name__ == "__main__":
    main()
