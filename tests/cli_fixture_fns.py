"""User functions for compat-CLI tests — the same shapes the
reference's tests use (get_age / sum_age with a default accumulator,
/root/reference/tests/test_partition.py:11-19), written fresh."""

from __future__ import annotations


def get_age(row: list) -> int:
    return int(row[3])


def sum_age(row: list, accum: int = 0) -> int:
    return accum + int(row[3])


def age_key(row: list) -> int:
    return int(row[3])


def sum_int(value: int, accum: int = 0) -> int:
    return accum + int(value)


def is_adult(row: list) -> bool:
    return int(row[3]) >= 18


def dup_twice(rec) -> list:
    return [rec, rec]


def by_k(rec: dict) -> int:
    return rec["k"]


def count_by_k(rec: dict, accum: dict | None = None) -> dict:
    if accum is None:
        return {"k": rec.get("k"), "n": rec.get("n", 1)}
    return {"k": accum["k"], "n": accum["n"] + rec.get("n", 1)}


def age_mod5(row: list) -> int:
    return int(row[3]) % 5


def max_name(row: list, accum: list | None = None) -> list:
    """reduce_by_key fn whose accumulator is row-shaped, so it is both
    sequential-fold-correct (the reference's calling convention) and
    merge-compatible (our distributed tier may combine two partial
    accumulators with fn(a, b))."""
    if accum is None:
        return row
    return row if row[0] > accum[0] else accum

def by_x(rec: dict) -> int:
    return rec["x"]


def get_id_field(rec: dict) -> dict:
    """Head-to-head bench fn (tools/bench_vs_reference.py): project
    two fields from an ND-JSON record."""
    return {"id": rec["id"], "age": rec["age"]}


def age_of(rec: dict) -> int:
    return rec["age"]


def count_by_age(rec: dict, accum: dict | None = None) -> dict:
    """reduce_by_key accumulator: {'age': k, 'n': count} per key
    (the reference's accumulator must carry its own key)."""
    if accum is None:
        return {"age": rec["age"], "n": 1}
    accum["n"] += 1
    return accum


def id_mod100k(rec: dict) -> int:
    return rec["id"] % 100000


def count_by_id_mod(rec: dict, accum: dict | None = None) -> dict:
    if accum is None:
        return {"k": rec["id"] % 100000, "n": 1}
    accum["n"] += 1
    return accum


def key_of_k(rec: dict) -> int:
    return rec["k"]


def merge_counts(rec: dict, accum: dict | None = None) -> dict:
    if accum is None:
        return {"k": rec["k"], "n": rec["n"]}
    accum["n"] += rec["n"]
    return accum
