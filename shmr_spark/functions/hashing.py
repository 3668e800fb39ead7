"""Hashing helpers.

The reference bridges string keys to int keys with CityHash64
(``str2hashnumber``, /root/reference/shmr/funcs.py:28-29) purely so
``split_by_key`` can modulo them into buckets
(/root/reference/shmr/partition.py:260). Only the *grouping* property
matters (SURVEY.md §2 #10), so we use Spark's JVM-side xxhash64 —
vectorized, codegen'd, no Python round-trip — rather than shipping a
CityHash UDF down the slow path.

``fingerprint_md5`` is the document-fingerprint primitive: md5 exists
in both Spark and DuckDB with identical output, so it is
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def str2hashnumber(col: Column | str) -> Column:
    """Deterministic 64-bit hash of a string column (role of the
    reference's CityHash64 bridge; different hash function, same
    contract: stable int key for bucketing)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c)


def bucket(col: Column | str, num_buckets: int) -> Column:
    """Non-negative bucket id ``pmod(key, N)`` — the reference's
    ``key_fn(rec) % N`` routing (/root/reference/shmr/partition.py:260)
    as a native expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(c.cast("long"), F.lit(num_buckets)).cast("int")


def fingerprint_md5(col: Column | str, normalize: bool = True) -> Column:
    """Document fingerprint: md5 of (optionally whitespace-normalized,
    lowercased) text. Oracle-checkable — DuckDB md5() matches."""
    c = F.col(col) if isinstance(col, str) else col
    if normalize:
        c = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    return F.md5(c)
