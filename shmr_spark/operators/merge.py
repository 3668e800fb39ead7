"""MERGE INTO emulation (upsert) — no Delta/Iceberg in this
environment, so the classic composition: updates win on key match,
target rows without a match survive, brand-new keys insert.

merged = updates ∪ (target ⟕anti updates)

One shuffle each side (the anti-join); at scale the target side is
the big one and the anti-join broadcast-prunes when updates are small.
SCD2 (history-keeping) variant: union with a validity-window close
instead of the anti-join drop — same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Rows from `updates` replace same-key rows in `target`; unmatched
    target rows pass through; new keys append. Schemas must align by
    name."""
    surviving = target.join(updates.select(*keys), keys, "left_anti")
    return surviving.unionByName(updates)
