"""Z-order (Morton) keys — multi-column data-skipping layout.

At 100 TB, min/max row-group pruning only helps on the sort column;
sorting by the interleaved-bit Morton code of two columns keeps BOTH
columns' value ranges tight inside every file/row-group, so filters
on either column skip most of the data. The reference has no layout
control at all (files are whatever the user wrote —
`/root/reference/shmr/partition_writer.py`); this is a pure
Spark-scale extension.

The key is a pure Column expression (shift/mask/sum — whole-stage
codegen, no UDF), with a DuckDB SQL twin for the oracle gate.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(c1: Column | str, c2: Column | str, bits: int = 16) -> Column:
    """Morton-interleave the low `bits` bits of two integer columns:
    bit i of c1 → bit 2i, bit i of c2 → bit 2i+1."""
    a = (F.col(c1) if isinstance(c1, str) else c1).cast("long").bitwiseAND(
        F.lit((1 << bits) - 1)
    )
    b = (F.col(c2) if isinstance(c2, str) else c2).cast("long").bitwiseAND(
        F.lit((1 << bits) - 1)
    )
    terms = [
        F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        for i in range(bits)
    ] + [
        F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        for i in range(bits)
    ]
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def sql_zorder_key(e1: str, e2: str, bits: int = 16) -> str:
    """DuckDB twin of zorder_key for oracle_sql strings."""
    mask = (1 << bits) - 1
    a = f"(CAST(({e1}) AS BIGINT) & {mask})"
    b = f"(CAST(({e2}) AS BIGINT) & {mask})"
    terms = [f"((({a} >> {i}) & 1) << {2 * i})" for i in range(bits)] + [
        f"((({b} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


def zordered(df: DataFrame, c1: str, c2: str, n_files: int, bits: int = 16) -> DataFrame:
    """Lay out `df` for two-column data skipping: range-partition by
    the Morton key (equal-size files via range exchange, not hash) and
    sort within each partition, so every output file covers a compact
    rectangle of (c1, c2) space. Write the result with any sink."""
    z = zorder_key(c1, c2, bits)
    return df.repartitionByRange(n_files, z).sortWithinPartitions(z)
