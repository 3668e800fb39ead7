"""Shuffle-byte accounting shared by bench.py and tests/test_scaling.py.

Local wall time cannot see a plan that shuffles bytes it doesn't
need — on local[...] the "exchange" is a memory copy; the cost only
appears on a real network. Executor-total shuffle read/write bytes
CAN see it, and their ratio across two corpus scales is the 100 TB
question in measurable form: bytes growing ~linearly with rows is a
healthy plan; superlinear growth means first diffing the executed
join strategies (broadcast→shuffle regime boundaries are legitimate —
q3_top_orders crosses one, SCALING.md) before calling it a defect.

Instrument notes (why it reads the way it does):
- the listener bus is drained before every read so an action's
  metrics are fully posted;
- executors are listed INCLUDING inactive ones so the summed totals
  stay monotonic even if an executor dies between the bracketing
  reads (active-only sums would record a negative delta);
- an all-zero pass over a query set known to shuffle means the
  status-store read itself broke (API drift) — callers should treat
  that as "no data", never as "these plans stopped shuffling".
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def shuffle_totals(spark: SparkSession) -> tuple[int, int]:
    """Cumulative (shuffle_read_bytes, shuffle_write_bytes) across all
    executors this application has ever had."""
    jsc = spark.sparkContext._jsc.sc()
    jsc.listenerBus().waitUntilEmpty()
    lst = jsc.statusStore().executorList(False)
    r = w = 0
    for i in range(lst.size()):
        e = lst.apply(i)
        r += e.totalShuffleRead()
        w += e.totalShuffleWrite()
    return r, w


def shuffle_bytes_of(spark: SparkSession, run: Callable[[], None]) -> dict[str, int]:
    """Run ``run()`` between two bracketing status-store reads and
    return the shuffle bytes it moved as ``{"read": n, "write": n}``.
    Anything else executing on the same SparkContext during the run is
    charged to it — callers serialize."""
    r0, w0 = shuffle_totals(spark)
    run()
    r1, w1 = shuffle_totals(spark)
    return {"read": r1 - r0, "write": w1 - w0}


def noop_sink(df: DataFrame) -> None:
    """Execute a DataFrame end-to-end with a JVM-side noop sink — no
    rows cross to Python, so the measurement is the engine's."""
    df.write.format("noop").mode("overwrite").save()
