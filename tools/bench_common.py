"""Shared timing discipline for the A/B bench tools (bench_skew,
bench_bloom): one warm noop-write, then min-of-N — min, not mean,
because local[32] wall-clock noise is one-sided (GC, page cache,
compaction) and the floor is the reproducible number. Changing the
discipline here changes every A/B artifact consistently."""

from __future__ import annotations

import time


def timed(df_factory, reps: int = 3) -> float:
    df_factory().write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df_factory().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)
