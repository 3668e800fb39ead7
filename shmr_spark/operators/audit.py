"""Single-pass pipeline audit via Spark's Observation API.

A data pipeline wants row counts / null rates / value totals at each
stage for monitoring — but a separate ``df.count()`` or profiling
query per stage re-scans the data, doubling (or worse) the I/O of a
100 TB job. ``df.observe`` attaches aggregate metrics to the SAME
action that materializes the stage: the metrics ride the existing
scan for free and arrive on the driver when the action finishes.

Usage::

    staged, obs = with_audit(df, "post_filter",
                             rows=F.count(F.lit(1)),
                             null_texts=F.count_if(F.col("text").isNull()))
    staged.write.parquet(out)          # one pass: writes AND measures
    obs.get                            # {'rows': ..., 'null_texts': ...}

Reference scope note: the closest reference feature is the `.meta`
row-count sidecar written on every output
(/root/reference/shmr/partition_writer.py:47-85); this is its
generalization — arbitrary aggregate metrics, still one pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def with_audit(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``'s next action.

    Returns (instrumented df, observation). Read ``observation.get``
    only AFTER an action ran the plan; metrics cover exactly the rows
    that flowed through this point of the plan — e.g. placed after a
    filter, they see the filtered stream, making before/after audit
    pairs cheap (two observe calls, still one scan).
    """
    obs = Observation(name)
    instrumented = df.observe(obs, *[metrics[k].alias(k) for k in metrics])
    return instrumented, obs
