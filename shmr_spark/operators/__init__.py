from shmr_spark.operators.asof import asof_join
from shmr_spark.operators.audit import with_audit
from shmr_spark.operators.rollup_incremental import (
    combine_rollups,
    merge_rollup,
    rollup_events,
    rollup_readout,
)
from shmr_spark.operators.skew import salted_agg

__all__ = [
    "asof_join",
    "with_audit",
    "combine_rollups",
    "merge_rollup",
    "rollup_events",
    "rollup_readout",
    "salted_agg",
]
