from shmr_spark.operators.asof import asof_join
from shmr_spark.operators.skew import salted_agg

__all__ = ["asof_join", "salted_agg"]
