from shmr_spark.compat.records import (
    map_records,
    flat_map_records,
    filter_records,
    reduce_records,
    reduce_by_key_records,
    distinct_records_per_partition,
)

__all__ = [
    "map_records",
    "flat_map_records",
    "filter_records",
    "reduce_records",
    "reduce_by_key_records",
    "distinct_records_per_partition",
]
