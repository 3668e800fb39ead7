from shmr_spark.sources.readers import (
    read_parquet,
    read_parquet_evolved,
    read_ndjson,
    read_ndjson_tolerant,
    read_csv,
    read_orc,
    read_text,
)
from shmr_spark.sources.shmr_datasource import ShmrDataSource
from shmr_spark.sources.writers import (
    write_parquet,
    write_sorted_shards,
    compact_dataset,
    write_ndjson,
    write_csv,
    write_orc,
    write_text,
)

__all__ = [
    "read_parquet",
    "read_parquet_evolved",
    "read_ndjson",
    "read_ndjson_tolerant",
    "read_csv",
    "read_orc",
    "read_text",
    "ShmrDataSource",
    "write_parquet",
    "write_sorted_shards",
    "compact_dataset",
    "write_ndjson",
    "write_csv",
    "write_orc",
    "write_text",
]
