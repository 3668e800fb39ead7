from shmr_spark.sources.readers import (
    read_parquet,
    read_parquet_evolved,
    read_ndjson,
    read_csv,
    read_text,
)
from shmr_spark.sources.writers import (
    write_parquet,
    write_ndjson,
    write_csv,
    write_text,
)

__all__ = [
    "read_parquet",
    "read_parquet_evolved",
    "read_ndjson",
    "read_csv",
    "read_text",
    "write_parquet",
    "write_ndjson",
    "write_csv",
    "write_text",
]
