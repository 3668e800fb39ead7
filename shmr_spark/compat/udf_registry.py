"""SQL UDF registry: expose the compat helper surface to spark.sql
users (the reference's --fn ecosystem, reachable from SQL).

Python UDFs are the slow path by design — these exist for SQL-side
compatibility with user functions, not for the native operators
(which are pure Column expressions).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from shmr_spark.compat import funcs


def register_helpers(spark: SparkSession) -> None:
    """Register the reference's helper functions as SQL UDFs:
    shmr_str2hashnumber, shmr_identity_str, shmr_getitem_{0,1,2}."""
    spark.udf.register("shmr_str2hashnumber", funcs.str2hashnumber, T.LongType())
    spark.udf.register("shmr_identity_str", lambda x: x, T.StringType())
    for i, fn in ((0, funcs.getitem_0), (1, funcs.getitem_1), (2, funcs.getitem_2)):
        spark.udf.register(f"shmr_getitem_{i}", fn, T.StringType())
