"""Built-in function library.

Replaces the reference's 9-helper surface (/root/reference/shmr/funcs.py)
with pyspark.sql.functions-backed equivalents, plus the numeric/text/
vector helpers the engine's own operators need.
"""

from shmr_spark.functions.numeric import dsum, davg, dmul
from shmr_spark.functions.hashing import str2hashnumber, fingerprint_md5
from shmr_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "dsum",
    "davg",
    "dmul",
    "str2hashnumber",
    "fingerprint_md5",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
