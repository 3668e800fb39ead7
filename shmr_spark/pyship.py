"""Ship the shmr_spark package to Spark Python workers.

Arrow/RDD operators (mapInPandas decode, compat records tier) pickle
closures that reference shmr_spark module functions BY REFERENCE —
every Python worker must be able to ``import shmr_spark``. When the
driver process wasn't launched from the repo (arbitrary cwd, no
PYTHONPATH), workers crash with ModuleNotFoundError. The canonical
fix is ``sc.addPyFile`` with a zip of the package: Spark distributes
it and prepends it to every worker's sys.path — works identically on
local mode and a 1000-executor cluster.

Called lazily by the driver-contract entry points and the CLI; no-op
after the first call per SparkContext.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_FLAG = "_shmr_spark_pkg_shipped"


def ensure_package_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _FLAG, False):
        return
    zpath = os.path.join(
        tempfile.gettempdir(), f"shmr_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(_PKG_DIR):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                arc = os.path.join(
                    "shmr_spark", os.path.relpath(full, _PKG_DIR)
                )
                z.write(full, arc)
    sc.addPyFile(zpath)
    setattr(sc, _FLAG, True)
