"""Ship the xyzpy_spark package to Spark python workers.

UDF closures produced by the runner reference module-level helpers
(``xyzpy_spark._types.to_storable`` etc.), which cloudpickle serializes
*by reference* — worker processes must be able to ``import
xyzpy_spark``.  When the driver process was launched from somewhere
else (the correctness driver, a notebook), the repo may not be on the
workers' PYTHONPATH; ``sc.addPyFile`` of a zip of the package fixes
that deterministically, the same mechanism ``spark-submit --py-files``
uses on a real cluster.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ensure_package_shipped(spark: SparkSession) -> None:
    """Zip this package and addPyFile it (idempotent per-session)."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"xyzpy_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(
                        "xyzpy_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(key)
