"""Ship the rabitq_spark package to executor Python workers.

The driver contract imports __spark_entry__ by file path with no PYTHONPATH,
so executor-side Python (mapInPandas / pandas UDF workers) cannot import
rabitq_spark unless we distribute it. `ensure_package_on_executors` zips the
package once per SparkContext and registers it with sc.addPyFile — the same
mechanism used to ship application eggs to a real cluster, so this is also
the 1000-executor deployment story, not a local hack.

Call it before building any plan that contains a Python UDF.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_ADDED: set[int] = set()


def ensure_package_on_executors(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _ADDED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    fd, zip_path = tempfile.mkstemp(suffix=".zip", prefix="rabitq_spark_")
    os.close(fd)
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, parent))
    sc.addPyFile(zip_path)
    _ADDED.add(key)
