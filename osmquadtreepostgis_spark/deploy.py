"""Worker deployment: ship this package to Python workers.

In production the engine runs via ``spark-submit --py-files
osmquadtreepostgis_spark.zip`` (BASELINE.json north rule). When a
caller hands us an already-built SparkSession (the verify driver
does), worker processes may not have the package on PYTHONPATH —
``ensure_workers_can_import`` zips the package and ``addPyFile``s it
so pandas-UDF closures can ``import osmquadtreepostgis_spark``
anywhere.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_FLAG = "_oqps_pyfiles_added"


def build_pyfiles_zip(dest: str | None = None) -> str:
    """Zip the package for --py-files / addPyFile; returns the path."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    dest = dest or os.path.join(
        tempfile.gettempdir(), f"oqps_pyfiles_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(dest, "w") as z:
        for root, _, files in os.walk(pkg_dir):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    return dest


def ensure_workers_can_import(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _FLAG, False):
        return
    sc.addPyFile(build_pyfiles_zip())
    setattr(sc, _FLAG, True)


if __name__ == "__main__":
    # `python -m osmquadtreepostgis_spark.deploy` prints the zip path
    # to hand to spark-submit --py-files
    print(build_pyfiles_zip())
