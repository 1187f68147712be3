"""spark-submit --py-files smoke test (north-rule deployment mode).

The BASELINE.json north rule mandates the engine "run via
spark-submit --py-files on a multi-executor cluster". The sandbox has
no cluster, but the deployment *mechanism* is fully testable locally:
build the package zip with :func:`deploy.build_pyfiles_zip`, launch a
real ``spark-submit --master local[2] --py-files <zip>`` subprocess
whose driver script can only import ``osmquadtreepostgis_spark`` from
that zip (repo stripped from PYTHONPATH, cwd outside the repo), and
assert a query over the engine's own Column functions returns rows.

This is the same packaging a 1000-executor cluster run would use —
executors unpack the identical zip — so a green run here proves the
package is self-contained (no repo-relative imports, no filesystem
state outside the zip needed at import time).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMOKE", "/root/testdata/sf0.001")

DRIVER = """\
import sys
from pyspark.sql import SparkSession

import osmquadtreepostgis_spark as oqps
from osmquadtreepostgis_spark.functions.text import quality_score, token_count

spark = SparkSession.builder.getOrCreate()
docs = spark.read.parquet(sys.argv[1] + "/documents.parquet")
n = (
    docs.select(token_count("text").alias("toks"),
                quality_score("text").alias("q"))
    .where("toks > 0 AND q IS NOT NULL")
    .count()
)
print("OQPS_SMOKE_OK", n, oqps.__file__)
spark.stop()
"""


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_smoke(tmp_path):
    from osmquadtreepostgis_spark.deploy import build_pyfiles_zip

    zip_path = build_pyfiles_zip(str(tmp_path / "oqps_pyfiles.zip"))
    driver = tmp_path / "smoke_driver.py"
    driver.write_text(DRIVER)

    env = dict(os.environ)
    # the zip must be the ONLY import source: strip the repo from
    # PYTHONPATH and run from outside it
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and os.path.abspath(p) != REPO
    )
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            str(driver), SF_DIR,
        ],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path), env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    ok = [l for l in proc.stdout.splitlines() if l.startswith("OQPS_SMOKE_OK")]
    assert ok, proc.stdout[-4000:] + proc.stderr[-2000:]
    _, n, mod_file = ok[0].split(maxsplit=2)
    assert int(n) > 0
    # proof the import came from the shipped zip, not the repo tree
    assert not mod_file.startswith(REPO), mod_file
    assert ".zip" in mod_file or "spark" in mod_file.lower(), mod_file
