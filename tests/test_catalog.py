"""Cell-clustered catalog: pruned reads return exactly the right rows
and the partition filter actually prunes directories."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark import quadtree as qt
from osmquadtreepostgis_spark.functions.cells import cell_encode_udf
from osmquadtreepostgis_spark.sources.catalog import (
    read_bbox,
    read_cell_range,
    write_clustered,
)


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cat") / "pts")
    rng = np.random.default_rng(77)
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "pt_id": np.arange(20000),
            "lon": rng.uniform(-180, 180, 20000),
            "lat": rng.uniform(-84, 84, 20000),
        }
    )
    df = spark.createDataFrame(pdf).withColumn(
        "cell", cell_encode_udf(18)("lon", "lat")
    )
    write_clustered(df, path)
    return path, pdf


def test_cell_range_read_exact(spark, clustered):
    path, pdf = clustered
    cells = qt.point_to_cell(pdf.lon.values, pdf.lat.values, 18)
    lo, hi = np.percentile(cells, [30, 40]).astype(np.int64)
    got = sorted(
        r["pt_id"] for r in read_cell_range(spark, path, int(lo), int(hi)).collect()
    )
    want = sorted(pdf.pt_id.values[(cells >= lo) & (cells <= hi)].tolist())
    assert got == want


def test_partition_pruning_happens(spark, clustered):
    path, pdf = clustered
    cells = qt.point_to_cell(pdf.lon.values, pdf.lat.values, 18)
    lo = int(np.min(cells))
    hi = int(np.percentile(cells, 2))
    df = read_cell_range(spark, path, lo, hi)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partition filter must appear on the scan (directory pruning)
    assert "PartitionFilters: [isnotnull(__ptile" in plan
    assert "PushedFilters: [IsNotNull(cell)" in plan

    def files_read(d):
        qe = d._jdf.queryExecution()
        p = qe.executedPlan()
        p.execute().count()  # action on THIS plan instance -> metrics
        return p.collectLeaves().head().metrics().apply("numFiles").value()

    n_full = files_read(spark.read.parquet(path))
    n_pruned = files_read(df)
    assert n_pruned < n_full, (n_pruned, n_full)


def test_bbox_read_matches_filter(spark, clustered):
    path, pdf = clustered
    box = (-10.0, 40.0, 25.0, 60.0)
    got = sorted(r["pt_id"] for r in read_bbox(spark, path, *box, depth=18).collect())
    cells = qt.point_to_cell(pdf.lon.values, pdf.lat.values, 18)
    # ground truth: points whose depth-4 ancestor is in the bbox cover
    cover = qt.cell_cover(
        np.array([box[0]]), np.array([box[1]]), np.array([box[2]]), np.array([box[3]]), 4
    )[0]
    anc = qt.cell_parent(cells, 4)
    want = sorted(pdf.pt_id.values[np.isin(anc, cover)].tolist())
    assert got == want
    # and it must be a superset of the exact bbox points (candidate semantics)
    exact = (
        (pdf.lon.values >= box[0])
        & (pdf.lat.values >= box[1])
        & (pdf.lon.values < box[2])
        & (pdf.lat.values < box[3])
    )
    assert set(pdf.pt_id.values[exact].tolist()) <= set(got)
