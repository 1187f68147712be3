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


def test_mixed_depth_cells_roundtrip(spark, tmp_path):
    """Cells SHALLOWER than the partition depth (large objects from
    bbox_to_cell) must survive a write_clustered -> read_cell_range /
    read_bbox roundtrip: write labels them with the depth-guarded tile
    and read_bbox adds the ancestor-key arm (ADVICE r1, catalog.py:50)."""
    import pandas as pd

    path = str(tmp_path / "mixed")
    # deep point cells inside a bbox near (10E, 50N)
    rng = np.random.default_rng(5)
    lon = rng.uniform(9.0, 11.0, 200)
    lat = rng.uniform(49.0, 51.0, 200)
    deep = qt.point_to_cell(lon, lat, 18)
    # shallow cells: large boxes spanning most of a quadrant -> depth < 4
    shallow = qt.bbox_to_cell(
        np.array([5.0, -100.0]),
        np.array([40.0, -50.0]),
        np.array([60.0, -20.0]),
        np.array([70.0, 30.0]),
        qt.MAX_DEPTH,
    )
    assert (qt.cell_depth(shallow) < 4).all(), qt.cell_depth(shallow)
    cells = np.concatenate([deep, shallow])
    pdf = pd.DataFrame({"pt_id": np.arange(len(cells)), "cell": cells})
    write_clustered(spark.createDataFrame(pdf), path)

    # range read spanning everything returns every row incl. shallow
    lo, hi = int(cells.min()), int(cells.max())
    got = sorted(
        r["pt_id"] for r in read_cell_range(spark, path, lo, hi).collect()
    )
    assert got == pdf.pt_id.tolist()

    # bbox read over the deep cluster must also return the shallow cell
    # that contains it (an ancestor of the cover tiles)
    got_b = {
        r["pt_id"]
        for r in read_bbox(spark, path, 9.0, 49.0, 11.0, 51.0, depth=18).collect()
    }
    assert set(range(200)) <= got_b
    assert 200 in got_b  # the [5,40]x[60,70] box contains (9..11, 49..51)


def test_is_ancestor_not_inverted():
    """A deeper all-NW descendant must not read back as an ancestor
    (ADVICE r1, quadtree.py:305)."""
    anc = qt.point_to_cell(np.array([10.0]), np.array([50.0]), 6)
    desc = qt.cell_children(anc)[0]  # one level deeper
    assert qt.is_ancestor(anc, desc).all()
    assert not qt.is_ancestor(desc, anc).any()  # the inverted relation
    # all-NW descendant shares the aligned morton exactly
    nw = anc
    for _ in range(3):
        nw = qt.cell_children(nw)[:, 0]
    assert qt.is_ancestor(anc, nw).all()
    assert not qt.is_ancestor(nw, anc).any()
