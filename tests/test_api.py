"""Top-level write_to_tables lifecycle: the write_to_postgis twin
(spec build -> route -> validate -> write -> views)."""

import glob
import gzip

import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.api import write_to_tables
from osmquadtreepostgis_spark.plans.specs import Style


@pytest.fixture(scope="module")
def elements(spark):
    from osmquadtreepostgis_spark.plans.elements import elements_df

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return elements_df(docs)


def test_dry_run_counts_only(spark, elements, tmp_path):
    """connstring == 'null' analog: counts, nothing on disk."""
    out = write_to_tables(elements, str(tmp_path / "x"), dry_run=True)
    assert set(out["tables"]) == {
        "point", "line", "polygon", "highway", "building", "boundary",
    }
    assert all(isinstance(v, int) for v in out["tables"].values())
    assert sum(out["tables"].values()) >= elements.count()  # fan-out >= 1
    assert not (tmp_path / "x").exists()


def test_full_lifecycle_writes_tables_views_ddl(spark, elements, tmp_path):
    out = write_to_tables(
        elements,
        str(tmp_path / "w"),
        table_prefix="t_api",
        lowzoom=[6],
        copy_text=True,
    )
    # every routed table written and readable
    for name, path in out["tables"].items():
        df = spark.read.parquet(path)
        assert df.columns[0] == "osm_id"
    # boundary rows all negative ids (relation polygons)
    b = spark.read.parquet(out["tables"]["boundary"])
    assert b.filter(F.col("osm_id") >= 0).count() == 0
    # views: compat + lowzoom registered over the written tables
    assert "t_api_roads" in out["views"]
    assert any(v.endswith("_lz6") for v in out["views"])
    # compat line view = line UNION highway (osm2pgsql layering)
    assert spark.table("t_api_line").count() == (
        spark.read.parquet(out["tables"]["line"]).count()
        + spark.read.parquet(out["tables"]["highway"]).count()
    )
    # DDL strings mirror the specs (hstore catch-all + typed layer)
    assert "tags hstore" in out["ddl"]["point"]
    assert "layer bigint" in out["ddl"]["line"]
    assert 'way geometry(Geometry, 3857)' in out["ddl"]["polygon"]
    assert "way_exterior" in out["ddl"]["boundary"]
    # COPY text tree exists and parses as tab-separated lines
    files = glob.glob(str(tmp_path / "w" / "copy" / "line.copy" / "part-*.gz"))
    assert files
    with gzip.open(files[0], "rt") as fh:
        first = fh.readline().rstrip("\n").split("\t")
    assert len(first) == len(
        spark.read.parquet(out["tables"]["line"]).drop("__ptile").columns
    )


def test_custom_style_and_alloc(spark, elements, tmp_path):
    style = Style(feature_keys=("highway",), other_keys=("name",))
    out = write_to_tables(
        elements,
        str(tmp_path / "c"),
        style=style,
        extended=False,
        add_min_zoom=False,
        alloc=lambda g, t, z: F.array(F.lit("line")),
        lowzoom=[],
    )
    assert set(out["tables"]) == {"point", "line", "polygon"}
    line = spark.read.parquet(out["tables"]["line"])
    assert line.count() == elements.count()  # custom alloc: all -> line
    assert "tags" not in line.columns  # no catch-all with other_keys


def test_written_tables_are_clustered_and_pruned(spark, elements, tmp_path):
    """write_to_tables writes through the clustered catalog layout
    (VERDICT r2 #4): partition dirs on the coarse tile + in-file cell
    sort, so a quadtree-range scan reads N-of-M files, not all of them.
    The elements fixture has no geometry, so feed real quadtree keys
    via the ObjectQuadtree provider (the caller contract)."""
    from osmquadtreepostgis_spark.functions.cells import cell_encode_udf
    from osmquadtreepostgis_spark.sources.catalog import read_cell_range

    lon = (F.col("osm_id") % 360 - 180).cast("double") * 0.97
    lat = (F.col("osm_id") % 160 - 80).cast("double") * 0.97
    el = elements.withColumn("quadtree", cell_encode_udf(12)(lon, lat))
    out = write_to_tables(
        el,
        str(tmp_path / "p"),
        table_prefix="t_prune",
        lowzoom=[],
        providers={"ObjectQuadtree": F.col("quadtree")},
    )
    path = out["tables"]["point"]
    full = spark.read.parquet(path)
    qs = [r["quadtree"] for r in full.select("quadtree").collect()]
    qs.sort()
    lo, hi = qs[0], qs[max(0, len(qs) // 50)]  # bottom ~2% of the range

    def files_read(d):
        qe = d._jdf.queryExecution()
        p = qe.executedPlan()
        p.execute().count()
        return p.collectLeaves().head().metrics().apply("numFiles").value()

    pruned = read_cell_range(spark, path, lo, hi, cell_col="quadtree")
    n_full = files_read(full)
    n_pruned = files_read(pruned)
    assert n_pruned < n_full, (n_pruned, n_full)
    # and the rows under the range are exactly the filter's rows
    assert pruned.count() == full.filter(
        (full.quadtree >= lo) & (full.quadtree <= hi)
    ).count()


def test_errors_quarantine_scoped_to_run(spark, elements, tmp_path):
    """Unrepairable geometry -> quarantined with a reason AND the errors
    flag; a SECOND clean run into the same out_dir must NOT inherit the
    stale quarantine rows (ADVICE r3: append-mode _errors dir)."""
    import numpy as np

    from osmquadtreepostgis_spark import geom as g

    # non-simple AND unrepairable: collinear-overlap spur
    ring = np.array(
        [(0.0, 0.0), (1.0, 0.0), (0.5, 0.0), (0.5, 1.0)], dtype=float
    )
    assert not g.ring_is_simple(ring) and g.repair_ring(ring) is None
    bad_wkb = g.wkb_polygon([np.vstack([ring, ring[:1]])])

    base = elements.limit(4)
    first_id = base.select(F.min("osm_id")).first()[0]
    good_wkb = g.wkb_polygon(
        [np.array([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)], dtype=float)]
    )
    way = F.when(
        F.col("osm_id") == first_id, F.lit(bytearray(bad_wkb))
    ).otherwise(F.lit(bytearray(good_wkb)))
    out_dir = str(tmp_path / "q")
    out1 = write_to_tables(
        base, out_dir, table_prefix="t_q", lowzoom=[],
        providers={"Geometry": way},
    )
    assert out1["errors"] is not None
    err = spark.read.parquet(out1["errors"])
    assert err.count() >= 1
    assert err.filter(F.col("reason") == "invalid_geometry_unrepairable").count() >= 1
    assert "run_id" in err.columns
    # run 2: clean input, SAME out_dir -> stale rows remain on disk but
    # the flag must be None
    out2 = write_to_tables(
        base, out_dir, table_prefix="t_q", lowzoom=[],
        providers={"Geometry": F.lit(bytearray(good_wkb))},
    )
    assert out2["errors"] is None
    assert spark.read.parquet(out1["errors"]).count() >= 1  # dir not wiped
