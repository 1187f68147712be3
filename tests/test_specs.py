"""Style-driven table specs: column lists, provenance metadata, and
routed projection must mirror postgis_columns
(/root/reference/osmquadtreepostgis/__init__.py:39-131)."""

import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.plans.specs import (
    BOUNDARY_WHITELIST,
    DEFAULT_EXTRA_WAY_COLS,
    Style,
    apply_table_specs,
    build_table_specs,
)


def test_catch_all_mode_columns_and_order():
    """other_keys=None: default extra cols merged, sorted pivot order,
    layer excluded from text pivot, hstore residual appended."""
    style = Style(feature_keys=("highway", "building"), parent_tags=("p1",))
    specs = build_table_specs(style, add_min_zoom=True, extended=False)
    assert set(specs) == {"point", "line", "polygon"}
    line = specs["line"]
    names = [c.name for c in line.columns]
    # fixed prefix
    assert names[:3] == ["osm_id", "quadtree", "tile"]
    # sorted way cols (feature + default extras, minus layer)
    want_tags = sorted(
        ({"highway", "building"} | set(DEFAULT_EXTRA_WAY_COLS)) - {"layer"}
    )
    assert names[3 : 3 + len(want_tags)] == want_tags
    # fixed suffix order
    assert names[-6:] == ["layer", "z_order", "minzoom", "tags", "length", "way"]
    # point table carries parent tags and no z_order/length
    pnames = [c.name for c in specs["point"].columns]
    assert "p1" in pnames and "z_order" not in pnames and "length" not in pnames
    assert pnames[-1] == "way" and pnames[-2] == "tags"


def test_explicit_other_keys_no_hstore():
    style = Style(feature_keys=("highway",), other_keys=("name",))
    specs = build_table_specs(style, add_min_zoom=False, extended=False)
    for t in specs.values():
        assert "tags" not in [c.name for c in t.columns]
        assert "minzoom" not in [c.name for c in t.columns]


def test_extended_tables_and_boundary_whitelist():
    style = Style(feature_keys=("highway", "building", "boundary"))
    specs = build_table_specs(style, add_min_zoom=True, extended=True)
    assert set(specs) == {
        "point", "line", "polygon", "highway", "building", "boundary",
    }
    # highway mirrors line, building mirrors polygon
    assert [c.name for c in specs["highway"].columns] == [
        c.name for c in specs["line"].columns
    ]
    poly_names = [c.name for c in specs["polygon"].columns]
    assert [c.name for c in specs["building"].columns] == poly_names
    assert poly_names[-1] == "way_point"  # extended polygon extra
    bnames = [c.name for c in specs["boundary"].columns]
    assert bnames[-1] == "way_exterior"
    assert all(n in BOUNDARY_WHITELIST for n in bnames[:-1])
    assert "building" not in bnames and "highway" not in bnames


def test_schema_provenance_metadata():
    style = Style(feature_keys=("highway",))
    specs = build_table_specs(style, add_min_zoom=True, extended=False)
    sch = specs["line"].schema()
    src = {f.name: f.metadata["source"] for f in sch.fields}
    assert src["osm_id"] == "OsmId"
    assert src["highway"] == "Tag"
    assert src["layer"] == "Layer"
    assert src["z_order"] == "ZOrder"
    assert src["minzoom"] == "MinZoom"
    assert src["tags"] == "OtherTags"
    assert src["length"] == "Length"
    assert src["way"] == "Geometry"
    assert sch["layer"].dataType.typeName() == "long"
    assert sch["tags"].dataType.typeName() == "map"


@pytest.fixture(scope="module")
def routed_tables(spark):
    from osmquadtreepostgis_spark.plans.elements import elements_df

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    el = elements_df(docs)
    style = Style(feature_keys=("highway", "building", "boundary"))
    specs = build_table_specs(
        style,
        add_min_zoom=True,
        extended=True,
        extra_node_cols=["name", "layer"],
        extra_way_cols=["name", "layer"],
    )
    return specs, apply_table_specs(el, specs, extended=True)


def test_apply_layer_try_cast_and_residual(routed_tables):
    specs, tables = routed_tables
    line = tables["line"].collect()
    assert len(line) > 0
    for r in line:
        # layer tag present on doc_id % 3 == 0; non-numeric 'x' on % 21
        if r["osm_id"] % 3 == 0:
            if r["osm_id"] % 21 == 0:
                assert r["layer"] is None  # try_cast('x') -> NULL
            else:
                assert r["layer"] == (r["osm_id"] % 11) - 5
            # raw layer TAG stays in the residual (C++ tag_cols rule)
            assert "layer" in r["tags"]
        else:
            assert r["layer"] is None
        # pivoted keys never in residual
        assert not {"highway", "building", "boundary", "name"} & set(r["tags"])


def test_apply_routing_matches_alloc(routed_tables):
    specs, tables = routed_tables
    # boundary rows are complicated polygons typed boundary -> negative
    # osm_id (relation-derived), also present in polygon (fan-out)
    b_ids = {r["osm_id"] for r in tables["boundary"].select("osm_id").collect()}
    p_ids = {r["osm_id"] for r in tables["polygon"].select("osm_id").collect()}
    assert b_ids and b_ids <= p_ids
    assert all(i < 0 for i in b_ids)
    # every routed table projects exactly its spec schema
    for name, df in tables.items():
        assert df.columns == [c.name for c in specs[name].columns]


def test_pluggable_alloc_func(spark):
    """The alloc_func hook accepts a Column-valued rule AND a row-level
    Python callback (src/postgis_python.cpp:271-296), and both override
    the built-ins end-to-end through apply_table_specs."""
    from osmquadtreepostgis_spark.plans.elements import elements_df

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    el = elements_df(docs.limit(200))
    style = Style(feature_keys=("highway",), other_keys=("name",))
    specs = build_table_specs(style, extended=False)

    # Column-valued hook: everything to 'line'
    col_alloc = lambda g, t, z: F.array(F.lit("line"))  # noqa: E731
    t1 = apply_table_specs(el, specs, extended=False, alloc=col_alloc)
    n = el.count()
    assert t1["line"].count() == n and t1["point"].count() == 0

    # row-level Python callback: route by a custom tag rule
    def my_alloc(geom_type, tags):
        if tags.get("building") == "yes":
            return ["polygon"]
        return ["point"]

    t2 = apply_table_specs(el, specs, extended=False, alloc=my_alloc)
    assert t2["polygon"].count() == el.filter(
        F.element_at("tags", "building") == "yes"
    ).count()
    assert t2["line"].count() == 0

    # string forms still resolve
    t3 = apply_table_specs(el, specs, extended=False, alloc="default")
    assert t3["point"].count() == el.filter(F.col("geom_type") == "point").count()
