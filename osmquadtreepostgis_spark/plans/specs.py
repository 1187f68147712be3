"""Style-driven table-spec construction — the reference's main
user-facing configuration surface.

Mirrors ``postgis_columns(style, add_min_zoom, extended, …)``
(/root/reference/osmquadtreepostgis/__init__.py:39-131): every output
table's column list is derived from the style's ``feature_keys`` /
``other_keys`` / ``parent_tags`` / ``relation_tag_spec`` plus fixed
per-class extras, with these rules reproduced exactly:

* node/way tag-column sets = feature_keys ∪ (other_keys, or the
  default extra node/way cols when other_keys is None — the catch-all
  mode), pivoted in SORTED order (__init__.py:58), 'layer' excluded
  from the text pivot;
* ``layer`` is its own BigInteger column from the Layer source —
  ``try_cast(tags['layer'] as long)`` (src/postgiswriter.cpp:458-461;
  oqt parses the tag to an optional int upstream). Because the C++
  writer's ``tag_cols`` map holds only Tag-source columns
  (src/postgiswriter.cpp:331-332), the raw 'layer' TAG still lands in
  the OtherTags residual — reproduced here;
* catch-all mode (other_keys is None) appends an hstore ``tags``
  residual column (map type here);
* line/polygon get ``z_order``; line gets ``length``; polygon gets
  ``way_area`` (+ ``way_point`` when extended); extended adds the
  highway/building/boundary tables, boundary filtered to the fixed
  whitelist + ``way_exterior`` (__init__.py:117-129).

Spark shape: a :class:`TableSpec` renders to a ``StructType`` whose
field metadata records the ColumnSource provenance, and
:func:`apply_table_specs` compiles each spec into a Column list over a
routed elements DataFrame — schema construction IS plan construction,
so Catalyst prunes unused sources per table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.routing import (
    explode_routes,
    minzoom_col,
    other_tags,
    resolve_alloc,
    signed_osm_id,
    z_order_col,
)

__all__ = [
    "Style",
    "ColumnSpec",
    "TableSpec",
    "build_table_specs",
    "apply_table_specs",
    "create_table_ddl",
    "DEFAULT_EXTRA_NODE_COLS",
    "DEFAULT_EXTRA_WAY_COLS",
    "BOUNDARY_WHITELIST",
]

# /root/reference/osmquadtreepostgis/__init__.py:35-36
DEFAULT_EXTRA_NODE_COLS = [
    "access", "addr:housename", "addr:housenumber", "addr:interpolation",
    "admin_level", "bicycle", "covered", "foot", "horse", "layer", "name",
    "oneway", "ref", "religion", "surface",
]
DEFAULT_EXTRA_WAY_COLS = [
    "addr:housenumber", "admin_level", "layer", "bicycle", "name",
    "tracktype", "addr:interpolation", "addr:housename", "horse", "surface",
    "access", "religion", "oneway", "foot", "covered", "ref",
]

# __init__.py:125 — boundary keeps only these (+ way_exterior)
BOUNDARY_WHITELIST = (
    "osm_id", "part", "quadtree", "tile", "boundary", "admin_level",
    "name", "ref", "minzoom", "way_area", "way",
)

# column sources (the reference's GeometryColumnSource enum)
OSM_ID = "OsmId"
OBJECT_QUADTREE = "ObjectQuadtree"
BLOCK_QUADTREE = "BlockQuadtree"
TAG = "Tag"
LAYER = "Layer"
Z_ORDER = "ZOrder"
MIN_ZOOM = "MinZoom"
OTHER_TAGS = "OtherTags"
LENGTH = "Length"
AREA = "Area"
GEOMETRY = "Geometry"
REPRESENTATIVE_POINT = "RepresentativePointGeometry"
BOUNDARY_LINE = "BoundaryLineGeometry"

_TYPE_MAP: dict[str, T.DataType] = {
    "bigint": T.LongType(),
    "text": T.StringType(),
    "double": T.DoubleType(),
    "hstore": T.MapType(T.StringType(), T.StringType()),
    # geometries travel as WKB bytes (functions/geometry.py emits EWKB)
    "geometry": T.BinaryType(),
}


@dataclass(frozen=True)
class Style:
    """The user's style: which tag keys become feature columns, which
    extra keys are kept, which parent tags propagate. ``other_keys``
    None means catch-all: default extra cols + residual hstore."""

    feature_keys: tuple[str, ...]
    other_keys: tuple[str, ...] | None = None
    parent_tags: tuple[str, ...] = ()
    relation_tag_spec: tuple[str, ...] = ()  # target keys only


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    type: str  # key into _TYPE_MAP
    source: str  # ColumnSource provenance


@dataclass
class TableSpec:
    name: str
    columns: list[ColumnSpec] = field(default_factory=list)

    def schema(self) -> T.StructType:
        """StructType with ColumnSource provenance in field metadata."""
        return T.StructType(
            [
                T.StructField(
                    c.name, _TYPE_MAP[c.type], True, {"source": c.source}
                )
                for c in self.columns
            ]
        )

    def tag_columns(self) -> list[str]:
        return [c.name for c in self.columns if c.source == TAG]


def _base_cols() -> list[ColumnSpec]:
    return [
        ColumnSpec("osm_id", "bigint", OSM_ID),
        ColumnSpec("quadtree", "bigint", OBJECT_QUADTREE),
        ColumnSpec("tile", "bigint", BLOCK_QUADTREE),
    ]


def build_table_specs(
    style: Style,
    add_min_zoom: bool = False,
    extended: bool = False,
    extra_node_cols: list[str] | None = None,
    extra_way_cols: list[str] | None = None,
) -> dict[str, TableSpec]:
    """postgis_columns twin (__init__.py:39-131), keyed by table name.
    Column ORDER matches the reference exactly (deterministic column
    order is O2 in SURVEY §2)."""
    node_cols = set(style.feature_keys)
    way_cols = set(style.feature_keys)
    if style.other_keys is None:
        node_cols.update(
            extra_node_cols if extra_node_cols is not None else DEFAULT_EXTRA_NODE_COLS
        )
        way_cols.update(
            extra_way_cols if extra_way_cols is not None else DEFAULT_EXTRA_WAY_COLS
        )
    else:
        node_cols.update(style.other_keys)
        way_cols.update(style.other_keys)

    point_cols = _base_cols()
    point_cols += [
        ColumnSpec(k, "text", TAG) for k in sorted(node_cols) if k != "layer"
    ]
    point_cols += [ColumnSpec(k, "text", TAG) for k in style.parent_tags]
    point_cols.append(ColumnSpec("layer", "bigint", LAYER))
    if add_min_zoom:
        point_cols.append(ColumnSpec("minzoom", "bigint", MIN_ZOOM))
    if style.other_keys is None:
        point_cols.append(ColumnSpec("tags", "hstore", OTHER_TAGS))
    point_cols.append(ColumnSpec("way", "geometry", GEOMETRY))

    line_cols = _base_cols()
    line_cols += [
        ColumnSpec(k, "text", TAG) for k in sorted(way_cols) if k != "layer"
    ]
    line_cols += [ColumnSpec(k, "text", TAG) for k in style.relation_tag_spec]
    line_cols.append(ColumnSpec("layer", "bigint", LAYER))
    line_cols.append(ColumnSpec("z_order", "bigint", Z_ORDER))
    if add_min_zoom:
        line_cols.append(ColumnSpec("minzoom", "bigint", MIN_ZOOM))
    if style.other_keys is None:
        line_cols.append(ColumnSpec("tags", "hstore", OTHER_TAGS))
    line_cols.append(ColumnSpec("length", "double", LENGTH))
    line_cols.append(ColumnSpec("way", "geometry", GEOMETRY))

    poly_cols = _base_cols()
    poly_cols += [
        ColumnSpec(k, "text", TAG) for k in sorted(way_cols) if k != "layer"
    ]
    poly_cols.append(ColumnSpec("layer", "bigint", LAYER))
    poly_cols.append(ColumnSpec("z_order", "bigint", Z_ORDER))
    if add_min_zoom:
        poly_cols.append(ColumnSpec("minzoom", "bigint", MIN_ZOOM))
    if style.other_keys is None:
        poly_cols.append(ColumnSpec("tags", "hstore", OTHER_TAGS))
    poly_cols.append(ColumnSpec("way_area", "double", AREA))
    poly_cols.append(ColumnSpec("way", "geometry", GEOMETRY))
    if extended:
        poly_cols.append(
            ColumnSpec("way_point", "geometry", REPRESENTATIVE_POINT)
        )

    specs = {
        "point": TableSpec("point", point_cols),
        "line": TableSpec("line", line_cols),
        "polygon": TableSpec("polygon", poly_cols),
    }
    if extended:
        specs["highway"] = TableSpec("highway", list(line_cols))
        specs["building"] = TableSpec("building", list(poly_cols))
        boundary_cols = [c for c in poly_cols if c.name in BOUNDARY_WHITELIST]
        boundary_cols.append(
            ColumnSpec("way_exterior", "geometry", BOUNDARY_LINE)
        )
        specs["boundary"] = TableSpec("boundary", boundary_cols)
    return specs


# PG DDL types per spec type + geometry subtype per source (the
# reference's type_str + create_tables, __init__.py:136-173)
_PG_TYPES = {"bigint": "bigint", "text": "text", "double": "double precision",
             "hstore": "hstore"}
_PG_GEOM = {
    GEOMETRY: "geometry(Geometry, 3857)",
    REPRESENTATIVE_POINT: "geometry(Point, 3857)",
    BOUNDARY_LINE: "geometry(Geometry, 3857)",
}


def create_table_ddl(spec: TableSpec, table_prefix: str = "planet_osm_") -> str:
    """PostGIS CREATE TABLE for a spec (pair with the COPY text/binary
    emitters to load an actual PostGIS — the reference's create_tables,
    __init__.py:136-173)."""
    cols = []
    for c in spec.columns:
        if c.type == "geometry":
            pg = _PG_GEOM.get(c.source, "geometry(Geometry, 3857)")
        else:
            pg = _PG_TYPES[c.type]
        name = f'"{c.name}"' if ":" in c.name else c.name
        cols.append(f"{name} {pg}")
    return (
        f"CREATE TABLE {table_prefix}{spec.name} (" + ", ".join(cols) + ")"
    )


def _compile_column(
    spec: ColumnSpec,
    tag_cols: list[str],
    providers: dict[str, Column],
) -> Column:
    """ColumnSource -> Spark expression (the populate_* switch,
    src/postgiswriter.cpp:412-520, as declarative Columns)."""
    if spec.source == OSM_ID:
        return signed_osm_id(F.col("osm_id"), F.col("geom_type"))
    if spec.source == TAG:
        return F.element_at(F.col("tags"), spec.name)
    if spec.source == LAYER:
        # try_cast: non-numeric layer tags become NULL, not an error
        return F.element_at(F.col("tags"), "layer").try_cast("long")
    if spec.source == Z_ORDER:
        return z_order_col(F.col("tags"))
    if spec.source == MIN_ZOOM:
        return minzoom_col(F.col("tags"), F.col("geom_type"), F.col("way_area"))
    if spec.source == OTHER_TAGS:
        # residual excludes only Tag-source columns (tag_cols map in the
        # C++ writer holds just those) — the raw 'layer' tag stays in
        return other_tags(F.col("tags"), tag_cols)
    if spec.source == AREA:
        return F.when(
            F.col("geom_type").isin("simple_polygon", "complicated_polygon"),
            F.col("way_area"),
        ).cast("double")
    if spec.source in providers:
        return providers[spec.source]
    # geometry-ish sources (Geometry / RepresentativePointGeometry /
    # BoundaryLineGeometry / Length / ObjectQuadtree / BlockQuadtree)
    # must be provided by the caller when the input carries them;
    # otherwise they are typed NULLs so the schema stays exact
    return F.lit(None).cast(_TYPE_MAP[spec.type])


def apply_table_specs(
    elements: DataFrame,
    specs: dict[str, TableSpec],
    extended: bool = True,
    providers: dict[str, Column] | None = None,
    alloc=None,
) -> dict[str, DataFrame]:
    """Route elements (alloc_func) and project each target table per
    its spec. ``providers`` maps a ColumnSource name to a Column for
    sources the elements frame carries (quadtree/geometry/length …).
    ``alloc`` is the pluggable alloc_func hook (reference:
    src/postgis_python.cpp:271-296): None/"default"/"extended", a
    Column-valued callable (geom_type, tags, z_order) -> array<string>,
    or a row-level Python callback (fn(geom_type, tags_dict) ->
    list[str], Arrow-batched). When None, ``extended`` picks between
    the two built-ins.

    Input contract: elements has (osm_id, geom_type, tags, way_area)
    [+ whatever the providers read]. One explode is the only
    row-multiplying op; everything else is pure-Column."""
    providers = providers or {}
    z = z_order_col(F.col("tags"))
    if alloc is None:
        alloc = "extended" if extended else "default"
    routes = resolve_alloc(alloc)(F.col("geom_type"), F.col("tags"), z)
    routed = explode_routes(elements, routes)
    out: dict[str, DataFrame] = {}
    for name, spec in specs.items():
        rows = routed.filter(F.col("table") == name)
        cols = [
            _compile_column(c, spec.tag_columns(), providers).alias(c.name)
            for c in spec.columns
        ]
        out[name] = rows.select(*cols)
    return out
