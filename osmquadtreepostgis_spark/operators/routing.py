"""Table routing, tag pivot, residual tags, z_order, minzoom.

Reproduces the reference's multi-output row routing and column
production (all citations into /root/reference/):

* ``alloc_func`` truth tables — default (src/postgiswriter.cpp:285-292)
  and extended (src/postgis_python.cpp:219-269). A row can route to
  MULTIPLE tables (boundary polygons) — modeled as an array column +
  ``explode`` (the reference's "write to both" fan-out).
* Tag→column pivot (src/postgiswriter.cpp:393-407): declared tag keys
  become real columns, in sorted order (__init__.py:58).
* Residual ``OtherTags`` (src/postgiswriter.cpp:155-188): tags not
  pivoted, as a map column (hstore analog).
* ``z_order`` road ranking and ``minzoom`` CASE-cascade
  (src/postgiswriter.cpp:454-457, 421-424) — pure-Column lookups.
* Negated osm_id for relation-derived polygons
  (src/postgiswriter.cpp:525).

Everything is pure-Column; the explode is the only row-multiplying op.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "route_default",
    "route_extended",
    "resolve_alloc",
    "routing_udf",
    "explode_routes",
    "pivot_tags",
    "other_tags",
    "z_order_col",
    "minzoom_col",
    "signed_osm_id",
    "HIGHWAY_Z_ORDER",
]

GEOM_POINT = "point"
GEOM_LINESTRING = "linestring"
GEOM_SIMPLE_POLYGON = "simple_polygon"
GEOM_COMPLICATED_POLYGON = "complicated_polygon"

# road-importance ranking (the oqt z_order the reference consumes;
# ranks re-derived from the osm2pgsql-compatible ordering)
HIGHWAY_Z_ORDER: dict[str, int] = {
    "motorway": 38,
    "trunk": 37,
    "primary": 36,
    "secondary": 35,
    "tertiary": 34,
    "residential": 33,
    "unclassified": 32,
    "service": 31,
    "track": 30,
    "path": 29,
    "footway": 28,
    "cycleway": 27,
}


def route_default(geom_type: Column) -> Column:
    """default alloc: Point->point, Linestring->line, polygons->polygon."""
    return (
        F.when(geom_type == GEOM_POINT, F.array(F.lit("point")))
        .when(geom_type == GEOM_LINESTRING, F.array(F.lit("line")))
        .otherwise(F.array(F.lit("polygon")))
    )


def route_extended(geom_type: Column, tags: Column, z_order: Column) -> Column:
    """extended alloc truth table (src/postgis_python.cpp:219-269):

    * point -> [point]
    * linestring -> [highway] if z_order non-null else [line]
    * simple_polygon -> [building] if tags['building'] not in
      (null, 'no') else [polygon]
    * complicated_polygon -> [polygon, boundary] if
      tags['type'] = 'boundary'; [building] if building set (and not
      'no'); else [polygon]
    """
    building = F.element_at(tags, "building")
    is_building = building.isNotNull() & (building != "no")
    typ = F.element_at(tags, "type")
    return (
        F.when(geom_type == GEOM_POINT, F.array(F.lit("point")))
        .when(
            geom_type == GEOM_LINESTRING,
            F.when(z_order.isNotNull(), F.array(F.lit("highway"))).otherwise(
                F.array(F.lit("line"))
            ),
        )
        .when(
            geom_type == GEOM_SIMPLE_POLYGON,
            F.when(is_building, F.array(F.lit("building"))).otherwise(
                F.array(F.lit("polygon"))
            ),
        )
        .otherwise(
            F.when(typ == "boundary", F.array(F.lit("polygon"), F.lit("boundary")))
            .when(is_building, F.array(F.lit("building")))
            .otherwise(F.array(F.lit("polygon")))
        )
    )


def routing_udf(fn):
    """Wrap a user row-level routing callback ``fn(geom_type: str,
    tags: dict) -> list[str]`` into an Arrow-batched pandas UDF — the
    Spark twin of the reference's pybind alloc_func hook
    (src/postgis_python.cpp:287-294: an arbitrary Python callable per
    element). Batched transfer, per-row user code — exactly the
    contract the reference gives its callback. Prefer a Column-valued
    alloc (see resolve_alloc) when the rule is expressible in SQL."""

    @F.pandas_udf("array<string>")
    def _route(geom_type: pd.Series, tags: pd.Series) -> pd.Series:
        return pd.Series(
            [fn(g, dict(t) if t is not None else {}) for g, t in zip(geom_type, tags)]
        )

    return _route


def resolve_alloc(alloc):
    """The reference's set_params_alloc_func contract
    (src/postgis_python.cpp:271-296), Spark-shaped. Returns a factory
    ``(geom_type_col, tags_col, z_order_col) -> array<string> Column``:

    * None or "default"  -> route_default
    * "extended"         -> route_extended
    * a callable taking (geom_type, tags, z_order) Columns -> used
      as-is (the fast, JVM-side hook)
    * any other callable -> treated as a row-level Python callback
      ``fn(geom_type, tags_dict) -> list[str]`` via routing_udf
    """
    if alloc is None or alloc == "default":
        return lambda g, t, z: route_default(g)
    if alloc == "extended":
        return lambda g, t, z: route_extended(g, t, z)
    if callable(alloc):
        try:
            import inspect

            n_params = len(inspect.signature(alloc).parameters)
        except (TypeError, ValueError):
            n_params = 2
        if n_params >= 3:
            return lambda g, t, z: alloc(g, t, z)
        udf = routing_udf(alloc)
        return lambda g, t, z: udf(g, t)
    raise ValueError(f"can't resolve alloc func: {alloc!r}")


def explode_routes(df: DataFrame, routes: Column) -> DataFrame:
    """Fan out each row to its target tables (one row per table)."""
    return df.withColumn("table", F.explode(routes))


def pivot_tags(df: DataFrame, keys: list[str], tags_col: str = "tags") -> DataFrame:
    """Pull each declared tag key into its own text column (sorted key
    order, __init__.py:58)."""
    out = df
    for k in sorted(keys):
        out = out.withColumn(k, F.element_at(F.col(tags_col), k))
    return out


def other_tags(tags: Column, pivoted: list[str]) -> Column:
    """Tags not claimed by a pivoted column, as a map (hstore analog)."""
    arr = F.array(*[F.lit(k) for k in sorted(pivoted)])
    return F.map_filter(tags, lambda k, _: ~F.array_contains(arr, k))


def z_order_col(tags: Column) -> Column:
    """Road-importance z_order: lookup on tags['highway'], null when
    the element is not a ranked road."""
    hw = F.element_at(tags, "highway")
    expr: Column = F.lit(None).cast("long")
    for name, rank in HIGHWAY_Z_ORDER.items():
        expr = F.when(hw == name, F.lit(rank).cast("long")).otherwise(expr)
    return expr


def minzoom_col(tags: Column, geom_type: Column, way_area: Column) -> Column:
    """Minimum display zoom — a deterministic CASE-cascade over tag
    values (the reference's style-driven findmz, __init__.py:477):

    * boundaries: admin_level <= 4 -> z2, <= 6 -> z6, else z9
    * ranked roads: motorway/trunk -> z5, primary/secondary -> z8,
      else z12
    * buildings -> z13
    * large polygons (way_area >= 1e10) -> z6, >= 1e8 -> z9
    * everything else -> z14
    """
    hw = F.element_at(tags, "highway")
    admin = F.element_at(tags, "admin_level").cast("long")
    building = F.element_at(tags, "building")
    boundary = F.element_at(tags, "boundary")
    return (
        F.when(
            boundary == "administrative",
            F.when(admin <= 4, F.lit(2))
            .when(admin <= 6, F.lit(6))
            .otherwise(F.lit(9)),
        )
        .when(hw.isin("motorway", "trunk"), F.lit(5))
        .when(hw.isin("primary", "secondary"), F.lit(8))
        .when(hw.isNotNull(), F.lit(12))
        .when(building.isNotNull() & (building != "no"), F.lit(13))
        .when(way_area >= 1e10, F.lit(6))
        .when(way_area >= 1e8, F.lit(9))
        .otherwise(F.lit(14))
        .cast("long")
    )


def signed_osm_id(osm_id: Column, geom_type: Column) -> Column:
    """Relation-derived (complicated) polygons get negated ids
    (src/postgiswriter.cpp:525)."""
    return F.when(
        geom_type == GEOM_COMPLICATED_POLYGON, -osm_id
    ).otherwise(osm_id)


# --- ANSI-SQL twins (DuckDB oracle; scalar columns instead of the map) ------


def sql_z_order(highway: str) -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN cast({v} as bigint)" for k, v in HIGHWAY_Z_ORDER.items()
    )
    return f"(CASE {highway} {whens} ELSE NULL END)"


def sql_minzoom(
    highway: str, building: str, boundary: str, admin_level: str, way_area: str
) -> str:
    return f"""cast(CASE
        WHEN {boundary} = 'administrative' THEN
          (CASE WHEN cast({admin_level} as bigint) <= 4 THEN 2
                WHEN cast({admin_level} as bigint) <= 6 THEN 6
                ELSE 9 END)
        WHEN {highway} IN ('motorway', 'trunk') THEN 5
        WHEN {highway} IN ('primary', 'secondary') THEN 8
        WHEN {highway} IS NOT NULL THEN 12
        WHEN {building} IS NOT NULL AND {building} <> 'no' THEN 13
        WHEN {way_area} >= 1e10 THEN 6
        WHEN {way_area} >= 1e8 THEN 9
        ELSE 14 END as bigint)"""


def sql_route_extended(
    geom_type: str, building: str, type_tag: str, z_order: str
) -> str:
    """List-valued CASE mirroring route_extended (unnest to explode)."""
    return f"""(CASE
        WHEN {geom_type} = 'point' THEN ['point']
        WHEN {geom_type} = 'linestring' THEN
          (CASE WHEN {z_order} IS NOT NULL THEN ['highway'] ELSE ['line'] END)
        WHEN {geom_type} = 'simple_polygon' THEN
          (CASE WHEN {building} IS NOT NULL AND {building} <> 'no'
                THEN ['building'] ELSE ['polygon'] END)
        WHEN {type_tag} = 'boundary' THEN ['polygon', 'boundary']
        WHEN {building} IS NOT NULL AND {building} <> 'no' THEN ['building']
        ELSE ['polygon'] END)"""
