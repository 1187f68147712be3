"""SQL ``ST_*`` surface: the engine's operators as Spark SQL
functions, so `spark.sql("SELECT st_point_to_cell(lon, lat, 18) …")`
works without touching the DataFrame API (SURVEY §7.3's "optional SQL
surface" — the reference's users drive everything through SQL views,
/root/reference/osmquadtreepostgis/__init__.py:202-240).

Everything here is a **SQL scalar function** (``CREATE TEMPORARY
FUNCTION … RETURN <expr>``) — the bodies are pure Catalyst expressions
(bit math / trig / higher-order array ops), so calls inline into
whole-stage codegen: no Python on any hot path, unlike
``spark.udf.register``-style Python UDFs.

The variable-depth cell encode uses the closed-form magic-mask bit
interleave (the standard Morton spread: x|x<<16 &m16, … x|x<<1 &m1),
which is depth-independent — property-tested against the numpy
kernels in tests/test_sql_surface.py across depths and the lon/lat
domain, including the clamp edges.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .. import quadtree as qt
from ..operators.routing import sql_minzoom, sql_z_order

__all__ = ["register_sql_functions", "ST_FUNCTIONS"]

_M = {
    16: "281470681808895",      # 0x0000FFFF0000FFFF
    8: "71777214294589695",     # 0x00FF00FF00FF00FF
    4: "1085102592571150095",   # 0x0F0F0F0F0F0F0F0F
    2: "3689348814741910323",   # 0x3333333333333333
    1: "6148914691236517205",   # 0x5555555555555555
}


def _spread(v: str) -> str:
    """Closed-form Morton spread of a <=32-bit value into even bits."""
    e = f"(({v}) & 4294967295)"
    for s in (16, 8, 4, 2, 1):
        e = f"((({e}) | ({e}) << {s}) & {_M[s]})"
    return e


def _sql_point_to_cell_var(lon: str, lat: str, depth: str) -> str:
    """Variable-depth point->cell (same math as qt.sql_point_to_cell,
    with the magic-mask interleave instead of per-bit terms)."""
    maxlat = repr(qt.MERC_MAX_LAT)
    latc = f"least(greatest(({lat}), -{maxlat}), {maxlat})"
    u = f"((({lon}) + 180.0) / 360.0)"
    v = f"((1.0 - ln(tan(pi()/4.0 + radians({latc})/2.0))/pi()) / 2.0)"
    n = f"(cast(1 as bigint) << ({depth}))"
    x = f"least(greatest(cast(floor({u} * {n}) as bigint), 0), {n} - 1)"
    y = f"least(greatest(cast(floor({v} * {n}) as bigint), 0), {n} - 1)"
    morton = f"({_spread(x)} | ({_spread(y)} << 1))"
    shift = f"(2 * ({qt.MAX_DEPTH} - ({depth})) + {qt.DEPTH_BITS})"
    return f"(({morton} << {shift}) | ({depth}))"


def _defs() -> dict[str, str]:
    depth_of = f"(cell & {(1 << qt.DEPTH_BITS) - 1})"
    keep = f"(2 * ({qt.MAX_DEPTH} - depth))"
    parent = (
        f"((((cell >> {qt.DEPTH_BITS}) >> {keep}) << {keep}"
        f" << {qt.DEPTH_BITS}) | depth)"
    )
    hstore = (
        "array_join(transform(sort_array(map_entries(m)), e -> concat("
        "'\"', replace(replace(e.key, '\\\\', '\\\\\\\\'), '\"', '\\\\\"'),"
        "'\"=>\"', replace(replace(e.value, '\\\\', '\\\\\\\\'), '\"', '\\\\\"'),"
        "'\"')), ', ')"
    )
    return {
        "st_cell_depth(cell BIGINT) RETURNS BIGINT": depth_of,
        "st_cell_parent(cell BIGINT, depth BIGINT) RETURNS BIGINT": parent,
        # depth-guarded tile (catalog partition label semantics)
        "st_cell_tile(cell BIGINT, depth BIGINT) RETURNS BIGINT": (
            f"CASE WHEN {depth_of} >= depth THEN {parent} ELSE cell END"
        ),
        "st_point_to_cell(lon DOUBLE, lat DOUBLE, depth BIGINT)"
        " RETURNS BIGINT": _sql_point_to_cell_var("lon", "lat", "depth"),
        "st_z_order(highway STRING) RETURNS BIGINT": sql_z_order("highway"),
        "st_minzoom(highway STRING, building STRING, boundary STRING,"
        " admin_level STRING, way_area DOUBLE) RETURNS BIGINT": sql_minzoom(
            "highway", "building", "boundary", "admin_level", "way_area"
        ),
        "st_hstore(m MAP<STRING, STRING>) RETURNS STRING": hstore,
    }


ST_FUNCTIONS = sorted(sig.split("(")[0] for sig in _defs())


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the ST_* SQL functions on the session; returns names."""
    for sig, body in _defs().items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {sig} RETURN {body}")
    return ST_FUNCTIONS
