"""Compatibility view layer (SURVEY.md §2.9 D3): the reference's
planet_osm_* views (/root/reference/osmquadtreepostgis/
__init__.py:202-240, 372-380) re-expose routed tables under
osm2pgsql-compatible names — line = line ∪ highway, polygon =
polygon ∪ building, roads = filtered highway ∪ boundary arms, plus
lowzoom filtered views (D2, __init__.py:438-457).

Spark shape: ``createOrReplaceTempView`` over the routed DataFrames —
metadata only; Catalyst pushes view predicates into the scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["register_compat_views"]

ROADS_HIGHWAYS = [
    "motorway",
    "trunk",
    "primary",
    "secondary",
    "tertiary",
    "residential",
    "unclassified",
    "service",
]


def register_compat_views(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    prefix: str = "planet_osm",
    lowzoom: list[int] | None = None,
) -> list[str]:
    """Register the osm2pgsql-compatible view layer over routed output
    tables (keys: point, line, highway, polygon, building, boundary).
    Returns the registered view names."""
    names = []

    def reg(name: str, df: DataFrame):
        df.createOrReplaceTempView(name)
        names.append(name)

    if "point" in tables:
        reg(f"{prefix}_point", tables["point"])
    if "line" in tables or "highway" in tables:
        arms = [t for k, t in tables.items() if k in ("line", "highway")]
        out = arms[0]
        for a in arms[1:]:
            out = out.unionByName(a, allowMissingColumns=True)
        reg(f"{prefix}_line", out)
    if "polygon" in tables or "building" in tables:
        arms = [t for k, t in tables.items() if k in ("polygon", "building")]
        out = arms[0]
        for a in arms[1:]:
            out = out.unionByName(a, allowMissingColumns=True)
        reg(f"{prefix}_polygon", out)
    if "highway" in tables:
        hw = tables["highway"]
        roads = hw.filter(
            F.col("highway").isin(ROADS_HIGHWAYS)
            if "highway" in hw.columns
            else F.lit(True)
        )
        if "boundary" in tables:
            b = tables["boundary"].filter(
                (F.col("osm_id") < 0)
                if "osm_id" in tables["boundary"].columns
                else F.lit(True)
            )
            roads = roads.unionByName(b, allowMissingColumns=True)
        reg(f"{prefix}_roads", roads)
    # lowzoom views: same tables filtered by minzoom (D2). Snapshot the
    # base names first — iterating the live list would nest earlier
    # cutoffs' views (planet_osm_line_lz6_lz10) when lowzoom=[6, 10].
    base_names = list(names)
    for k in lowzoom or []:
        for name in base_names:
            df = spark.table(name)
            if "minzoom" in df.columns:
                reg(f"{name}_lz{k}", df.filter(F.col("minzoom") <= k))
    return names
