"""Tile pyramid: minzoom-filtered, simplified low-zoom materializations.

The reference's create_tables_lowzoom / create_views_lowzoom
(/root/reference/osmquadtreepostgis/__init__.py:382-457; invoked with
levels (6, simp=612), 9, 11 at :510-512): per level, filter
``minzoom <= K``, simplify geometry with a tolerance in mercator
metres (points exempt), re-key tiles at the level's depth.

Spark shape: each level is a filtered projection of the SAME source
DataFrame — Catalyst prunes and pushes the minzoom predicate to the
scan; materialized levels are parquet writes clustered by tile
(``repartitionByRange`` so file min/max statistics give partition
pruning on tile ranges — the gist-index replacement, SURVEY.md §2.9 D4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import cell_parent_col
from ..functions.geometry import wkb_simplify_udf

# (minzoom cutoff, simplify tolerance in mercator metres or None)
DEFAULT_LEVELS = [(6, 612.0), (9, None), (11, None)]

__all__ = [
    "lowzoom_level",
    "build_pyramid",
    "rasterize_points",
    "vectorize_cells",
    "DEFAULT_LEVELS",
]


def lowzoom_level(
    df: DataFrame,
    minzoom_cutoff: int,
    simplify_tol: float | None = None,
    geom_col: str = "way",
    minzoom_col: str = "minzoom",
    cell_col: str = "quadtree",
) -> DataFrame:
    """One pyramid level: minzoom filter (+ optional simplify) +
    level tile key."""
    out = df.filter(F.col(minzoom_col) <= minzoom_cutoff)
    if simplify_tol is not None and geom_col in df.columns:
        simp = wkb_simplify_udf(simplify_tol)
        out = out.withColumn(geom_col, simp(F.col(geom_col)))
    if cell_col in df.columns:
        out = out.withColumn(
            "lz_tile", cell_parent_col(cell_col, min(minzoom_cutoff, 20))
        )
    return out


def rasterize_points(
    df: DataFrame,
    depth: int,
    lon: str = "lon",
    lat: str = "lat",
    weight: str | None = None,
) -> DataFrame:
    """Points -> per-cell raster at ``depth``: (cell, n[, w]) — the
    raster half of the north rule's raster<->vector tile aggregation.
    Fully JVM (generated-SQL cell encode, hash aggregate with map-side
    partials); the shuffle key is the cell id."""
    from .. import quadtree as qt

    enc = df.withColumn("cell", F.expr(qt.sql_point_to_cell(lon, lat, depth)))
    aggs = [F.count(F.lit(1)).alias("n")]
    if weight is not None:
        aggs.append(F.sum(weight).alias("w"))
    return enc.groupBy("cell").agg(*aggs)


def vectorize_cells(
    df: DataFrame,
    depth: int,
    cell_col: str = "cell",
    min_count: int | None = None,
    geometry: bool = False,
) -> DataFrame:
    """Raster -> vector: each (thresholded) cell becomes its bounding
    box — x/y via the closed-form magic-mask Morton COMPRESS (pure JVM
    bit math, whole-stage codegen), lon bounds linear in x, v bounds
    exact dyadic rationals y/2^depth (both bit-identical across
    engines, which is what makes the oracle compare exact). With
    ``geometry`` a mercator EWKB box rides along (wkb column, not
    oracle-compared — trig at the export boundary only)."""
    from .. import quadtree as qt

    out = df
    if min_count is not None:
        out = out.filter(F.col("n") >= min_count)
    xe, ye = qt.sql_cell_to_xy(cell_col, depth)
    n = 1 << depth
    out = (
        out.withColumn("x", F.expr(xe))
        .withColumn("y", F.expr(ye))
        .withColumn("lon_min", F.col("x") / n * 360.0 - 180.0)
        .withColumn("lon_max", (F.col("x") + 1) / n * 360.0 - 180.0)
        .withColumn("v_min", F.col("y") / F.lit(float(n)))
        .withColumn("v_max", (F.col("y") + 1) / F.lit(float(n)))
    )
    if geometry:
        import math

        from ..functions.geometry import bbox_to_wkb_udf

        pi = F.lit(math.pi)
        lat_hi = F.degrees(F.atan(F.sinh(pi * (1 - 2 * F.col("v_min")))))
        lat_lo = F.degrees(F.atan(F.sinh(pi * (1 - 2 * F.col("v_max")))))
        out = out.withColumn(
            "way",
            bbox_to_wkb_udf()(
                F.col("lon_min"), lat_lo, F.col("lon_max"), lat_hi
            ),
        )
    return out


def build_pyramid(
    df: DataFrame,
    levels: list[tuple[int, float | None]] | None = None,
    out_dir: str | None = None,
    **kw,
) -> dict[int, DataFrame]:
    """All levels; optionally materialized as tile-range-clustered
    parquet (``{out_dir}/lz{K}``)."""
    out = {}
    for cutoff, tol in levels or DEFAULT_LEVELS:
        lvl = lowzoom_level(df, cutoff, tol, **kw)
        if out_dir:
            (
                lvl.repartitionByRange("lz_tile")
                .write.mode("overwrite")
                .parquet(f"{out_dir}/lz{cutoff}")
            )
        out[cutoff] = lvl
    return out
