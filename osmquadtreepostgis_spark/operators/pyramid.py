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

__all__ = ["lowzoom_level", "build_pyramid", "DEFAULT_LEVELS"]


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
