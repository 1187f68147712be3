"""Synthetic OSM-element view over the documents table.

The driver's correctness tables have no geometry column, so the
reference-parity operators (routing truth table, tag pivot, z_order,
minzoom — SURVEY.md §2.2) run over a deterministic element synthesis
from ``doc_id``: geometry class, tags, and way_area are pure integer
CASE expressions mirrored exactly in the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["elements_df", "sql_elements_cte"]

_GEOMS = ["point", "linestring", "simple_polygon", "complicated_polygon"]
_HIGHWAYS = ["motorway", "primary", "residential", "footway"]


def elements_df(docs: DataFrame) -> DataFrame:
    """documents -> (osm_id, geom_type, tags map, way_area)."""
    d = F.col("doc_id")
    geom = F.array(*[F.lit(x) for x in _GEOMS])[(d % 4).cast("int")]
    highway = F.when(
        d % 6 < 4, F.array(*[F.lit(x) for x in _HIGHWAYS])[(d % 6).cast("int")]
    )
    building = F.when(d % 7 == 0, F.lit("yes")).when(d % 7 == 1, F.lit("no"))
    is_boundary = d % 5 == 0
    # layer tag on every 3rd element; every 21st is non-numeric so the
    # Layer column source's try_cast-to-long path is exercised
    layer = F.when(
        d % 3 == 0,
        F.when(d % 21 == 0, F.lit("x")).otherwise(((d % 11) - 5).cast("string")),
    )
    tags = F.map_filter(
        F.create_map(
            F.lit("highway"), highway,
            F.lit("building"), building,
            F.lit("type"), F.when(is_boundary, F.lit("boundary")),
            F.lit("boundary"), F.when(is_boundary, F.lit("administrative")),
            F.lit("admin_level"), F.when(is_boundary, (2 + d % 9).cast("string")),
            F.lit("name"), F.concat(F.lit("el"), d.cast("string")),
            F.lit("layer"), layer,
        ),
        lambda k, v: v.isNotNull(),
    )
    return docs.select(
        d.alias("osm_id"),
        geom.alias("geom_type"),
        tags.alias("tags"),
        ((d % 2000) * 1e7).alias("way_area"),
    )


def ways_df(docs: DataFrame) -> DataFrame:
    """Synthetic way topology over documents: every 5th doc is a way
    whose refs are the next 2-5 doc ids (J1/J3 join inputs)."""
    d = F.col("doc_id")
    refs = F.transform(F.sequence(F.lit(1), (2 + d % 4).cast("int")), lambda i: d + i)
    el = elements_df(docs.filter(d % 5 == 0))
    return (
        docs.filter(d % 5 == 0)
        .select(d.alias("way_id"), refs.alias("refs"))
        .join(el.select(F.col("osm_id").alias("way_id"), "tags"), "way_id")
    )


def sql_ways_exploded_cte() -> str:
    """DuckDB twin of ways_df, pre-exploded: (way_id, pos, node_id,
    highway)."""
    return """
        SELECT doc_id AS way_id,
               unnest(range(1, 2 + doc_id % 4 + 1)) AS pos,
               doc_id + unnest(range(1, 2 + doc_id % 4 + 1)) AS node_id,
               CASE WHEN doc_id % 6 < 4
                    THEN (['motorway', 'primary', 'residential',
                           'footway'])[cast(doc_id % 6 as int) + 1] END AS highway
        FROM documents WHERE doc_id % 5 = 0
    """


def sql_elements_cte() -> str:
    """DuckDB CTE body producing the same element scalars (tags kept
    as individual columns — the oracle never needs the map shape)."""
    geoms = ", ".join(f"'{x}'" for x in _GEOMS)
    hws = ", ".join(f"'{x}'" for x in _HIGHWAYS)
    return f"""
        SELECT
          doc_id AS osm_id,
          ([{geoms}])[cast(doc_id % 4 as int) + 1] AS geom_type,
          CASE WHEN doc_id % 6 < 4
               THEN ([{hws}])[cast(doc_id % 6 as int) + 1] END AS highway,
          CASE WHEN doc_id % 7 = 0 THEN 'yes'
               WHEN doc_id % 7 = 1 THEN 'no' END AS building,
          CASE WHEN doc_id % 5 = 0 THEN 'boundary' END AS type_tag,
          CASE WHEN doc_id % 5 = 0 THEN 'administrative' END AS boundary,
          CASE WHEN doc_id % 5 = 0
               THEN cast(2 + doc_id % 9 as varchar) END AS admin_level,
          'el' || cast(doc_id as varchar) AS name,
          CASE WHEN doc_id % 3 = 0 THEN
            (CASE WHEN doc_id % 21 = 0 THEN 'x'
                  ELSE cast(doc_id % 11 - 5 as varchar) END) END AS layer_tag,
          (doc_id % 2000) * 1e7 AS way_area
        FROM documents
    """
