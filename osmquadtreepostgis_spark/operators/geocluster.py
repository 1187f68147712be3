"""Grid-blocked epsilon-ball spatial clustering (DBSCAN's connectivity
core, minPts=1) — density clustering of point sets at web scale.

Reference parity: the reference clusters geometries only implicitly
(quadtree cells group nearby rows — src/sortblocks.cpp's cell
assignment); this operator is the explicit form a Common-Crawl
geo-entity pipeline needs: collapse the cloud of mined mentions around
a venue/city into one canonical cluster before tile aggregation.

Scale shape
-----------
Naive epsilon-ball clustering is an all-pairs O(n²) join.  This
operator is never all-pairs:

1. **Grid blocking**: each point lands in an (eps × eps) grid cell
   (two integer floors — pure Column, no shuffle).  A pair within
   ``eps`` differs by at most 1 in each cell axis, so candidate pairs
   come from a 3×3-neighborhood equi-join: the LEFT side explodes each
   point to its 9 neighbor cells, the RIGHT side keeps its home cell,
   and the join key is the cell id — a plain shuffled hash join on a
   composite int key, AQE-splittable when an urban cell is hot.
   Each unordered pair is matched EXACTLY once (the right point's home
   cell is unique, and ``id_a < id_b`` halves the symmetric matches),
   so no distinct/dedup shuffle is needed on the edge list.
2. **Exact refine**: the squared Euclidean test runs only on
   neighbor-cell candidates (cover-then-refine, same discipline as the
   cell-cover PIP join in operators/pip.py).
3. **Logarithmic clustering**: edges feed
   :func:`..operators.cluster.connected_components` (alternating
   large-star/small-star, O(log n) rounds, one tiny fingerprint action
   per round) — identical machinery to the dedup clusterer, so the
   100 TB argument is shared: no component is ever materialized on one
   task, labels are min-ids, convergence is fingerprint-checked.

At 10^12 points the dominant cost is the single candidate-pair shuffle,
bounded by grid occupancy (density × eps²) per cell, not by n².

Determinism: distances are plain IEEE double expressions with the same
shape in the DuckDB oracle twin, so the edge set — and therefore the
labeling — is bit-stable across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cluster import connected_components

__all__ = ["epsilon_edges", "spatial_cluster", "sql_epsilon_edges"]


def epsilon_edges(
    points: DataFrame,
    eps: float,
    id_col: str = "doc_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Unordered pairs (id_a < id_b) at squared Euclidean degree
    distance <= eps² — each pair emitted exactly once, candidates from
    the 3×3 grid-neighborhood join (never all pairs)."""
    base = points.select(
        F.col(id_col).alias("id"), F.col(lon).alias("x"), F.col(lat).alias("y")
    )
    cx = F.floor(F.col("x") / F.lit(float(eps)))
    cy = F.floor(F.col("y") / F.lit(float(eps)))
    # left: explode to the 9 neighbor cells of the point's home cell
    left = (
        base.select("id", "x", "y", cx.alias("cx"), cy.alias("cy"))
        .withColumn("dx", F.expr("explode(array(-1,0,1))"))
        .withColumn("dy", F.expr("explode(array(-1,0,1))"))
        .select(
            F.col("id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("cx") + F.col("dx")).alias("gx"),
            (F.col("cy") + F.col("dy")).alias("gy"),
        )
    )
    right = base.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        cx.alias("gx"),
        cy.alias("gy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        left.join(right, ["gx", "gy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(d2 <= F.lit(float(eps) * float(eps)))
        .select("id_a", "id_b")
    )


def spatial_cluster(
    points: DataFrame,
    eps: float,
    id_col: str = "doc_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """(id, cluster_id, cluster_size) — cluster_id is the minimum point
    id reachable through the eps-ball graph; isolated points keep their
    own id with cluster_size 1 (DBSCAN with minPts=1: no noise class,
    every point belongs somewhere — the right semantics for canonical
    entity collapse, where a lone mention IS its own entity)."""
    edges = epsilon_edges(points, eps, id_col=id_col, lon=lon, lat=lat)
    labels = connected_components(edges, id_a="id_a", id_b="id_b")
    ids = points.select(F.col(id_col).alias("node"))
    labeled = ids.join(labels, "node", "left").select(
        F.col("node").alias(id_col),
        F.coalesce("component", "node").alias("cluster_id"),
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labeled.join(sizes, "cluster_id").select(
        id_col, "cluster_id", "cluster_size"
    )


def sql_epsilon_edges(
    points_sql: str, eps: float, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`epsilon_edges` over a subquery exposing
    (id_col, lon, lat): the oracle uses a bbox prefilter instead of the
    grid join (same pair set — the squared test is the decider)."""
    e = float(eps)
    return f"""
        SELECT a.{id_col} AS id_a, b.{id_col} AS id_b
        FROM ({points_sql}) a JOIN ({points_sql}) b
          ON a.{id_col} < b.{id_col}
         AND abs(a.lon - b.lon) <= {e!r}
         AND abs(a.lat - b.lat) <= {e!r}
        WHERE (a.lon - b.lon) * (a.lon - b.lon)
            + (a.lat - b.lat) * (a.lat - b.lat) <= {e * e!r}
    """
