"""Geometry-assembly joins — the oqt pipeline stages re-expressed
relationally (SURVEY.md §2.3 J1-J3; reference evidence: `addwns`
way-node resolution src/processpostgis.cpp:138-143, `MultiPolygons` /
`AddParentTags` stages docs/output.txt:21-23).

* ``assemble_ways``: node->way coordinate join — explode refs, equi
  join on node id (sort-merge at scale), order-preserving regroup.
* ``assemble_multipolygons``: relation->member rings -> per-part
  polygons with areas (ring chaining in a pandas UDF when rings
  arrive unclosed).
* ``propagate_parent_tags``: child nodes inherit the best parent
  way's tag (priority = road rank) — the ``parent_highway`` column
  (docs/output.txt:4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import geom as g

__all__ = ["assemble_ways", "assemble_multipolygons", "propagate_parent_tags"]


def assemble_ways(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """ways(way_id, refs: array<long>) x nodes(node_id, lon, lat) ->
    (way_id, n_pts, length_m): ordered coordinate resolution + planar
    mercator length rounded 1dp (src/postgiswriter.cpp:892-894).

    Pure-Column: posexplode -> join -> window-lag segment length ->
    sum. The join shuffles on node_id (sort-merge); the regroup
    shuffles on way_id — both explicit spatial-free equi keys.
    """
    ex = ways.select("way_id", F.posexplode("refs").alias("pos", "node_id"))
    j = ex.join(nodes, "node_id")
    # mercator transform JVM-side (pure math expressions)
    x = F.lit(6378137.0) * F.radians("lon")
    y = F.lit(6378137.0) * F.log(
        F.tan(F.lit(np.pi / 4.0) + F.radians("lat") / F.lit(2.0))
    )
    w = Window.partitionBy("way_id").orderBy("pos")
    seg = F.sqrt(
        F.pow(x - F.lag(x).over(w), 2) + F.pow(y - F.lag(y).over(w), 2)
    )
    return (
        j.withColumn("seg", seg)
        .groupBy("way_id")
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.round(F.coalesce(F.sum("seg"), F.lit(0.0)), 1).alias("length_m"),
        )
    )


_MP_SCHEMA = T.StructType(
    [
        T.StructField("rel_id", T.LongType()),
        T.StructField("part", T.LongType()),
        T.StructField("way", T.BinaryType()),
        T.StructField("way_area", T.DoubleType()),
    ]
)


def assemble_multipolygons(members: DataFrame, round_2dp: bool = False) -> DataFrame:
    """members(rel_id, way_id, role, coords array<struct<lon,lat>>) ->
    one row per multipolygon part: (rel_id, part, way WKB, way_area).

    Ring chaining (joining unclosed member ways end-to-end) happens in
    an applyInPandas over each relation — the reference's
    MultiPolygons stage (single-threaded there, docs/output.txt:75;
    parallel by rel_id here). Inner rings (role='inner') are attached
    to the part whose outer ring contains them.
    """

    def _build_rel(rel_id: int, mrows) -> list[tuple]:
        outers, inners = [], []
        for row in mrows:
            ring = np.array([[c["lon"], c["lat"]] for c in row["coords"]])
            xs, ys = g.merc_forward(ring[:, 0], ring[:, 1], round_2dp)
            ring = np.c_[xs, ys]
            (inners if row["role"] == "inner" else outers).append(ring)
        outers = _chain_rings(outers)
        inners = _chain_rings(inners)
        rows = []
        for p, outer in enumerate(
            sorted(outers, key=lambda r: (r[:, 0].min(), r[:, 1].min()))
        ):
            holes = [
                h
                for h in inners
                if g.points_in_polygon(h[:1, 0], h[:1, 1], [outer])[0]
            ]
            rings = g.normalize_ring_orientation([outer] + holes)
            coords = np.vstack(rings)
            offs = np.cumsum([0] + [len(r) for r in rings])
            rows.append(
                (
                    rel_id,
                    p,
                    g.wkb_polygon(rings),
                    float(g.round1_half_away(g.polygon_area(coords, offs))),
                )
            )
        return rows

    def build_batches(pdfs):
        for pdf in pdfs:
            rows: list[tuple] = []
            for rel_id, mrows in zip(pdf["rel_id"], pdf["__members"]):
                rows.extend(_build_rel(int(rel_id), mrows))
            yield pd.DataFrame(
                rows, columns=["rel_id", "part", "way", "way_area"]
            )

    # r6: one collect_list aggregate per relation + a mapInPandas over
    # whole Arrow batches, replacing groupBy().applyInPandas — the
    # per-GROUP pandas DataFrame construction dominated wall time at
    # dimension-table group sizes (~2 members/relation: measured 27 s
    # for 7.1k relations at sf1.0, ~4 ms fixed cost per group; guide
    # §4.5 — amortize per-task/per-group setup). Member order is
    # pinned by array_sort over (way_id, role, coords) — the old
    # per-group sort keyed on way_id alone with arbitrary tie order,
    # so the sorted-struct order is deterministic for every input the
    # old order was.
    agg = members.groupBy("rel_id").agg(
        F.array_sort(
            F.collect_list(F.struct("way_id", "role", "coords"))
        ).alias("__members")
    )
    return agg.mapInPandas(build_batches, _MP_SCHEMA)


def _chain_rings(segments: list[np.ndarray]) -> list[np.ndarray]:
    """Join unclosed segments end-to-end into closed rings."""
    closed, open_segs = [], []
    for s in segments:
        (closed if len(s) >= 4 and (s[0] == s[-1]).all() else open_segs).append(s)
    while open_segs:
        ring = open_segs.pop(0)
        progress = True
        while progress and not (ring[0] == ring[-1]).all():
            progress = False
            for i, s in enumerate(open_segs):
                if (s[0] == ring[-1]).all():
                    ring = np.vstack([ring, s[1:]])
                elif (s[-1] == ring[-1]).all():
                    ring = np.vstack([ring, s[::-1][1:]])
                else:
                    continue
                open_segs.pop(i)
                progress = True
                break
        if not (ring[0] == ring[-1]).all():
            ring = np.vstack([ring, ring[:1]])  # force-close broken rings
        closed.append(ring)
    return closed


def propagate_parent_tags(
    nodes: DataFrame, ways: DataFrame, tag: str = "highway"
) -> DataFrame:
    """Child nodes inherit the highest-priority containing way's tag
    (AddParentTags, docs/output.txt:23). Priority: z_order desc, then
    way_id asc for determinism. Output: (node_id, parent_<tag>)."""
    from .routing import z_order_col

    ex = ways.select(
        F.col("way_id"),
        F.element_at("tags", tag).alias("__tagv"),
        z_order_col(F.col("tags")).alias("__zo"),
        F.explode("refs").alias("node_id"),
    ).filter(F.col("__tagv").isNotNull())
    w = Window.partitionBy("node_id").orderBy(
        F.col("__zo").desc_nulls_last(), F.col("way_id").asc()
    )
    best = (
        ex.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("node_id", F.col("__tagv").alias(f"parent_{tag}"))
    )
    return nodes.join(best, "node_id", "left").select(
        "node_id", f"parent_{tag}"
    )
