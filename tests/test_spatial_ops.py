"""Spatial operator property tests: PIP joins vs brute force (incl.
concave/holed polygons), grid kNN vs exact, IVF ANN recall,
pip_join_broadcast == pip_join_shuffle."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark import geom as g
from osmquadtreepostgis_spark.operators.knn import (
    ann_cosine_ivf,
    ann_cosine_topk,
    knn_exact,
    knn_grid,
)
from osmquadtreepostgis_spark.operators.pip import (
    PolygonIndex,
    pip_join_broadcast,
    pip_join_shuffle,
)
from osmquadtreepostgis_spark.sources import fixtures


@pytest.fixture(scope="module")
def points_pdf():
    rng = np.random.default_rng(21)
    return pd.DataFrame(
        {
            "pt_id": np.arange(4000),
            "lon": rng.uniform(-179.9, 179.9, 4000),
            "lat": rng.uniform(-84.9, 84.9, 4000),
        }
    )


def _brute_force_hits(points_pdf, polys):
    rows = []
    for p in polys:
        inside = g.points_in_polygon(
            points_pdf["lon"].to_numpy(), points_pdf["lat"].to_numpy(), p["rings"]
        )
        for pid in points_pdf["pt_id"].to_numpy()[inside]:
            rows.append((int(pid), int(p["poly_id"])))
    return sorted(rows)


def test_pip_broadcast_matches_brute_force_complex(spark, points_pdf):
    """Concave + holed polygons — not oracle-expressible, pinned here."""
    polys_df = fixtures.polygons_df(spark, include_complex=True)
    idx = PolygonIndex.from_polygons_df(polys_df, depth=6)
    got = sorted(
        (int(r["pt_id"]), int(r["poly_id"]))
        for r in pip_join_broadcast(spark.createDataFrame(points_pdf), idx)
        .select("pt_id", "poly_id")
        .collect()
    )
    # brute force over the same polygon set (rings in lon/lat)
    polys = []
    for rec in fixtures.box_records():
        ring = np.array(
            [
                [rec["xmin"], rec["ymin"]],
                [rec["xmax"], rec["ymin"]],
                [rec["xmax"], rec["ymax"]],
                [rec["xmin"], rec["ymax"]],
            ]
        )
        polys.append({"poly_id": rec["poly_id"], "rings": [ring]})
    polys += fixtures.complex_polygons()
    want = _brute_force_hits(points_pdf, polys)
    assert got == want


def test_pip_shuffle_equals_broadcast(spark, points_pdf):
    polys_df = fixtures.polygons_df(spark, include_complex=True)
    idx = PolygonIndex.from_polygons_df(polys_df, depth=6)
    pts = spark.createDataFrame(points_pdf)
    a = sorted(
        (int(r["pt_id"]), int(r["poly_id"]))
        for r in pip_join_broadcast(pts, idx).select("pt_id", "poly_id").collect()
    )
    b = sorted(
        (int(r["pt_id"]), int(r["poly_id"]))
        for r in pip_join_shuffle(pts, polys_df, depth=6)
        .select("pt_id", "poly_id")
        .collect()
    )
    assert a == b


def test_knn_grid_equals_exact_when_radius_bounded(spark):
    """Clustered points: when all true neighbors lie within the 3x3
    neighbor ring at the chosen depth, grid kNN == exact kNN."""
    rng = np.random.default_rng(33)
    # tight clusters around 20 centers; queries at the centers
    centers = np.c_[rng.uniform(-170, 170, 20), rng.uniform(-75, 75, 20)]
    pts = []
    for i, (cx, cy) in enumerate(centers):
        pts.append(
            np.c_[
                np.full(40, 0) + rng.normal(cx, 0.05, 40),
                rng.normal(cy, 0.05, 40),
            ]
        )
    pts = np.vstack(pts)
    points = spark.createDataFrame(
        pd.DataFrame({"p_id": np.arange(len(pts)), "lon": pts[:, 0], "lat": pts[:, 1]})
    )
    queries = spark.createDataFrame(
        pd.DataFrame(
            {"q_id": np.arange(20), "q_lon": centers[:, 0], "q_lat": centers[:, 1]}
        )
    )
    # depth 8 cell ~0.7 degrees >> cluster radius
    a = knn_exact(queries, points, k=5).select("q_id", "p_id", "rank").collect()
    b = knn_grid(queries, points, k=5, depth=8).select("q_id", "p_id", "rank").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ann_ivf_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {
        (r["q_id"], r["vec_id"])
        for r in ann_cosine_topk(emb, q, k=10).collect()
    }
    approx = {
        (r["q_id"], r["vec_id"])
        for r in ann_cosine_ivf(emb, q, k=10, n_anchors=16, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
