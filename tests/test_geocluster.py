"""Grid-blocked epsilon-ball spatial clustering (operators/geocluster.py).

Pins: (1) edge set == brute-force all-pairs distance test, each pair
exactly once; (2) cluster labels == numpy union-find transitive
closure (component-min ids); (3) singleton handling; (4) the physical
plan joins on the grid key — no cartesian / broadcast-nested-loop.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.operators.geocluster import (
    epsilon_edges,
    spatial_cluster,
)


def _points_df(spark, n=300, seed=7):
    rng = np.random.RandomState(seed)
    lon = rng.uniform(-180, 180, n).round(6)
    lat = rng.uniform(-85, 85, n).round(6)
    rows = [(int(i), float(lon[i]), float(lat[i])) for i in range(n)]
    return (
        spark.createDataFrame(rows, "doc_id long, lon double, lat double"),
        lon,
        lat,
    )


def _brute_edges(lon, lat, eps):
    n = len(lon)
    dx = lon[:, None] - lon[None, :]
    dy = lat[:, None] - lat[None, :]
    close = (dx * dx + dy * dy) <= eps * eps
    ia, ib = np.where(np.triu(close, k=1))
    return set(zip(ia.tolist(), ib.tolist()))


def _brute_labels(n, edges):
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n)}


@pytest.mark.parametrize("eps", [4.0, 12.0])
def test_edges_match_brute_force_exactly_once(spark, eps):
    df, lon, lat = _points_df(spark)
    got = epsilon_edges(df, eps).collect()
    pairs = [(r.id_a, r.id_b) for r in got]
    # exactly once: no duplicate emission from the 3x3 explode
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == _brute_edges(lon, lat, eps)


def test_labels_match_union_find(spark):
    df, lon, lat = _points_df(spark)
    eps = 8.0
    out = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in spatial_cluster(df, eps).collect()
    }
    want = _brute_labels(len(lon), _brute_edges(lon, lat, eps))
    sizes = {}
    for _, root in want.items():
        sizes[root] = sizes.get(root, 0) + 1
    assert len(out) == len(lon)
    for i, root in want.items():
        assert out[i] == (root, sizes[root]), i


def test_singletons_keep_own_id(spark):
    # 3 points pairwise > eps apart: every one is its own cluster
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 50.0, 0.0), (3, 0.0, 50.0)],
        "doc_id long, lon double, lat double",
    )
    rows = sorted(spatial_cluster(df, 1.0).collect())
    assert [(r.cluster_id, r.cluster_size) for r in rows] == [
        (1, 1),
        (2, 1),
        (3, 1),
    ]


def test_chain_transitivity(spark):
    # a-b-c chain where a-c alone is out of range: one cluster of 3
    df = spark.createDataFrame(
        [(10, 0.0, 0.0), (11, 0.9, 0.0), (12, 1.8, 0.0), (13, 30.0, 30.0)],
        "doc_id long, lon double, lat double",
    )
    out = {r.doc_id: (r.cluster_id, r.cluster_size) for r in
           spatial_cluster(df, 1.0).collect()}
    assert out == {10: (10, 3), 11: (10, 3), 12: (10, 3), 13: (13, 1)}


def test_edge_plan_is_grid_hash_join(spark):
    df, _, _ = _points_df(spark, n=50)
    plan = epsilon_edges(df, 5.0)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
