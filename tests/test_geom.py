"""Geometry kernel tests: closed-form values + WKB round-trips."""

import numpy as np
import pytest

from osmquadtreepostgis_spark import geom as g


def test_merc_forward_closed_form():
    x, y = g.merc_forward(np.array([0.0, 180.0, -180.0]), np.array([0.0, 0.0, 0.0]))
    assert x[0] == 0.0 and y[0] == 0.0
    assert x[1] == pytest.approx(20037508.342789244)
    assert x[2] == pytest.approx(-20037508.342789244)
    # mercator square: y at MERC_MAX_LAT == x at 180
    _, ymax = g.merc_forward(np.array([0.0]), np.array([85.0511287798066]))
    assert ymax[0] == pytest.approx(20037508.342789244, rel=1e-9)
    # 2dp rounding mode
    x2, _ = g.merc_forward(np.array([1.23456789]), np.array([0.0]), round_2dp=True)
    assert x2[0] == round(x2[0], 2)
    # round trip
    lon, lat = g.merc_inverse(*g.merc_forward(np.array([12.3]), np.array([45.6])))
    assert lon[0] == pytest.approx(12.3) and lat[0] == pytest.approx(45.6)


def test_line_length_ragged():
    coords = np.array([[0, 0], [3, 4], [3, 4], [0, 0], [10, 0], [10, 10]], float)
    offsets = np.array([0, 2, 6])
    ln = g.line_length(coords, offsets)
    assert ln.tolist() == [5.0, 25.0]


def test_ring_area_and_polygon_area():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    off = np.array([0, 5])
    assert g.ring_area(sq, off)[0] == 100.0  # CCW positive
    assert g.ring_area(sq[::-1].copy(), off)[0] == -100.0
    # unclosed ring gets the wrap term
    assert g.ring_area(sq[:-1], np.array([0, 4]))[0] == 100.0
    hole = np.array([[2, 2], [2, 4], [4, 4], [4, 2], [2, 2]], float)  # CW
    assert g.polygon_area(np.vstack([sq, hole]), np.array([0, 5, 10])) == 96.0


def test_wkb_point_roundtrip_and_bytes():
    b = g.wkb_point(1.0, 2.0)
    # XDR, SRID flag, srid 3857
    assert b[0] == 0
    assert b[1:5] == bytes.fromhex("20000001")
    assert b[5:9] == (3857).to_bytes(4, "big")
    gt, srid, p = g.parse_wkb(b)
    assert (gt, srid) == (1, 3857) and p.tolist() == [1.0, 2.0]
    # hex form is uppercase-insensitive standard
    assert b.hex().startswith("0020000001")


def test_wkb_linestring_polygon_multipolygon_roundtrip():
    line = np.array([[0, 0], [1, 1], [2, 0]], float)
    gt, srid, p = g.parse_wkb(g.wkb_linestring(line))
    assert gt == 2 and np.array_equal(p, line)

    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    hole = np.array([[2, 2], [2, 4], [4, 4], [4, 2]], float)
    gt, srid, rings = g.parse_wkb(g.wkb_polygon([outer, hole]))
    assert gt == 3 and len(rings) == 2
    assert np.array_equal(rings[0][:-1], outer)  # closed on write
    assert np.array_equal(rings[0][0], rings[0][-1])

    mp = g.wkb_multipolygon([[outer], [hole]])
    gt, srid, polys = g.parse_wkb(mp)
    assert gt == 6 and len(polys) == 2 and len(polys[0]) == 1


def test_pip_rectangle_half_open_convention():
    rect = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    px = np.array([5.0, 0.0, 10.0, 5.0, 5.0, -1.0])
    py = np.array([5.0, 5.0, 5.0, 0.0, 10.0, 5.0])
    got = g.point_in_ring(px, py, rect)
    # frozen: x in [0,10), y in [0,10)
    assert got.tolist() == [True, True, False, True, False, False]


def test_pip_with_hole_and_concave():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6]], float)
    inside = g.points_in_polygon(
        np.array([5.0, 1.0]), np.array([5.0, 1.0]), [outer, hole]
    )
    assert inside.tolist() == [False, True]
    # concave L-shape
    L = np.array([[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]], float)
    got = g.points_in_polygon(np.array([8.0, 8.0]), np.array([2.0, 8.0]), [L])
    assert got.tolist() == [True, False]


def test_pip_brute_force_property():
    # random convex polygon: PIP == half-plane intersection test
    rng = np.random.default_rng(4)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 12))
    poly = np.c_[np.cos(ang), np.sin(ang)] * 10.0
    px = rng.uniform(-12, 12, 500)
    py = rng.uniform(-12, 12, 500)
    got = g.points_in_polygon(px, py, [poly])
    # half-plane test (CCW polygon): strictly-inside vs got must agree
    # except measure-zero boundary points
    closed = np.vstack([poly, poly[:1]])
    cross = np.ones(500, dtype=bool)
    for i in range(len(poly)):
        a, b = closed[i], closed[i + 1]
        cross &= (b[0] - a[0]) * (py - a[1]) - (b[1] - a[1]) * (px - a[0]) > 0
    assert (got == cross).all()


def test_point_on_surface():
    # convex: centroid
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    assert g.point_on_surface([sq]) == (5.0, 5.0)
    # C-shape where centroid falls in the notch
    c = np.array(
        [[0, 0], [10, 0], [10, 3], [3, 3], [3, 7], [10, 7], [10, 10], [0, 10]], float
    )
    x, y = g.point_on_surface([c])
    assert g.points_in_polygon(np.array([x]), np.array([y]), [c])[0]
    # donut where centroid falls in the hole
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    hole = np.array([[3, 3], [7, 3], [7, 7], [3, 7]], float)
    x, y = g.point_on_surface([outer, hole])
    assert g.points_in_polygon(np.array([x]), np.array([y]), [outer, hole])[0]


def test_boundary_and_orientation_and_simple():
    outer_cw = np.array([[0, 0], [0, 10], [10, 10], [10, 0]], float)
    hole_ccw = np.array([[2, 2], [4, 2], [4, 4], [2, 4]], float)
    fixed = g.normalize_ring_orientation([outer_cw, hole_ccw])
    off = np.array([0, 4])
    assert g.ring_area(fixed[0], off)[0] > 0
    assert g.ring_area(fixed[1], off)[0] < 0
    lines = g.boundary_lines(fixed)
    assert len(lines) == 2 and np.array_equal(lines[0][0], lines[0][-1])
    # bowtie is not simple
    bow = np.array([[0, 0], [10, 10], [10, 0], [0, 10]], float)
    assert not g.ring_is_simple(bow)
    assert g.ring_is_simple(outer_cw)


def test_simplify_dp():
    # collinear middle points dropped
    line = np.array([[0, 0], [1, 0.001], [2, -0.001], [3, 0], [10, 0]], float)
    out = g.simplify_dp(line, 0.1)
    assert np.array_equal(out, np.array([[0, 0], [10, 0]], float))
    # spike preserved
    spike = np.array([[0, 0], [5, 8], [10, 0]], float)
    assert np.array_equal(g.simplify_dp(spike, 0.5), spike)
    # tolerance 0 = identity
    assert np.array_equal(g.simplify_dp(line, 0.0), line)
