"""Vectorized geometry kernels (pure numpy, no GEOS/shapely available).

Re-implements, from scratch, the geometry semantics the reference gets
from GEOS + its own writers (all citations into /root/reference/):

* EPSG:3857 forward transform + optional 2-dp rounding
  (src/validategeoms.cpp:148-161)
* WKB writer: XDR (big-endian) with embedded SRID 3857 — EWKB
  (src/validategeoms.cpp:116-138); hex encoding only at the CSV export
  boundary (src/postgiswriter.cpp:232-240)
* linestring length and polygon area rounded to 1 decimal place
  (src/postgiswriter.cpp:84-100, 892-894, 1045-1047)
* point-on-surface / boundary extraction (src/validategeoms.cpp:97-109)
* topology-preserving-ish simplify with tolerance in mercator units
  (src/validategeoms.cpp:83-89; invoked as st_simplify(way, 612),
  osmquadtreepostgis/__init__.py:409)
* validity: ring orientation normalization + a validity flag
  (src/validategeoms.cpp:64-82 uses GEOSisValid + buffer(0); we fix
  orientation and flag self-intersections instead)

Batch representation: ragged coordinate arrays — ``coords`` (N,2)
float64 + ``offsets`` (M+1,) int64 delimiting M rings/lines. Per-batch
loops are per-geometry only; all per-coordinate math is numpy.
"""

from __future__ import annotations

import struct

import numpy as np

from .quadtree import EARTH_RADIUS, MERC_MAX_LAT

SRID_3857 = 3857
# EWKB flags
_WKB_SRID_FLAG = 0x20000000
_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6

__all__ = [
    "round1_half_away",
    "merc_forward",
    "merc_inverse",
    "line_length",
    "ring_area",
    "polygon_area",
    "wkb_point",
    "wkb_linestring",
    "wkb_polygon",
    "wkb_multipolygon",
    "parse_wkb",
    "point_in_ring",
    "points_in_polygon",
    "point_on_surface",
    "boundary_lines",
    "simplify_dp",
    "normalize_ring_orientation",
    "ring_is_simple",
]


# ---------------------------------------------------------------------------
# projection (EPSG:4326 <-> EPSG:3857 metres)


def round1_half_away(x):
    """1-dp rounding with the reference's std::round semantics
    (half AWAY from zero, src/postgiswriter.cpp:84-100) — python's
    built-in round is half-even and disagrees on exact .x5 values."""
    x = np.asarray(x, dtype=np.float64)
    return np.sign(x) * np.floor(np.abs(x) * 10.0 + 0.5) / 10.0


def merc_forward(lon, lat, round_2dp: bool = False):
    """Forward web-mercator transform; optional 2-dp grid rounding
    (the reference's round_geometry mode, src/validategeoms.cpp:155-160)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MERC_MAX_LAT, MERC_MAX_LAT)
    x = EARTH_RADIUS * np.radians(lon)
    y = EARTH_RADIUS * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    if round_2dp:
        x = np.round(x, 2)
        y = np.round(y, 2)
    return x, y


def merc_inverse(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / EARTH_RADIUS)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / EARTH_RADIUS)) - np.pi / 2.0)
    return lon, lat


# ---------------------------------------------------------------------------
# measures


def line_length(coords: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Planar length per line (mercator metres), ragged batch."""
    coords = np.asarray(coords, dtype=np.float64)
    d = np.zeros(len(coords), dtype=np.float64)
    if len(coords) > 1:
        seg = np.hypot(np.diff(coords[:, 0]), np.diff(coords[:, 1]))
        d[1:] = seg
    # zero the first vertex of each line so segments don't cross lines
    starts = np.asarray(offsets[:-1], dtype=np.int64)
    d[starts[starts < len(d)]] = 0.0
    cs = np.concatenate([[0.0], np.cumsum(d)])
    ends = np.asarray(offsets[1:], dtype=np.int64)
    return cs[ends] - cs[starts]


def ring_area(coords: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Signed shoelace area per ring (positive = counter-clockwise)."""
    coords = np.asarray(coords, dtype=np.float64)
    x = coords[:, 0]
    y = coords[:, 1]
    cross = np.zeros(len(coords), dtype=np.float64)
    if len(coords) > 1:
        cross[:-1] = x[:-1] * y[1:] - x[1:] * y[:-1]
    cs = np.concatenate([[0.0], np.cumsum(cross)])
    starts = np.asarray(offsets[:-1], dtype=np.int64)
    ends = np.asarray(offsets[1:], dtype=np.int64)
    # ring closure: vertices repeat the first point at the end (WKB style);
    # if not closed, add the wrap term explicitly
    area = np.empty(len(starts), dtype=np.float64)
    for i, (s, e) in enumerate(zip(starts, ends)):
        a = cs[e - 1] - cs[s]
        if e - s >= 2 and (coords[e - 1] != coords[s]).any():
            a += coords[e - 1, 0] * coords[s, 1] - coords[s, 0] * coords[e - 1, 1]
        area[i] = a / 2.0
    return area


def polygon_area(rings_coords: np.ndarray, ring_offsets: np.ndarray) -> float:
    """abs(outer) - sum(abs(inner)) for one polygon's rings."""
    a = ring_area(rings_coords, ring_offsets)
    if len(a) == 0:
        return 0.0
    return float(abs(a[0]) - np.sum(np.abs(a[1:])))


# ---------------------------------------------------------------------------
# WKB (EWKB: XDR byte order, SRID embedded — matches the reference's
# ele->Wkb(true, true) output shape, src/validategeoms.cpp:116-138)


def _hdr(geom_type: int, srid: int | None) -> bytes:
    if srid is None:
        return struct.pack(">BI", 0, geom_type)
    return struct.pack(">BII", 0, geom_type | _WKB_SRID_FLAG, srid)


def _pts(coords: np.ndarray) -> bytes:
    return np.ascontiguousarray(coords, dtype=">f8").tobytes()


def wkb_point(x: float, y: float, srid: int | None = SRID_3857) -> bytes:
    return _hdr(_WKB_POINT, srid) + struct.pack(">dd", x, y)


def wkb_linestring(coords: np.ndarray, srid: int | None = SRID_3857) -> bytes:
    coords = np.asarray(coords, dtype=np.float64)
    return _hdr(_WKB_LINESTRING, srid) + struct.pack(">I", len(coords)) + _pts(coords)


def _rings_body(rings: list[np.ndarray]) -> bytes:
    out = [struct.pack(">I", len(rings))]
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        if len(r) and (r[0] != r[-1]).any():
            r = np.vstack([r, r[:1]])  # close
        out.append(struct.pack(">I", len(r)))
        out.append(_pts(r))
    return b"".join(out)


def wkb_polygon(rings: list[np.ndarray], srid: int | None = SRID_3857) -> bytes:
    return _hdr(_WKB_POLYGON, srid) + _rings_body(rings)


def wkb_multipolygon(
    polys: list[list[np.ndarray]], srid: int | None = SRID_3857
) -> bytes:
    out = [_hdr(_WKB_MULTIPOLYGON, srid), struct.pack(">I", len(polys))]
    for rings in polys:
        out.append(_hdr(_WKB_POLYGON, None))
        out.append(_rings_body(rings))
    return b"".join(out)


def parse_wkb(buf: bytes):
    """Parse one (E)WKB blob -> (geom_type, srid, payload).

    payload: point -> (2,) array; linestring -> (N,2) array;
    polygon -> list[(N,2)]; multipolygon -> list[list[(N,2)]].
    Handles both XDR and NDR byte order.
    """
    bo = ">" if buf[0] == 0 else "<"
    (gt,) = struct.unpack_from(bo + "I", buf, 1)
    off = 5
    srid = None
    if gt & _WKB_SRID_FLAG:
        (srid,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        gt &= ~_WKB_SRID_FLAG
    gt &= 0xFF

    def rd_pts(o):
        (n,) = struct.unpack_from(bo + "I", buf, o)
        o += 4
        arr = np.frombuffer(buf, dtype=bo + "f8", count=2 * n, offset=o)
        return arr.reshape(n, 2).astype(np.float64), o + 16 * n

    if gt == _WKB_POINT:
        arr = np.frombuffer(buf, dtype=bo + "f8", count=2, offset=off)
        return gt, srid, arr.astype(np.float64)
    if gt == _WKB_LINESTRING:
        pts, _ = rd_pts(off)
        return gt, srid, pts
    if gt == _WKB_POLYGON:
        (nr,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            r, off = rd_pts(off)
            rings.append(r)
        return gt, srid, rings
    if gt == _WKB_MULTIPOLYGON:
        (np_,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        polys = []
        for _ in range(np_):
            off += 5  # nested byte-order + type header
            (nr,) = struct.unpack_from(bo + "I", buf, off)
            off += 4
            rings = []
            for _ in range(nr):
                r, off = rd_pts(off)
                rings.append(r)
            polys.append(rings)
        return gt, srid, polys
    raise ValueError(f"unsupported WKB geometry type {gt}")


# ---------------------------------------------------------------------------
# point-in-polygon (vectorized even-odd ray casting)


def point_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing test, many points vs one ring.

    Frozen convention (verified in tests, relied on by the oracle SQL
    for axis-aligned fixtures): for an axis-aligned rectangle the
    accepted set is x in [xmin, xmax) and y in [ymin, ymax).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) and (ring[0] != ring[-1]).any():
        ring = np.vstack([ring, ring[:1]])
    xi, yi = ring[:-1, 0], ring[:-1, 1]
    xj, yj = ring[1:, 0], ring[1:, 1]
    inside = np.zeros(px.shape, dtype=bool)
    for k in range(len(xi)):
        cond = (yi[k] > py) != (yj[k] > py)
        if yj[k] != yi[k]:
            xint = (xj[k] - xi[k]) * (py - yi[k]) / (yj[k] - yi[k]) + xi[k]
            inside ^= cond & (px < xint)
    return inside


def points_in_polygon(
    px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]
) -> np.ndarray:
    """Points inside outer ring and outside every hole."""
    if not rings:
        return np.zeros(np.asarray(px).shape, dtype=bool)
    inside = point_in_ring(px, py, rings[0])
    for hole in rings[1:]:
        inside &= ~point_in_ring(px, py, hole)
    return inside


# ---------------------------------------------------------------------------
# representative point / boundary / simplify / validity


def point_on_surface(rings: list[np.ndarray]) -> tuple[float, float]:
    """Interior-guaranteed representative point (the reference's
    RepresentativePointGeometry, src/validategeoms.cpp:97-102).

    Centroid if interior; else scanline through the bbox mid-y: take
    the midpoint of the widest inside-interval.
    """
    outer = np.asarray(rings[0], dtype=np.float64)
    cx, cy = outer[:, 0].mean(), outer[:, 1].mean()
    if points_in_polygon(np.array([cx]), np.array([cy]), rings)[0]:
        return float(cx), float(cy)
    ymid = (outer[:, 1].min() + outer[:, 1].max()) / 2.0
    # gather x-crossings of all rings with the horizontal line y=ymid
    xs = []
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        if len(r) and (r[0] != r[-1]).any():
            r = np.vstack([r, r[:1]])
        yi, yj = r[:-1, 1], r[1:, 1]
        xi, xj = r[:-1, 0], r[1:, 0]
        m = (yi > ymid) != (yj > ymid)
        if m.any():
            xs.append(xi[m] + (xj[m] - xi[m]) * (ymid - yi[m]) / (yj[m] - yi[m]))
    if not xs:
        return float(cx), float(cy)
    xs = np.sort(np.concatenate(xs))
    if len(xs) < 2:
        return float(xs[0]), float(ymid)
    mids = (xs[:-1] + xs[1:]) / 2.0
    widths = np.diff(xs)
    inside = points_in_polygon(mids, np.full(len(mids), ymid), rings)
    widths = np.where(inside, widths, -1.0)
    i = int(np.argmax(widths))
    return float(mids[i]), float(ymid)


def boundary_lines(rings: list[np.ndarray]) -> list[np.ndarray]:
    """Polygon -> exterior+hole rings as closed linestrings (the
    reference's BoundaryLineGeometry, src/validategeoms.cpp:104-109)."""
    out = []
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        if len(r) and (r[0] != r[-1]).any():
            r = np.vstack([r, r[:1]])
        out.append(r)
    return out


def simplify_dp(coords: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker, tolerance in coordinate units (mercator metres
    to mirror st_simplify(way, 612), __init__.py:409). Iterative."""
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    if n <= 2 or tol <= 0:
        return coords
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        s, e = stack.pop()
        if e - s < 2:
            continue
        seg = coords[s + 1 : e]
        a, b = coords[s], coords[e]
        ab = b - a
        denom = np.hypot(*ab)
        if denom == 0.0:
            d = np.hypot(seg[:, 0] - a[0], seg[:, 1] - a[1])
        else:
            d = np.abs(ab[0] * (a[1] - seg[:, 1]) - (a[0] - seg[:, 0]) * ab[1]) / denom
        i = int(np.argmax(d))
        if d[i] > tol:
            keep[s + 1 + i] = True
            stack.append((s, s + 1 + i))
            stack.append((s + 1 + i, e))
    return coords[keep]


def normalize_ring_orientation(rings: list[np.ndarray]) -> list[np.ndarray]:
    """Outer ring CCW, holes CW (validity repair lite — the reference
    repairs with GEOS buffer(0), src/validategeoms.cpp:64-82; we fix
    orientation and leave a flag for the rest, see ring_is_simple)."""
    out = []
    for i, r in enumerate(rings):
        r = np.asarray(r, dtype=np.float64)
        off = np.array([0, len(r)], dtype=np.int64)
        a = ring_area(r, off)[0]
        want_ccw = i == 0
        if (a > 0) != want_ccw and a != 0:
            r = r[::-1].copy()
        out.append(r)
    return out


def ring_is_simple(ring: np.ndarray) -> bool:
    """O(n^2) segment-intersection check (small rings only) — the
    validity *flag* for geometries we cannot repair without GEOS."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) and (r[0] != r[-1]).any():
        r = np.vstack([r, r[:1]])
    n = len(r) - 1
    p = r[:-1]
    q = r[1:]
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue  # adjacent via closure
            if _segs_intersect(p[i], q[i], p[j], q[j]):
                return False
    return True


def _segs_intersect(a, b, c, d) -> bool:
    def orient(p, q, r):
        v = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    o1, o2 = orient(a, b, c), orient(a, b, d)
    o3, o4 = orient(c, d, a), orient(c, d, b)
    if o1 != o2 and o3 != o4:
        return True
    return False


def _seg_intersection_point(a, b, c, d):
    """Proper intersection point of segments ab and cd, or None."""
    r = b - a
    s = d - c
    denom = r[0] * s[1] - r[1] * s[0]
    if denom == 0:
        return None
    t = ((c[0] - a[0]) * s[1] - (c[1] - a[1]) * s[0]) / denom
    u = ((c[0] - a[0]) * r[1] - (c[1] - a[1]) * r[0]) / denom
    if 0 < t < 1 and 0 < u < 1:
        return a + t * r
    return None


def repair_ring(ring: np.ndarray) -> list[np.ndarray] | None:
    """Split a self-intersecting ring into simple rings — the GEOS
    ``buffer(0)`` repair (src/validategeoms.cpp:64-82) for the
    node-crossing class (bowties, figure-eights).

    Method: insert every proper pairwise segment intersection as a
    vertex (the INSERTED nodes are snapped to 1e-9 so both crossing
    segments agree on the node; original vertices keep their exact
    coordinates — snapping them could move one onto another edge),
    then walk the closed vertex sequence extracting a loop each time a
    node repeats (the classic untwisting traversal). Degenerate loops
    (area ~ 0) are dropped. Returns the simple sub-rings, or None when
    the result still isn't simple (caller quarantines — flag-only
    behavior is the fallback, never silence)."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) and (r[0] == r[-1]).all():
        r = r[:-1]
    n = len(r)
    if n < 3:
        return None
    segs = [(r[i], r[(i + 1) % n]) for i in range(n)]
    inserts: list[list[tuple[float, np.ndarray]]] = [[] for _ in range(n)]
    for i in range(n):
        a, b = segs[i]
        for j in range(i + 1, n):
            if j == i + 1 or (i == 0 and j == n - 1):
                continue  # adjacent
            c, d = segs[j]
            pt = _seg_intersection_point(a, b, c, d)
            if pt is not None:
                ti = np.dot(pt - a, b - a) / max(np.dot(b - a, b - a), 1e-300)
                tj = np.dot(pt - c, d - c) / max(np.dot(d - c, d - c), 1e-300)
                inserts[i].append((ti, pt))
                inserts[j].append((tj, pt))
    walk: list[tuple[float, float]] = []
    for i in range(n):
        walk.append((float(r[i][0]), float(r[i][1])))
        for _, pt in sorted(inserts[i], key=lambda x: x[0]):
            walk.append((round(float(pt[0]), 9), round(float(pt[1]), 9)))
    # untwisting traversal: pop a loop whenever a node repeats
    out: list[np.ndarray] = []
    path: list[tuple[float, float]] = []
    pos: dict[tuple[float, float], int] = {}
    for v in walk + [walk[0]]:
        if v in pos:
            start = pos[v]
            loop = path[start:]
            if len(loop) >= 3:
                arr = np.array(loop + [loop[0]], dtype=np.float64)
                area = ring_area(arr, np.array([0, len(arr) - 1]))[0]
                if abs(area) > 1e-12:
                    out.append(arr[:-1])
            for w in path[start:]:
                pos.pop(w, None)
            path = path[:start]
            if v not in pos:
                pos[v] = len(path)
            path.append(v)
        else:
            pos[v] = len(path)
            path.append(v)
    if not out:
        return None
    for loop in out:
        if not ring_is_simple(loop):
            return None
    return out
