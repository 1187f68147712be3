"""Liang-Barsky tile clipping: closed-form fragments, stitching
invariants, degenerate segments, DuckDB twin, plan shape."""

import duckdb
import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.operators.clip import (
    clip_segments_to_tiles,
    sql_clip_segments,
)


def _segs(spark, rows):
    return spark.createDataFrame(
        rows, "seg_id bigint, x1 double, y1 double, x2 double, y2 double"
    )


def test_horizontal_three_tile_split(spark):
    # depth 3: 45-degree tiles. (-100,10)->(0,10) crosses tx 1..4
    out = clip_segments_to_tiles(
        _segs(spark, [(1, -100.0, 10.0, 0.0, 10.0)]), depth=3
    ).collect()
    frags = sorted(((r.tx, r.cx1, r.cx2) for r in out))
    assert [f[0] for f in frags] == [1, 2, 3, 4]
    assert frags[0][1:] == (-100.0, -90.0)
    assert frags[1][1:] == (-90.0, -45.0)
    assert frags[2][1:] == (-45.0, 0.0)
    assert frags[3][1:] == (0.0, 0.0)  # endpoint touches tile 4 edge
    assert all(r.ty == 4 and r.cy1 == 10.0 and r.cy2 == 10.0 for r in out)


def test_contained_segment_untouched(spark):
    out = clip_segments_to_tiles(
        _segs(spark, [(2, 1.0, 1.0, 10.0, 20.0)]), depth=3
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.cx1, r.cy1, r.cx2, r.cy2, r.t_span) == (1.0, 1.0, 10.0, 20.0, 1.0)


def test_point_segment(spark):
    out = clip_segments_to_tiles(
        _segs(spark, [(3, 5.0, 5.0, 5.0, 5.0)]), depth=3
    ).collect()
    assert len(out) == 1
    assert out[0].t_span == 1.0 and out[0].cx1 == 5.0 and out[0].cy2 == 5.0


def test_fragments_stitch_and_cover(spark):
    # deterministic fan of diagonal segments; fragments of each segment
    # must tile the parameter interval [0,1] without gaps
    rows = [
        (i, -170.0 + 7 * i, -80.0 + 6 * i, -170.0 + 7 * i + 33.3, -80.0 + 6 * i + 21.7)
        for i in range(20)
    ]
    out = clip_segments_to_tiles(_segs(spark, rows), depth=4).collect()
    by_seg = {}
    for r in out:
        by_seg.setdefault(r.seg_id, []).append(r)
    assert set(by_seg) == set(range(20))
    for frags in by_seg.values():
        spans = sum(f.t_span for f in frags)
        # corner-crossing fragments may double-count a zero-length touch
        assert spans >= 1.0 - 1e-6
        xs = [f.cx1 for f in frags] + [f.cx2 for f in frags]
        assert min(xs) <= max(xs)


def test_duckdb_twin_exact(spark):
    rows = [
        (i, -175.0 + 11.3 * i, -85.0 + 8.7 * i, -175.0 + 11.3 * i + 29.9,
         -85.0 + 8.7 * i - 13.1)
        for i in range(30)
    ]
    got = sorted(
        map(tuple, clip_segments_to_tiles(_segs(spark, rows), depth=5).collect())
    )
    con = duckdb.connect()
    vals = ", ".join(f"({a}, {b}, {c}, {d}, {e})" for a, b, c, d, e in rows)
    con.sql(
        f"CREATE VIEW segs AS SELECT * FROM (VALUES {vals}) "
        "t(seg_id, x1, y1, x2, y2)"
    )
    want = sorted(map(tuple, con.execute(sql_clip_segments("segs", 5)).fetchall()))
    assert got == want


def test_outside_candidate_rejected(spark):
    # segment whose bbox covers a tile its line never enters (corner case)
    out = clip_segments_to_tiles(
        _segs(spark, [(9, -44.0, 1.0, -1.0, 21.0)]), depth=3
    ).collect()
    for r in out:
        assert r.t_span >= 0.0
        # every emitted fragment lies inside its tile box
        n = 8
        bx0, bx1 = -180 + r.tx * 45.0, -180 + (r.tx + 1) * 45.0
        by0, by1 = -90 + r.ty * 22.5, -90 + (r.ty + 1) * 22.5
        for x, y in ((r.cx1, r.cy1), (r.cx2, r.cy2)):
            assert bx0 - 1e-6 <= x <= bx1 + 1e-6
            assert by0 - 1e-6 <= y <= by1 + 1e-6


def test_depth_bounds(spark):
    with pytest.raises(ValueError):
        clip_segments_to_tiles(_segs(spark, [(1, 0.0, 0.0, 1.0, 1.0)]), depth=17)


def test_plan_no_shuffle_no_python(spark):
    df = clip_segments_to_tiles(
        _segs(spark, [(1, -100.0, 10.0, 0.0, 10.0)]), depth=3
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                "BroadcastNestedLoopJoin"):
        assert bad not in plan
