"""Hilbert-curve cell keys (functions/hilbert.py).

Pins: (1) exhaustive equality with the classic per-level quadrant walk
at order 4; (2) the curve property that makes Hilbert worth carrying —
consecutive d-indexes are GRID-ADJACENT (Manhattan distance exactly 1),
which Morton violates; (3) the MSB-first prefix property (coarse key =
shift of fine key); (4) byte-identical DuckDB twin from the same
generators; (5) projection-only plan — no shuffle, no UDF, no Python.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.functions.hilbert import (
    sql_hilbert_query,
    with_hilbert,
)


def _xy2d(order, x, y):
    """Pure-python reference: the classic gray-code quadrant walk."""
    n = 1 << order
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def _grid_df(spark, order):
    n = 1 << order
    rows = []
    for gx in range(n):
        for gy in range(n):
            rows.append(
                (gx, gy, (gx + 0.5) / n * 360.0 - 180.0,
                 (gy + 0.5) / n * 180.0 - 90.0)
            )
    return spark.createDataFrame(rows, "gx int, gy int, lon double, lat double")


def test_exhaustive_order4_matches_reference_walk(spark):
    order = 4
    got = {
        (r.gx, r.gy): r.hilbert_d
        for r in with_hilbert(_grid_df(spark, order), "lon", "lat", order).collect()
    }
    n = 1 << order
    assert got == {(x, y): _xy2d(order, x, y) for x in range(n) for y in range(n)}


def test_consecutive_d_are_grid_adjacent(spark):
    # THE Hilbert property: |d1-d2|==1 => Manhattan distance 1. Also a
    # bijection onto [0, 4^order).
    order = 4
    rows = with_hilbert(_grid_df(spark, order), "lon", "lat", order).collect()
    by_d = {r.hilbert_d: (r.gx, r.gy) for r in rows}
    n2 = (1 << order) ** 2
    assert sorted(by_d) == list(range(n2))  # bijection
    for d in range(n2 - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_prefix_property_and_twin(spark):
    import random

    random.seed(3)
    pts = [
        (i, random.uniform(-180, 180), random.uniform(-85, 85))
        for i in range(500)
    ]
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    fine = {r.id: r.hilbert_d for r in with_hilbert(df, "lon", "lat", 16).collect()}
    coarse = {r.id: r.hilbert_d for r in with_hilbert(df, "lon", "lat", 8).collect()}
    assert all(fine[i] >> 16 == coarse[i] for i in fine)

    con = duckdb.connect()
    con.execute("create table pts(id bigint, lon double, lat double)")
    con.executemany("insert into pts values (?,?,?)", pts)
    twin = dict(
        con.execute(
            sql_hilbert_query("SELECT id, lon, lat FROM pts", ["id"], order=16)
        ).fetchall()
    )
    assert twin == fine


def test_clamp_edges(spark):
    # +180/+90 land in the last cell; -180/-90 in the first — the
    # frozen no-dateline-wrap convention (lon=-180 != lon=+180 keys).
    df = spark.createDataFrame(
        [(1, 180.0, 90.0), (2, -180.0, -90.0)],
        "id long, lon double, lat double",
    )
    out = {r.id: r.hilbert_d for r in with_hilbert(df, "lon", "lat", 4).collect()}
    n = 1 << 4
    assert out[1] == _xy2d(4, n - 1, n - 1)
    assert out[2] == _xy2d(4, 0, 0)
    assert out[1] != out[2]


def test_plan_is_projection_only(spark):
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 360 - 180.0).cast("double").alias("lon"),
        (F.col("id") % 170 - 85.0).cast("double").alias("lat"),
    )
    plan = (
        with_hilbert(df, "lon", "lat", 16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("Exchange", "BatchEvalPython", "ArrowEvalPython", "SortMergeJoin"):
        assert bad not in plan


def test_order_validation():
    with pytest.raises(ValueError):
        from osmquadtreepostgis_spark.functions.hilbert import sql_hilbert_scaled

        sql_hilbert_scaled("lon", "lat", 0)
