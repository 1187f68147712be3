"""Hilbert-curve cell keys — the S2 family's space-filling curve as a
fourth curve-key encoding beside Morton (:mod:`..quadtree`), z_order
and geohash (:mod:`.geohash`).

Why carry it: the reference's 64-bit quadtree keys are Morton-ordered
(/root/reference/src/... quadtree::calculate packing); Morton order has
unbounded jumps between consecutive keys (cell (0,1)→(1,0) crosses the
whole map), while the Hilbert d-index moves to a GRID-ADJACENT cell on
every +1 step.  For range-partitioned storage that means a contiguous
d-range is a spatially compact blob — strictly better scan locality
for bbox workloads, and exactly why S2 (public spec) hilbert-orders its
cell ids.

Re-derivation from the public algorithm (NOT a copy of any code): the
classic per-level quadrant walk — at each level the quadrant index is
gray-coded from the two coordinate bits, and the frame is
flipped/transposed for the next level.  Expressed per level ``s=2^k``
over integer coords (x, y):

    rx = (x >> k) & 1;  ry = (y >> k) & 1
    d += s*s * q        where q = 3*rx + ry - 2*rx*ry   (= (3*rx) XOR ry,
                        written arithmetically because '^' means POWER
                        in DuckDB — the twin must parse identically)
    if ry == 0:
        if rx == 1:  x, y = N-1-x, N-1-y      # flip
        x, y = y, x                           # transpose

Parity strategy (same as geohash.py): ONE generator emits SQL text
valid in BOTH Spark SQL and DuckDB.  The rotate/flip makes each
level's (x, y) depend on the previous level's BOTH columns, so inlining
would double the expression per level (2^order blowup) — instead each
level is STAGED through named columns: ``df.withColumns`` per level on
the Spark side (all three exprs read the pre-update columns), one
nested subquery per level on the oracle side.

Prefix property (pinned in tests): the top ``2*k`` bits of an
order-``p`` key ARE the order-``k`` key of the containing cell —
``hd >> 2*(p-k)`` — because quadrant digits are emitted
most-significant-first.  Coarse tiles are therefore a shift, never a
re-encode, exactly like the Morton cell_parent.

Scale: a codegen'd map over the scan — ``order`` chained projections,
no shuffle, no UDF, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "sql_hilbert_scaled",
    "sql_hilbert_stage",
    "with_hilbert",
    "sql_hilbert_query",
]


def _check_order(order: int) -> None:
    if not 1 <= order <= 31:
        raise ValueError("hilbert order must be in [1, 31]")


def sql_hilbert_scaled(lon: str, lat: str, order: int) -> tuple[str, str]:
    """(x, y) SQL expressions: top-``order`` bisection bits of each
    coordinate, clamped so +180 / +90 land in the last cell (same
    convention as geohash; lon=-180 and lon=+180 stay DIFFERENT keys
    only at the clamp cell — the frozen no-dateline-wrap rule)."""
    _check_order(order)
    n = 1 << order
    x = (
        f"least(cast(floor((({lon}) + 180.0) / 360.0 * {n}.0) as bigint),"
        f" {n - 1})"
    )
    y = (
        f"least(cast(floor((({lat}) + 90.0) / 180.0 * {n}.0) as bigint),"
        f" {n - 1})"
    )
    return x, y


def sql_hilbert_stage(
    k: int, order: int, x: str = "hx", y: str = "hy", d: str = "hd"
) -> dict[str, str]:
    """SQL exprs for the level reading bit ``k`` (k = order-1 is the
    first/MSB level).  Returns {x: expr, y: expr, d: expr} where every
    expr reads the PREVIOUS level's columns — apply all three
    simultaneously (withColumns / one subquery)."""
    _check_order(order)
    n = 1 << order
    s2 = 1 << (2 * k)  # s*s for s = 2^k
    rx = f"(({x} >> {k}) & 1)"
    ry = f"(({y} >> {k}) & 1)"
    quad = f"(3 * {rx} + {ry} - 2 * {rx} * {ry})"
    return {
        d: f"({d} + {s2} * {quad})",
        x: (
            f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {n - 1} - {y} ELSE {y} END) ELSE {x} END)"
        ),
        y: (
            f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {n - 1} - {x} ELSE {x} END) ELSE {y} END)"
        ),
    }


def with_hilbert(
    df: DataFrame, lon: str, lat: str, order: int = 16, out: str = "hilbert_d"
) -> DataFrame:
    """Adds ``out``: the order-``order`` Hilbert d-index of (lon, lat).
    Pure Column staged bit math from the SAME generators as the DuckDB
    twin — byte-identical across engines by construction."""
    xs, ys = sql_hilbert_scaled(lon, lat, order)
    cur = df.withColumns(
        {
            "hx": F.expr(xs),
            "hy": F.expr(ys),
            "hd": F.expr("cast(0 as bigint)"),
        }
    )
    for k in range(order - 1, -1, -1):
        stage = sql_hilbert_stage(k, order)
        cur = cur.withColumns({c: F.expr(e) for c, e in stage.items()})
    return cur.withColumn(out, F.col("hd")).drop("hx", "hy", "hd")


def sql_hilbert_query(
    inner_sql: str,
    keep_cols: list[str],
    lon: str = "lon",
    lat: str = "lat",
    order: int = 16,
    out: str = "hilbert_d",
) -> str:
    """DuckDB twin of :func:`with_hilbert`: wraps ``inner_sql`` (which
    must expose ``keep_cols`` + lon/lat) in one nested subquery per
    level, built from the SAME stage generator."""
    keep = ", ".join(keep_cols)
    xs, ys = sql_hilbert_scaled(lon, lat, order)
    q = (
        f"SELECT {keep}, {xs} AS hx, {ys} AS hy,"
        f" cast(0 as bigint) AS hd FROM ({inner_sql})"
    )
    for k in range(order - 1, -1, -1):
        stage = sql_hilbert_stage(k, order)
        q = (
            f"SELECT {keep}, {stage['hx']} AS hx, {stage['hy']} AS hy,"
            f" {stage['hd']} AS hd FROM ({q})"
        )
    return f"SELECT {keep}, hd AS {out} FROM ({q})"
