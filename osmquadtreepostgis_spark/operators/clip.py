"""Tile clipping: fragment line segments by an equirectangular tile grid.

The reference emits geometry rows grouped by quadtree tile and relies
on PostGIS to cut features at render time; a tile-oriented engine
that SERVES tiles needs the cut itself as a distributed operator —
every segment split into per-tile fragments, clipped to the tile
boundary.  This is the classic Liang-Barsky parametric clip
(public-textbook algorithm, re-derived here) against an axis-aligned
grid, with candidate tiles from the segment's bbox cover — the same
cover-then-refine shape as the engine's cell-cover PIP join
(operators/pip.py:pip_join_shuffle).

Scale shape: scan → project (bbox → clamped tile index ranges) → two
Generate explodes (sequence over the tile span) → codegen'd filter on
the parametric window → project.  ZERO shuffles and zero Python: at
10^12 segments the fragmentation rides the scan; the caller then
``repartitionByRange("ty", "tx")`` (or packs the cell key) to cluster
fragments for per-tile writes, which is the ONLY data movement.
Candidate fan-out is bounded by the per-segment tile span, so one
continent-crossing segment explodes into its own tasks' rows without
skewing any key (there is no key yet).

Float parity: every arithmetic expression is emitted ONCE by the SQL
generators below and executed verbatim by both Spark (``F.expr``) and
DuckDB — identical IEEE double expression trees give bit-identical
``t`` parameters, so the fragment endpoints match exactly; emitted
coordinates are additionally rounded (half-away, both engines agree
on the same input double) to 6 dp.

Parallel-to-axis segments (dx=0 or dy=0) use the standard
inside/outside sentinel window (enter 0/exit 1 when inside the slab,
empty window otherwise) instead of dividing by zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "sql_tile_range",
    "sql_clip_window",
    "clip_segments_to_tiles",
    "sql_clip_segments",
]


def _grid(depth: int) -> int:
    if not 0 <= depth <= 16:
        raise ValueError("depth must be in [0, 16]")
    return 1 << depth


def sql_tile_range(x1: str, y1: str, x2: str, y2: str, depth: int) -> dict[str, str]:
    """Clamped tile-index ranges covering the segment bbox on the
    equirectangular grid (n = 2^depth per axis; lon [-180,180),
    lat [-90,90))."""
    n = _grid(depth)

    def idx(v: str, lo: float, span: float) -> str:
        return (
            f"least(greatest(cast(floor((({v}) - {lo!r}) / {span!r} * {n}.0)"
            f" as bigint), 0), {n - 1})"
        )

    return {
        "tx0": idx(f"least({x1}, {x2})", -180.0, 360.0),
        "tx1": idx(f"greatest({x1}, {x2})", -180.0, 360.0),
        "ty0": idx(f"least({y1}, {y2})", -90.0, 180.0),
        "ty1": idx(f"greatest({y1}, {y2})", -90.0, 180.0),
    }


def _slab_window(p1: str, d: str, lo: str, hi: str) -> tuple[str, str]:
    """(enter, exit) parametric window of one axis slab [lo, hi].
    dx=0: window is [0,1] when inside the slab, else empty ([2,-1])."""
    ta = f"(({lo}) - ({p1})) / ({d})"
    tb = f"(({hi}) - ({p1})) / ({d})"
    inside = f"({p1}) >= ({lo}) AND ({p1}) <= ({hi})"
    enter = (
        f"(CASE WHEN ({d}) <> 0.0 THEN least({ta}, {tb}) "
        f"WHEN {inside} THEN 0.0 ELSE 2.0 END)"
    )
    exit_ = (
        f"(CASE WHEN ({d}) <> 0.0 THEN greatest({ta}, {tb}) "
        f"WHEN {inside} THEN 1.0 ELSE -1.0 END)"
    )
    return enter, exit_


def sql_clip_window(
    x1: str, y1: str, dx: str, dy: str,
    bx0: str, bx1: str, by0: str, by1: str,
) -> tuple[str, str]:
    """(t0, t1) Liang-Barsky parameter window of the segment against
    the box; the intersection is non-empty iff t0 <= t1."""
    ex, xx = _slab_window(x1, dx, bx0, bx1)
    ey, xy = _slab_window(y1, dy, by0, by1)
    return (
        f"greatest(0.0, {ex}, {ey})",
        f"least(1.0, {xx}, {xy})",
    )


def sql_round_half_away(v: str, dp: int) -> str:
    """Half-away-from-zero rounding spelled in primitive IEEE ops so
    BOTH engines execute the identical float pipeline.  The built-in
    ``round(double, n)`` is NOT portable at ties: Spark routes through
    an exact BigDecimal expansion of the double while DuckDB rounds
    the ``v * 10^n`` double product — values a hair from a tie (e.g.
    -64.5265185) round differently.  floor/abs/mul/div on doubles are
    bit-identical everywhere."""
    f = f"1e{dp}"  # exponent form: Spark parses 1000000.0 as DECIMAL
    return (
        f"(cast(CASE WHEN ({v}) < 0.0 THEN -1 ELSE 1 END as double) * "
        f"floor(abs({v}) * {f} + cast(0.5 as double)) / {f})"
    )


def _box_bounds(depth: int) -> dict[str, str]:
    n = _grid(depth)
    return {
        "bx0": f"(-180.0 + tx * {360.0 / n!r})",
        "bx1": f"(-180.0 + (tx + 1) * {360.0 / n!r})",
        "by0": f"(-90.0 + ty * {180.0 / n!r})",
        "by1": f"(-90.0 + (ty + 1) * {180.0 / n!r})",
    }


def clip_segments_to_tiles(
    segments: DataFrame,
    depth: int = 5,
    id_col: str = "seg_id",
    round_dp: int = 6,
) -> DataFrame:
    """Fragment segments (``id_col, x1, y1, x2, y2``) by the depth-d
    tile grid.  One output row per (segment, tile) with a non-empty
    clip: tile indices, parametric window, clipped endpoints."""
    r = sql_tile_range("x1", "y1", "x2", "y2", depth)
    b = _box_bounds(depth)
    t0, t1 = sql_clip_window(
        "x1", "y1", "__dx", "__dy", b["bx0"], b["bx1"], b["by0"], b["by1"]
    )
    out = (
        segments.withColumn("__dx", F.expr("x2 - x1"))
        .withColumn("__dy", F.expr("y2 - y1"))
        .withColumn("__tx0", F.expr(r["tx0"]))
        .withColumn("__tx1", F.expr(r["tx1"]))
        .withColumn("__ty0", F.expr(r["ty0"]))
        .withColumn("__ty1", F.expr(r["ty1"]))
        .withColumn("tx", F.explode(F.expr("sequence(__tx0, __tx1)")))
        .withColumn("ty", F.explode(F.expr("sequence(__ty0, __ty1)")))
        .withColumn("t0", F.expr(t0))
        .withColumn("t1", F.expr(t1))
        .filter(F.expr("t0 <= t1"))
    )
    return out.select(
        id_col,
        "tx",
        "ty",
        F.expr(sql_round_half_away("x1 + t0 * __dx", round_dp)).alias("cx1"),
        F.expr(sql_round_half_away("y1 + t0 * __dy", round_dp)).alias("cy1"),
        F.expr(sql_round_half_away("x1 + t1 * __dx", round_dp)).alias("cx2"),
        F.expr(sql_round_half_away("y1 + t1 * __dy", round_dp)).alias("cy2"),
        F.expr(sql_round_half_away("t1 - t0", round_dp)).alias("t_span"),
    )


def sql_clip_segments(
    segments_rel: str,
    depth: int = 5,
    id_col: str = "seg_id",
    round_dp: int = 6,
    extra_ctes: str = "",
) -> str:
    """DuckDB twin of :func:`clip_segments_to_tiles` over a relation
    with columns (id_col, x1, y1, x2, y2) — same generators, same
    staging (lateral unnest per axis = Spark's two explodes).
    ``extra_ctes`` lets the caller prepend the CTEs that define
    ``segments_rel``."""
    r = sql_tile_range("x1", "y1", "x2", "y2", depth)
    b = _box_bounds(depth)
    t0, t1 = sql_clip_window(
        "x1", "y1", "__dx", "__dy", b["bx0"], b["bx1"], b["by0"], b["by1"]
    )
    pre = f"{extra_ctes}," if extra_ctes else ""
    return f"""
        WITH {pre} __cl_seg AS (
          SELECT {id_col}, x1, y1, x2, y2,
                 x2 - x1 AS __dx, y2 - y1 AS __dy,
                 {r['tx0']} AS __tx0, {r['tx1']} AS __tx1,
                 {r['ty0']} AS __ty0, {r['ty1']} AS __ty1
          FROM {segments_rel}
        ),
        __cl_tx AS (
          SELECT s.*, cast(u.tx as bigint) AS tx
          FROM __cl_seg s, unnest(range(__tx0, __tx1 + 1)) AS u(tx)
        ),
        __cl_txy AS (
          SELECT s.*, cast(u.ty as bigint) AS ty
          FROM __cl_tx s, unnest(range(__ty0, __ty1 + 1)) AS u(ty)
        ),
        __cl_win AS (
          SELECT *, {t0} AS t0, {t1} AS t1 FROM __cl_txy
        )
        SELECT {id_col}, tx, ty,
               {sql_round_half_away('x1 + t0 * __dx', round_dp)} AS cx1,
               {sql_round_half_away('y1 + t0 * __dy', round_dp)} AS cy1,
               {sql_round_half_away('x1 + t1 * __dx', round_dp)} AS cx2,
               {sql_round_half_away('y1 + t1 * __dy', round_dp)} AS cy2,
               {sql_round_half_away('t1 - t0', round_dp)} AS t_span
        FROM __cl_win
        WHERE t0 <= t1"""
