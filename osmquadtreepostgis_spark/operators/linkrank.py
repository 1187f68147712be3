"""Damped link-graph rank (PageRank family) in fixed-point integers.

A web-scale corpus pipeline ranks pages by link structure before
sampling/mixing (the quality-weighting stage of public crawl
pipelines).  The interesting engineering problem at 10^12 edges is
not the recurrence — it is DETERMINISM: float summation order under
distributed aggregation is not stable, so a double-typed PageRank
produces hash-different results run to run (and engine to engine).
This operator runs the damped recurrence entirely in int64
micro-units (1e6 = 1.0):

    r_0     = 1_000_000
    contrib = sum over in-links of (r_prev DIV outdeg)
    r_next  = 150_000 + (85 * contrib) DIV 100        (d = 0.85)

Integer DIV and int64 sums are associative/commutative, so any
execution order — any partitioning, any engine — yields identical
bits.  The truncation error per step is < 1 micro-unit per in-link,
far below ranking resolution.  Dangling links (targets outside the
corpus) are dropped by the membership semi-join; pages with no
in-links settle at the 0.15 base.  This mirrors the engine's other
determinism pins (global first-occurrence survivors, md5 ordering)
rather than the reference, which has no graph stage — it is part of
the training-data family mandated by the graft mission.

Scale shape per iteration: ONE keyed equi-join (ranks → link source)
+ ONE groupBy(dst) with map-side partial int sums + ONE left join
back to the page set.  O(iterations) rounds like
operators/cluster.py's connected components; hub pages (massive
in-degree) are a groupBy-sum hot key that combines map-side and
AQE-splits — never a window, never driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["linkrank", "sql_linkrank", "SCALE", "BASE", "DAMP_NUM", "DAMP_DEN"]

SCALE = 1_000_000  # micro-units per 1.0
BASE = 150_000  # (1 - d) * SCALE
DAMP_NUM = 85  # d = DAMP_NUM / DAMP_DEN
DAMP_DEN = 100


def linkrank(
    pages: DataFrame,
    links: DataFrame,
    iterations: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-point damped rank over ``links`` (columns ``src``,
    ``dst``) restricted to ``pages`` (column ``id_col``).  Returns one
    row per page: ``(id_col, outdeg, rank)`` with ``rank`` the
    ``iterations``-step value converted to double (exact int → the
    same double both engines).  ``links`` rows whose src or dst is
    not in ``pages`` are ignored (dangling / external edges)."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    # no broadcast hint: the id set is the FULL page population — at
    # 10^12 pages these must stay keyed shuffle semi-joins; AQE
    # demotes them to broadcast automatically when the set is small
    ids = pages.select(F.col(id_col).alias("__pg")).distinct()
    live = (
        links.join(ids, links["src"] == ids["__pg"], "left_semi")
        .join(ids, links["dst"] == ids["__pg"], "left_semi")
        .select("src", "dst")
    )
    outdeg = live.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # page frame carries outdeg (0 for sinks) across all rounds
    base = ids.join(outdeg, ids["__pg"] == outdeg["src"], "left").select(
        F.col("__pg").alias("page"),
        F.coalesce(F.col("outdeg"), F.lit(0)).alias("outdeg"),
    )
    ranks = base.select("page", F.lit(int(SCALE)).alias("r"))
    for _ in range(iterations):
        shares = (
            live.join(ranks, live["src"] == ranks["page"])
            .join(outdeg, "src")
            # `div` (NOT `/`): Spark's `/` on longs is double division
            # and DuckDB's bigint cast of a double ROUNDS while
            # Spark's truncates — integer div is identical everywhere
            .select("dst", F.expr("r div outdeg").alias("__s"))
        )
        contrib = shares.groupBy("dst").agg(F.sum("__s").alias("__c"))
        ranks = base.join(contrib, base["page"] == contrib["dst"], "left").select(
            "page",
            F.expr(
                f"{BASE}L + ({DAMP_NUM}L * coalesce(__c, 0L)) div {DAMP_DEN}L"
            ).alias("r"),
        )
    return base.join(ranks, "page").select(
        F.col("page").alias(id_col),
        "outdeg",
        (F.col("r").cast("double") / F.lit(float(SCALE))).alias("rank"),
    )


def sql_linkrank(
    pages_rel: str,
    links_rel: str,
    iterations: int = 2,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin: the same integer recurrence unrolled into CTEs.
    ``pages_rel`` needs ``id_col``; ``links_rel`` needs src/dst."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    ctes = [
        f"""__lr_ids AS (SELECT DISTINCT {id_col} AS page FROM {pages_rel})""",
        f"""__lr_live AS (
          SELECT l.src, l.dst FROM {links_rel} l
          WHERE EXISTS (SELECT 1 FROM __lr_ids i WHERE i.page = l.src)
            AND EXISTS (SELECT 1 FROM __lr_ids i WHERE i.page = l.dst)
        )""",
        """__lr_outdeg AS (
          SELECT src, count(*) AS outdeg FROM __lr_live GROUP BY src
        )""",
        """__lr_base AS (
          SELECT i.page, coalesce(o.outdeg, 0) AS outdeg
          FROM __lr_ids i LEFT JOIN __lr_outdeg o ON i.page = o.src
        )""",
        f"""__lr_r0 AS (SELECT page, cast({SCALE} as bigint) AS r
                        FROM __lr_base)""",
    ]
    prev = "__lr_r0"
    for k in range(1, iterations + 1):
        ctes.append(
            f"""__lr_c{k} AS (
          SELECT l.dst, sum(r.r // o.outdeg) AS c
          FROM __lr_live l
          JOIN {prev} r ON l.src = r.page
          JOIN __lr_outdeg o ON l.src = o.src
          GROUP BY l.dst
        )"""
        )
        ctes.append(
            f"""__lr_r{k} AS (
          SELECT b.page,
                 cast({BASE} + ({DAMP_NUM} * coalesce(c.c, 0)) // {DAMP_DEN}
                      as bigint) AS r
          FROM __lr_base b LEFT JOIN __lr_c{k} c ON b.page = c.dst
        )"""
        )
        prev = f"__lr_r{k}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT b.page AS {id_col}, b.outdeg,
               cast(r.r as double) / {float(SCALE)!r} AS rank
        FROM __lr_base b JOIN {prev} r ON b.page = r.page"""
    )
