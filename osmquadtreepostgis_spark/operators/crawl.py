"""Crawl-snapshot delta — the incremental-ingest planner's first
question: between crawl N-1 and crawl N, which URLs were added,
removed, changed, or unchanged?  Downstream, only `added`+`changed`
re-enter the curation pipeline (the rest reuse cached artifacts), so
this one operator gates how much of the 100 TB is touched per crawl.

Companion to `recrawl_latest` (latest-snapshot resolution inside ONE
table) — this compares TWO resolved snapshots.  The reference's
analogue is osmquadtreepostgis's change-file processing (initial +
diff PBFs merged by element id/version); re-expressed relationally:
one full-outer equi join on the canonical URL.

Scale shape: a single shuffled hash join on url (AQE handles skew;
there is nothing smaller to broadcast — both sides are crawls), with
the content comparison on fixed-width fingerprints, never page
bodies.  Feed it fingerprints, not text: the join then moves
~50 bytes/row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["crawl_diff", "sql_crawl_diff"]


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """One row per URL present in either snapshot:
    (url, status, old_fp, new_fp) with status in
    {'added','removed','changed','unchanged'}.

    Precondition: fingerprints are NON-NULL for rows present in a
    snapshot (ADVICE r5). Presence is inferred from fp nullness after
    the full-outer join, so a URL present in both snapshots with a
    NULL old_fp would read 'added' (NULL new_fp: 'removed'), and NULL
    vs NULL falls through to 'unchanged'. The DuckDB twin shares the
    semantics, so parity holds either way; feed a presence flag
    instead of NULL fingerprints if the source can be sparse."""
    o = old.select(F.col(url_col), F.col(fp_col).alias("old_fp"))
    n = new.select(F.col(url_col), F.col(fp_col).alias("new_fp"))
    j = o.join(n, url_col, "full_outer")
    return j.select(
        url_col,
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        "old_fp",
        "new_fp",
    )


def sql_crawl_diff(
    old_sql: str,
    new_sql: str,
    url_col: str = "url",
    fp_col: str = "fingerprint",
) -> str:
    """DuckDB twin of :func:`crawl_diff`."""
    return f"""
WITH __old AS (SELECT {url_col}, {fp_col} AS old_fp FROM ({old_sql})),
__new AS (SELECT {url_col}, {fp_col} AS new_fp FROM ({new_sql}))
SELECT coalesce(o.{url_col}, n.{url_col}) AS {url_col},
       CASE WHEN o.old_fp IS NULL THEN 'added'
            WHEN n.new_fp IS NULL THEN 'removed'
            WHEN o.old_fp <> n.new_fp THEN 'changed'
            ELSE 'unchanged' END AS status,
       o.old_fp, n.new_fp
FROM __old o FULL OUTER JOIN __new n ON o.{url_col} = n.{url_col}
"""
