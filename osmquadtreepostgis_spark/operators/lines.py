"""Line-level boilerplate removal — the CCNet / RefinedWeb line-dedup
stage: a line whose (trimmed) content recurs across many documents of
the same scope (domain / source) is navigation, cookie banners, or
footer chrome, not prose; drop it and stitch the survivors back
together in original order.

This is the intra-document complement to the whole-document dedup
family (:mod:`.dedup`): exact/MinHash dedup removes duplicate *pages*,
this removes the duplicated *chrome inside* otherwise-unique pages.
The reference's analogue is its tag-driven row filtering (rows that
carry no renderable content never reach PostGIS —
src/processpostgis.cpp alloc_func routing); here the unit is the text
line and the filter is learned from the corpus itself.

Scale shape (the 100 TB plan):

* lines are exploded once (``posexplode(split(text, '\\n'))``) — a
  narrow map, no shuffle;
* the cross-document frequency is counted on the line's **64-bit md5
  key**, never the line string, so the count shuffle moves 8-byte
  keys (+scope) instead of full text — ~10× less shuffle bytes on
  real web lines.  A key collision would merge two distinct lines'
  counts; at 60 bits that needs ~2^30 distinct lines per scope for a
  50 % chance of ONE collision — and the DuckDB oracle applies the
  identical keying, so parity is exact by construction regardless;
* per-(scope, key) distinct-doc counting is ``distinct`` →
  ``groupBy().count()`` — both map-side-combinable, AQE handles the
  skew of ultra-common lines ("Home", "©") because the distinct
  stage already collapsed them to one row per document;
* the boilerplate set joins back as a plain equi join on
  (scope, key) — broadcastable when small, shuffled hash join
  otherwise, never a nested loop;
* reassembly is ONE groupBy(doc) of (pos, line) structs —
  ``array_sort`` + ``concat_ws`` keeps it whole-stage-codegen.

Blank lines (trim == '') are never counted as boilerplate and are
always kept, so spacing inside kept prose is preserved byte-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sketches import md5_int64, sql_md5_int64

__all__ = ["strip_boilerplate_lines", "sql_strip_boilerplate_lines"]


def strip_boilerplate_lines(
    docs: DataFrame,
    min_docs: int = 3,
    scope_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per input doc: (id, text, n_kept, n_dropped) where
    ``text`` is the document with every boilerplate line removed — a
    line is boilerplate iff its trimmed content is non-empty and
    occurs in >= ``min_docs`` DISTINCT documents of the same scope.
    Every doc survives (a fully-boilerplate doc comes back with
    text = '' and n_kept = 0) so row count is invariant — the
    downstream quality filter decides what to do with husks.

    Precondition: NON-NULL text (ADVICE r5) — posexplode of
    split(NULL) yields zero rows, so a NULL-text doc would vanish
    rather than survive as a husk; ``fillna('', [text_col])`` first if
    the source can contain NULL text (the DuckDB twin assumes the
    same)."""
    lines = docs.select(
        F.col(id_col),
        F.col(scope_col).alias("__scope"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    ).withColumn("__k", md5_int64(F.trim(F.col("__line"))))

    boiler = (
        lines.filter(F.trim(F.col("__line")) != "")
        .select("__scope", "__k", id_col)
        .distinct()
        .groupBy("__scope", "__k")
        .count()
        .filter(F.col("count") >= min_docs)
        .select("__scope", "__k", F.lit(True).alias("__bp"))
    )

    flagged = lines.join(boiler, ["__scope", "__k"], "left")
    kept_struct = F.when(
        F.col("__bp").isNull(), F.struct("__pos", "__line")
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["__line"],
                ),
            ).alias(text_col),
            F.count(kept_struct).alias("n_kept"),
            F.count("__bp").alias("n_dropped"),
        )
    )


def sql_strip_boilerplate_lines(
    docs_sql: str,
    min_docs: int = 3,
    scope_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`strip_boilerplate_lines` — identical md5
    line keying, identical blank-line rule, ordered string_agg
    reassembly (coalesced to '' for fully-boilerplate docs, matching
    Spark's concat_ws over an empty array)."""
    k = sql_md5_int64(f"trim(__line)")
    return f"""
WITH __docs AS ({docs_sql}),
__lines AS (
  SELECT {id_col}, {scope_col} AS __scope,
         unnest(string_split({text_col}, chr(10))) AS __line,
         generate_subscripts(string_split({text_col}, chr(10)), 1) AS __pos
  FROM __docs
),
__keyed AS (SELECT *, {k} AS __k FROM __lines),
__boiler AS (
  SELECT __scope, __k FROM (
    SELECT DISTINCT __scope, __k, {id_col} FROM __keyed WHERE trim(__line) <> ''
  ) GROUP BY __scope, __k HAVING count(*) >= {min_docs}
)
SELECT l.{id_col},
       coalesce(string_agg(CASE WHEN b.__k IS NULL THEN l.__line END,
                           chr(10) ORDER BY l.__pos), '') AS {text_col},
       count(CASE WHEN b.__k IS NULL THEN 1 END) AS n_kept,
       count(b.__k) AS n_dropped
FROM __keyed l LEFT JOIN __boiler b
  ON l.__scope = b.__scope AND l.__k = b.__k
GROUP BY l.{id_col}
"""
