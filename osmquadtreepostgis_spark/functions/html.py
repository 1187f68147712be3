"""HTML -> text extraction, pure-Catalyst, with a generated DuckDB twin.

The BASELINE.json input table carries ``html:binary`` alongside
``text:string`` and pins "byte-identical extracted text per url" as
the per-row invariant — this module is the extraction step that
invariant constrains.  The whole pipeline is a chain of JVM
``regexp_replace`` / ``replace`` Columns (no Python worker, full
whole-stage codegen); the DuckDB twin is generated from the SAME
pattern table so the Spark plan and the oracle cannot drift.

Extraction contract (deterministic, reversible on well-formed input):

1. strip ``<!-- -->`` comments;
2. drop ``<script>``/``<style>``/``<head>`` elements INCLUDING their
   content (separate patterns per element — the twin dialect, RE2,
   has no backreferences);
3. strip remaining tags (``<[^>]*>``);
4. decode the five XML entities + ``&nbsp;`` (``&amp;`` decoded LAST
   so ``&amp;lt;`` round-trips to the literal ``&lt;``);
5. optionally collapse whitespace runs (``collapse_ws=True``) — OFF
   by default because the invariant is BYTE-identity against the
   source text, and the well-formed generator emits no stray runs.

Known limitation (documented, shared by every regex extractor): a
``>`` inside a quoted attribute value terminates the tag early.  The
synthetic corpus never emits one; real-corpus extraction would ride
the same contract with an HTML5 tokenizer behind a pandas UDF.

Reference parity: the reference pipeline starts from already-parsed
OSM PBF and has no markup-extraction stage; this operator belongs to
the north-rule web-pages retarget (BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "extract_text",
    "sql_extract_text",
    "escape_html",
    "sql_escape_html",
    "extract_links",
    "sql_extract_links_lateral",
]

# (regex, replacement) — applied in order, Java and RE2 compatible
_BLOCK_PATTERNS: list[tuple[str, str]] = [
    (r"(?s)<!--.*?-->", ""),
    (r"(?si)<script[^>]*>.*?</script>", ""),
    (r"(?si)<style[^>]*>.*?</style>", ""),
    (r"(?si)<head[^>]*>.*?</head>", ""),
    (r"<[^>]*>", ""),
]

# literal entity decodes, order matters: &amp; LAST
_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

# escaping (forward direction), order matters: & FIRST
_ESCAPES: list[tuple[str, str]] = [
    ("&", "&amp;"),
    ("<", "&lt;"),
    (">", "&gt;"),
]


def extract_text(html, collapse_ws: bool = False) -> Column:
    """Extracted visible text of an html string/binary column."""
    c = F.col(html) if isinstance(html, str) else html
    # cast(binary as string) IS the utf-8 decode in Spark; strings pass
    c = c.cast("string")
    for pat, rep in _BLOCK_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    for lit, rep in _ENTITIES:
        c = F.replace(c, F.lit(lit), F.lit(rep))
    if collapse_ws:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def escape_html(text) -> Column:
    """Forward escape (test/fixture helper): text -> entity-escaped."""
    c = F.col(text) if isinstance(text, str) else text
    for lit, rep in _ESCAPES:
        c = F.replace(c, F.lit(lit), F.lit(rep))
    return c


# --- link extraction -------------------------------------------------------

# both patterns are RE2-safe (no backtracking constructs): href is the
# quoted attribute value, anchor text is the tag body up to the first
# '<' (the fixture/crawl-normal case; nested markup inside <a> yields
# the leading text run, deterministically, in both engines)
_HREF_PATTERN = '<a href="([^"]*)"'
_ANCHOR_PATTERN = '<a href="[^"]*"[^>]*>([^<]*)</a>'


def extract_links(html) -> Column:
    """array<struct<href,anchor>> of the <a> tags of an html column.

    Two ``regexp_extract_all`` passes (one capture group each — the
    portable subset: neither engine extracts multiple groups per
    match) zipped positionally; pure Catalyst, no Python.  Pages
    without links yield an empty array.
    """
    c = F.col(html) if isinstance(html, str) else html
    c = c.cast("string")
    hrefs = F.regexp_extract_all(c, F.lit(_HREF_PATTERN), F.lit(1))
    anchors = F.regexp_extract_all(c, F.lit(_ANCHOR_PATTERN), F.lit(1))
    return F.arrays_zip(hrefs.alias("href"), anchors.alias("anchor"))


def sql_extract_links_lateral(rel: str, html_expr: str, keep_cols: str) -> str:
    """DuckDB twin, exploded form: one row per link with 0-based
    ``link_idx``, ``href``, ``anchor`` alongside ``keep_cols`` of
    ``rel`` (lateral unnest over the zipped extract arrays)."""
    return f"""(
      SELECT {keep_cols}, cast(u.i - 1 as bigint) AS link_idx,
             h.hrefs[u.i] AS href, h.anchors[u.i] AS anchor
      FROM (
        SELECT {keep_cols},
               regexp_extract_all({html_expr}, '{_HREF_PATTERN}', 1) AS hrefs,
               regexp_extract_all({html_expr}, '{_ANCHOR_PATTERN}', 1)
                 AS anchors
        FROM {rel}
      ) h, unnest(range(1, len(h.hrefs) + 1)) AS u(i)
    )"""


# --- ANSI-SQL twins (DuckDB dialect), generated from the same tables -------


def sql_extract_text(expr: str, collapse_ws: bool = False) -> str:
    s = expr
    for pat, rep in _BLOCK_PATTERNS:
        s = f"regexp_replace({s}, '{pat}', '{rep}', 'g')"
    for lit, rep in _ENTITIES:
        q = rep.replace("'", "''")
        s = f"replace({s}, '{lit}', '{q}')"
    if collapse_ws:
        s = f"trim(regexp_replace({s}, '\\s+', ' ', 'g'))"
    return s


def sql_escape_html(expr: str) -> str:
    s = expr
    for lit, rep in _ESCAPES:
        s = f"replace({s}, '{lit}', '{rep}')"
    return s
