"""HTML -> text extraction (functions/html.py) — the input_hint's
byte-identical extracted-text invariant."""

import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.functions.html import (
    escape_html,
    extract_text,
)
from osmquadtreepostgis_spark.sources.pages import pages

pytestmark = pytest.mark.usefixtures("spark")


def test_extract_text_byte_identical_on_pages(spark):
    """The per-row invariant from BASELINE.json: extracting from the
    html column reproduces the text column byte-for-byte, per url."""
    p = pages(spark, 2000)
    bad = p.filter(
        extract_text(F.col("html")) != F.col("text")
    ).count()
    assert bad == 0


CASES = [
    # (html, expected)
    ("<p>plain</p>", "plain"),
    ("<html><body>a <b>bold</b> move</body></html>", "a bold move"),
    ("<head><title>t</title></head><body>kept</body>", "kept"),
    ("<script>if (1 < 2) { x = '</p>'; }</script>after", "after"),
    ("<style>p { color: red; }</style>text", "text"),
    ("<!-- a <b> comment -->visible", "visible"),
    ("&lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39;&nbsp;end", "<tag> & \"q\" 's' end"),
    ("&amp;lt; stays escaped-once", "&lt; stays escaped-once"),
    ('<a href="x.html" class="b">link</a>', "link"),
    ("<SCRIPT TYPE='x'>nope</SCRIPT>ok", "ok"),
    ("", ""),
]


def test_extract_text_cases(spark):
    df = spark.createDataFrame(
        [(h, e) for h, e in CASES], "html string, expected string"
    )
    rows = df.select(
        extract_text(F.col("html")).alias("got"), "expected"
    ).collect()
    for r in rows:
        assert r["got"] == r["expected"]


def test_escape_extract_roundtrip(spark):
    """Any text wrapped in markup + escaped survives extraction
    byte-identically (the invariant the html_extract query checks)."""
    texts = [
        "simple",
        "with & ampersand",
        "a < b > c",
        'quotes " and \' here',
        "&amp; pre-escaped source text",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    wrapped = df.select(
        "t",
        F.concat(
            F.lit("<html><!-- c --><head><script>1<2</script></head><body><p>"),
            escape_html(F.col("t")),
            F.lit("</p></body></html>"),
        ).alias("html"),
    )
    rows = wrapped.select("t", extract_text(F.col("html")).alias("got")).collect()
    for r in rows:
        assert r["got"] == r["t"]


def test_extract_text_collapse_ws(spark):
    df = spark.createDataFrame([("<p>a</p>\n  <p>b</p>",)], "html string")
    got = df.select(
        extract_text(F.col("html"), collapse_ws=True).alias("g")
    ).collect()[0]["g"]
    assert got == "a b"
