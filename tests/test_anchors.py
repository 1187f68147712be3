"""Anchor extraction and the content-derived linkrank composition."""

import duckdb
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.functions.html import (
    extract_links,
    sql_extract_links_lateral,
)

SF = "/root/testdata/sf0.001"


def test_extract_links_basic(spark):
    df = spark.createDataFrame(
        [
            (1, '<p>x</p><a href="https://a.org/1">one</a>'
                '<a href="https://b.org/2" rel="nofollow">two</a>'),
            (2, "<p>no links</p>"),
        ],
        "doc_id bigint, html string",
    )
    rows = df.select("doc_id", extract_links("html").alias("links")).collect()
    by_id = {r.doc_id: r.links for r in rows}
    assert [(l.href, l.anchor) for l in by_id[1]] == [
        ("https://a.org/1", "one"),
        ("https://b.org/2", "two"),
    ]
    assert by_id[2] == []


def test_extract_links_duckdb_twin(spark):
    html = (
        '<a href="https://a.org/1">one</a>text'
        '<a href="https://b.org/9">two words</a>'
    )
    df = spark.createDataFrame([(7, html)], "doc_id bigint, html string")
    got = sorted(
        (r.doc_id, r.pos, r.col.href, r.col.anchor)
        for r in df.select(
            "doc_id", F.posexplode(extract_links("html"))
        ).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW t AS SELECT 7 AS doc_id, '{html}' AS html"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                "SELECT doc_id, link_idx, href, anchor FROM "
                + sql_extract_links_lateral("t", "html", "doc_id")
            ).fetchall(),
        )
    )
    assert got == want


def test_anchor_linkrank_equals_formula_linkrank(spark):
    """The parsed-from-html graph must reproduce the formula graph's
    ranks exactly (the href path encodes the same targets)."""
    import __spark_entry__ as e

    a = sorted(map(tuple, e.queries()["anchor_linkrank"](spark, SF).collect()))
    b = sorted(map(tuple, e.queries()["linkrank"](spark, SF).collect()))
    assert a == b
    assert len(a) == 500  # sf0.001 page count


def test_plan_pure_catalyst(spark):
    import __spark_entry__ as e

    plan = (
        e.queries()["anchor_extract"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
