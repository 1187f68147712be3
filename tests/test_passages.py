"""Passage-level (C4-style) global dedup semantics."""

import duckdb
import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.operators.passages import (
    explode_passages,
    passage_dedup,
    sql_passage_dedup,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_explode_chunking(spark):
    d = _df(spark, [(1, "a b c d e f g h i j")])
    out = sorted(
        explode_passages(d, words_per_passage=4).collect(), key=lambda r: r.idx
    )
    assert [(r.idx, r.passage) for r in out] == [
        (0, "a b c d"),
        (1, "e f g h"),
        (2, "i j"),  # final partial chunk is kept
    ]


def test_global_first_occurrence(spark):
    # doc 1 and doc 2 share a passage; doc 2 repeats one internally
    d = _df(
        spark,
        [
            (1, "dup dup dup dup tail one"),
            (2, "dup dup dup dup dup dup dup dup"),
            (3, "fresh text only here now"),
        ],
    )
    out = {
        r.doc_id: r
        for r in passage_dedup(d, words_per_passage=4).collect()
    }
    # doc 1 owns the first occurrence (rank doc_id*B+idx minimal)
    assert out[1].n_kept == 2 and out[1].text_kept == "dup dup dup dup tail one"
    # doc 2: both its chunks equal doc 1's chunk 0 -> all dropped
    assert out[2].n_passages == 2 and out[2].n_kept == 0
    assert out[2].text_kept == ""
    assert out[3].n_kept == out[3].n_passages == 2
    assert out[3].text_kept == "fresh text only here now"


def test_reassembly_preserves_order(spark):
    words = " ".join(f"w{i}" for i in range(40))
    d = _df(spark, [(7, words)])
    row = passage_dedup(d, words_per_passage=8).collect()[0]
    assert row.text_kept == words


def test_duckdb_twin_on_crafted_rows():
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'dup dup dup dup tail one'),"
        "(2, 'dup dup dup dup dup dup dup dup'),"
        "(3, 'fresh text only here now')) t(doc_id, text)"
    )
    got = {
        r[0]: r
        for r in con.execute(
            sql_passage_dedup(words_per_passage=4)
        ).fetchall()
    }
    assert got[1][1:] == (2, 2, "dup dup dup dup tail one")
    assert got[2][1:] == (2, 0, "")
    assert got[3][1:] == (2, 2, "fresh text only here now")


def test_rejects_bad_width(spark):
    with pytest.raises(ValueError):
        explode_passages(_df(spark, [(1, "a")]), words_per_passage=0)


def test_plan_has_no_python_or_cartesian(spark):
    d = _df(spark, [(1, "a b c"), (2, "d e f")])
    plan = (
        passage_dedup(d)._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                "BroadcastNestedLoopJoin"):
        assert bad not in plan
