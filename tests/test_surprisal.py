"""Unigram surprisal: closed-form bits, rare-vs-common ordering,
partitioning determinism, DuckDB twin."""

import duckdb

from osmquadtreepostgis_spark.operators.tfidf import (
    sql_unigram_surprisal,
    unigram_surprisal,
)


def _docs(spark):
    # corpus: 'the' x8, 'rare' x1, 'mid' x2  => total 11 tokens
    rows = [
        (1, "the the the the"),
        (2, "the the the the"),
        (3, "rare mid mid"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_closed_form_bits(spark):
    out = {r.doc_id: r for r in unigram_surprisal(_docs(spark)).collect()}
    # total=11 -> ilog2=3; the: cnt 8 -> ilog2 3 -> bits 0
    # rare: cnt 1 -> 3 bits; mid: cnt 2 -> 2 bits
    assert out[1].n_tokens == 4 and out[1].sum_bits == 0
    assert out[1].surprisal == 0.0
    assert out[3].n_tokens == 3 and out[3].sum_bits == 3 + 2 + 2
    assert abs(out[3].surprisal - 7 / 3) < 1e-15
    # rare-token doc scores strictly above stop-word doc
    assert out[3].surprisal > out[1].surprisal


def test_partitioning_invariance(spark):
    d = _docs(spark)
    a = sorted(map(tuple, unigram_surprisal(d).collect()))
    b = sorted(map(tuple, unigram_surprisal(d.repartition(13)).collect()))
    assert a == b


def test_duckdb_twin(spark):
    got = sorted(map(tuple, unigram_surprisal(_docs(spark)).collect()))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW docs AS SELECT * FROM (VALUES "
        "(1, 'the the the the'), (2, 'the the the the'), "
        "(3, 'rare mid mid')) t(doc_id, text)"
    )
    want = sorted(
        map(tuple, con.execute(sql_unigram_surprisal("docs")).fetchall())
    )
    assert got == want


def test_plan_no_python(spark):
    plan = (
        unigram_surprisal(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
