"""TF-IDF keyword extraction and PMI collocation mining
(operators/tfidf.py): closed-form oracles, DuckDB twin parity on a
hand-built corpus, edge-input robustness, and plan discipline."""

import math

import duckdb
import pytest

from osmquadtreepostgis_spark.operators.tfidf import (
    collocations_pmi,
    sql_collocations_pmi,
    sql_tfidf_topk,
    tfidf_topk,
)

CORPUS = [
    (1, "apple banana apple cherry"),
    (2, "banana banana durian"),
    (3, "apple elderberry elderberry elderberry"),
    (4, "cherry durian"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_tfidf_closed_form(spark, docs):
    """Doc 1: apple cnt=2/4 df=2, banana 1/4 df=2, cherry 1/4 df=2.
    idf identical for all three -> ranked by tf then term asc."""
    out = tfidf_topk(docs, k=3).toPandas()
    d1 = out[out.doc_id == 1].sort_values("tfidf", ascending=False)
    assert list(d1.term) == ["apple", "banana", "cherry"]
    idf = math.log(5.0 / 3.0) + 1.0
    assert d1.iloc[0].tfidf == round((2 / 4) * idf, 4)
    assert d1.iloc[0].cnt == 2 and d1.iloc[0].dfreq == 2
    # doc 3: elderberry df=1 (rarest) must outrank apple df=2
    d3 = out[out.doc_id == 3]
    assert list(d3.term)[:1] == ["elderberry"]


def test_tfidf_tie_break_term_asc(spark):
    """Equal (cnt, df) inside a doc -> identical score -> term asc."""
    df = spark.createDataFrame([(1, "beta alpha"), (2, "alpha beta")],
                               ["doc_id", "text"])
    out = tfidf_topk(df, k=1).toPandas().sort_values("doc_id")
    assert list(out.term) == ["alpha", "alpha"]


def test_tfidf_duckdb_twin(spark, docs):
    con = duckdb.connect()
    con.sql(
        "create view documents as select * from (values "
        + ", ".join(f"({i}, '{t}')" for i, t in CORPUS)
        + ") v(doc_id, text)"
    )
    oracle = con.sql(sql_tfidf_topk("documents", k=3)).df()
    mine = tfidf_topk(docs, k=3).toPandas()
    cols = sorted(mine.columns)
    assert sorted(oracle.columns) == cols
    a = mine[cols].sort_values(cols).reset_index(drop=True)
    b = oracle[cols].sort_values(cols).reset_index(drop=True)
    b["doc_id"] = b["doc_id"].astype("int64")
    a = a.astype({c: b[c].dtype for c in cols})
    assert a.equals(b)


def test_pmi_closed_form(spark):
    """'x y' always adjacent vs independent fillers: the bound pair
    must take PMI rank 1 and match the hand-computed value."""
    rows = [(i, "x y a" + str(i % 3) + " b" + str(i % 2)) for i in range(12)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # min_count=5 isolates the bound pair: filler pairs occur <= 4 times
    out = collocations_pmi(df, min_count=5, k=5).toPandas()
    top = out.iloc[0]
    assert (top.w1, top.w2) == ("x", "y")
    # 12 docs x 4 tokens: U=48, c_x=c_y=12, B=12*3=36, c_xy=12
    expect = math.log((12 / 36) / ((12 / 48) * (12 / 48)))
    assert top.pmi == round(expect, 4)
    assert top.pair_cnt == 12 and top.w1_cnt == 12 and top.w2_cnt == 12


def test_pmi_min_count_floor(spark):
    df = spark.createDataFrame(
        [(1, "p q p q"), (2, "r s")], ["doc_id", "text"]
    )
    out = collocations_pmi(df, min_count=2, k=10).toPandas()
    assert set(zip(out.w1, out.w2)) == {("p", "q")}


def test_pmi_duckdb_twin(spark):
    rows = [(i, f"x y a{i % 3} x b{i % 2} y") for i in range(9)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    con = duckdb.connect()
    con.sql(
        "create view documents as select * from (values "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") v(doc_id, text)"
    )
    oracle = con.sql(sql_collocations_pmi("documents", min_count=1, k=50)).df()
    mine = collocations_pmi(df, min_count=1, k=50).toPandas()
    cols = sorted(mine.columns)
    a = mine[cols].sort_values(cols).reset_index(drop=True)
    b = oracle[cols].sort_values(cols).reset_index(drop=True)
    a = a.astype({c: b[c].dtype for c in cols})
    assert a.equals(b)


def test_edge_inputs(spark):
    """NULL text, empty text, and single-token docs neither crash nor
    contribute phantom terms/pairs."""
    df = spark.createDataFrame(
        [(1, "a b a"), (2, None), (3, ""), (4, "solo")],
        ["doc_id", "text"],
    )
    kw = tfidf_topk(df).toPandas()
    assert set(kw.doc_id) == {1, 4}
    assert "" not in set(kw.term)
    pairs = collocations_pmi(df, min_count=1, k=10).toPandas()
    assert set(zip(pairs.w1, pairs.w2)) == {("a", "b"), ("b", "a")}


def test_plans_have_no_cartesian(spark, docs):
    for frame in (tfidf_topk(docs), collocations_pmi(docs, min_count=1)):
        plan = frame._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "CartesianProduct" not in plan
