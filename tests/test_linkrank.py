"""Fixed-point link rank: closed-form recurrence, dangling/isolated
handling, partitioning determinism, DuckDB twin."""

import duckdb
import pytest

from osmquadtreepostgis_spark.operators.linkrank import linkrank, sql_linkrank


def _graph(spark):
    pages = spark.createDataFrame([(1,), (2,), (3,), (4,)], "doc_id bigint")
    links = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1), (2, 99)],  # 2->99 dangles
        "src bigint, dst bigint",
    )
    return pages, links


# hand-computed: r0=1e6; after the dangling edge drop outdeg(2)=1
EXPECTED = {
    1: (2, 1.36125),
    2: (1, 0.575),
    3: (1, 1.06375),
    4: (0, 0.15),  # isolated page: pure base both rounds
}


def test_closed_form_two_iterations(spark):
    pages, links = _graph(spark)
    out = {r.doc_id: (r.outdeg, r.rank) for r in linkrank(pages, links).collect()}
    assert out == EXPECTED


def test_partitioning_invariance(spark):
    pages, links = _graph(spark)
    a = sorted(map(tuple, linkrank(pages, links).collect()))
    b = sorted(
        map(tuple, linkrank(pages.repartition(7), links.repartition(5)).collect())
    )
    assert a == b == sorted((k, *v) for k, v in EXPECTED.items())


def test_duckdb_twin(spark):
    pages, links = _graph(spark)
    got = sorted(map(tuple, linkrank(pages, links).collect()))
    con = duckdb.connect()
    con.sql("CREATE VIEW pages AS SELECT * FROM (VALUES (1),(2),(3),(4)) t(doc_id)")
    con.sql(
        "CREATE VIEW links AS SELECT * FROM (VALUES "
        "(1,2),(1,3),(2,3),(3,1),(2,99)) t(src, dst)"
    )
    want = sorted(map(tuple, con.execute(sql_linkrank("pages", "links")).fetchall()))
    assert got == want


def test_bad_iterations(spark):
    pages, links = _graph(spark)
    with pytest.raises(ValueError):
        linkrank(pages, links, iterations=0)
    with pytest.raises(ValueError):
        sql_linkrank("pages", "links", iterations=0)


def test_plan_no_python_no_cartesian(spark):
    pages, links = _graph(spark)
    plan = linkrank(pages, links)._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                "BroadcastNestedLoopJoin"):
        assert bad not in plan
