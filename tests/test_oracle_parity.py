"""Local replica of the driver's correctness gate: every queries()
entry vs its oracle_sql() twin on sf0.001 via DuckDB — row count,
column names, and order-insensitive values must match exactly.
"""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    # normalize float noise the same way for both engines
    for c in pdf.columns:
        if pdf[c].dtype == "float64":
            pdf[c] = pdf[c].round(9)
        if pdf[c].dtype == "object":
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


_QUERIES = sorted(entrymod.queries())


@pytest.mark.parametrize("name", _QUERIES)
def test_query_matches_oracle(name, spark, ddb):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    got = q(spark, SF_DIR).toPandas()
    assert sql is not None, f"no oracle for {name} (rows-only check)"
    want = ddb.sql(sql).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    g = _canon(got)
    w = _canon(want)
    assert len(g) == len(w), f"{name}: rows {len(g)} != {len(w)}"
    # The driver's value-hash is dtype-sensitive (e.g. DuckDB types
    # sum(INTEGER) as HUGEINT -> float64/object in pandas, while Spark
    # returns int64) -- compare dtype kinds so that class of mismatch
    # fails locally too, not just in CORRECTNESS_r{N}.json.
    kinds_g = {c: g[c].dtype.kind for c in g.columns}
    kinds_w = {c: w[c].dtype.kind for c in w.columns}
    assert kinds_g == kinds_w, f"{name}: dtype kinds {kinds_g} != {kinds_w}"
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
    except AssertionError as e:
        raise AssertionError(f"{name}: value mismatch\n{e}") from None


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert {"tile", "poly_id", "n_mentions"} <= set(df.columns)


def test_contract_completeness():
    """Every queries() entry must keep its oracle twin (a dropped
    oracle silently downgrades the driver's check to rows-only)."""
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert set(qs) == set(osql), sorted(set(qs) ^ set(osql))
    assert len(qs) >= 38
