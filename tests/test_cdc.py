"""Content-defined chunking (functions/cdc.py): boundary determinism,
edit locality (the property CDC exists for), and engine parity."""

import duckdb
import pandas as pd
import pytest

from osmquadtreepostgis_spark.functions.cdc import cdc_chunks, sql_cdc_chunks


@pytest.fixture(scope="module")
def chunks(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return cdc_chunks(docs).toPandas()


def test_chunks_tile_each_doc(spark, chunks):
    """chunk_idx is 1..n per doc and n_tokens sums to the doc's token
    count — chunks partition the token stream exactly."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).toPandas()
    docs["S"] = docs.text.str.split(" ").str.len()
    g = chunks.groupby("doc_id")
    for doc_id, grp in g:
        idx = sorted(grp.chunk_idx)
        assert idx == list(range(1, len(grp) + 1))
        assert grp.n_tokens.sum() == int(docs.loc[docs.doc_id == doc_id, "S"].iloc[0])


def test_edit_locality(spark):
    """Inserting a paragraph mid-document changes ONLY chunks near the
    edit: chunk hashes before and (shifted) after the insertion
    survive — the property fixed-size blocks lack."""
    base = " ".join(f"tok{i * 7 % 997}" for i in range(160))
    toks = base.split(" ")
    ins = " ".join(toks[:80] + ["INSERTED", "PARAGRAPH", "HERE"] + toks[80:])
    df = spark.createDataFrame(
        [(1, base), (2, ins)], "doc_id long, text string"
    )
    ch = cdc_chunks(df).toPandas()
    h1 = set(ch[ch.doc_id == 1].chunk_hash)
    h2 = set(ch[ch.doc_id == 2].chunk_hash)
    # the doc chunks into several pieces, and every chunk not touching
    # the insertion survives verbatim (boundaries re-synchronize)
    assert len(h1) >= 3, len(h1)
    assert len(h1 & h2) >= len(h1) - 2, (len(h1), len(h1 & h2))


def test_short_and_null_docs(spark):
    df = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, None)], "doc_id long, text string"
    )
    ch = cdc_chunks(df).toPandas()
    got = {r.doc_id: (r.chunk_idx, r.n_tokens) for r in ch.itertuples()}
    assert got[1] == (1, 2)   # shorter than window -> one whole-doc chunk
    assert got[2] == (1, 1)   # "" splits to one empty token
    assert 3 not in got       # NULL text -> no rows


def test_duckdb_twin_bit_identical(spark, chunks):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = con.sql(sql_cdc_chunks()).df()
    a = chunks.sort_values(["doc_id", "chunk_idx"], ignore_index=True)
    b = want.sort_values(["doc_id", "chunk_idx"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
