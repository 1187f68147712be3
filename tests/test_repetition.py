"""Gopher repetition signals (functions/repetition.py): Spark vs
hand-computed values AND vs the generated DuckDB twins."""

import duckdb
import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.functions.repetition import (
    dup_line_char_frac,
    dup_line_frac,
    dup_ngram_frac,
    sql_dup_line_char_frac,
    sql_dup_line_frac,
    sql_dup_ngram_frac,
    sql_top_ngram_frac,
    top_ngram_frac,
)

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    "a b\na b\nc d",          # line 'a b' duplicated
    "x\nx\nx\nx",             # all lines identical
    "one\ntwo\nthree",        # no repetition
    "spam spam spam spam",    # one token repeated: top bigram covers all
    "a b c a b c a b d",      # repeated trigram 'a b c'
    "",                       # empty
    "single",                 # one line one token
]


def _spark_vals(spark):
    df = spark.createDataFrame([(t,) for t in DOCS], "text string")
    return df.select(
        "text",
        dup_line_frac("text").alias("dlf"),
        dup_line_char_frac("text").alias("dlcf"),
        top_ngram_frac("text", 2).alias("t2"),
        dup_ngram_frac("text", 3).alias("d3"),
    ).collect()


def test_hand_computed(spark):
    got = {r["text"]: r for r in _spark_vals(spark)}
    r = got["a b\na b\nc d"]
    assert r["dlf"] == pytest.approx(1 / 3)       # 3 lines, 2 distinct
    assert r["dlcf"] == pytest.approx(6 / 9)      # 'a b' twice = 6 of 9 chars
    r = got["x\nx\nx\nx"]
    assert r["dlf"] == pytest.approx(3 / 4)
    assert r["dlcf"] == pytest.approx(1.0)
    r = got["one\ntwo\nthree"]
    assert r["dlf"] == 0.0 and r["dlcf"] == 0.0
    r = got["spam spam spam spam"]
    # bigram 'spam spam' occurs 3x -> 3*2/4 capped at 1.0
    assert r["t2"] == pytest.approx(1.0)
    r = got["a b c a b c a b d"]
    # 7 trigrams, 5 distinct ('a b c' x2 extra... compute: grams =
    # abc,bca,cab,abc,bca,cab,abd -> wait 9 tokens -> 7 grams,
    # distinct = abc,bca,cab,abd = 4 -> dup frac 3/7
    assert r["d3"] == pytest.approx(3 / 7)
    r = got[""]
    assert (r["dlf"], r["dlcf"], r["t2"], r["d3"]) == (0.0, 0.0, 0.0, 0.0)
    r = got["single"]
    assert (r["dlf"], r["dlcf"], r["t2"], r["d3"]) == (0.0, 0.0, 0.0, 0.0)


def test_spark_matches_duckdb_twins(spark):
    spark_rows = {
        r["text"]: (r["dlf"], r["dlcf"], r["t2"], r["d3"])
        for r in _spark_vals(spark)
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d(text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?)", [(t,) for t in DOCS])
    q = (
        f"SELECT text, {sql_dup_line_frac('text')} AS dlf, "
        f"{sql_dup_line_char_frac('text')} AS dlcf, "
        f"{sql_top_ngram_frac('text', 2)} AS t2, "
        f"{sql_dup_ngram_frac('text', 3)} AS d3 FROM d"
    )
    for text, dlf, dlcf, t2, d3 in con.execute(q).fetchall():
        assert spark_rows[text] == pytest.approx((dlf, dlcf, t2, d3))


def test_token_delim_variant(spark):
    """line_delim=' ' makes token repeats line repeats (the oracle
    query's non-vacuous configuration)."""
    df = spark.createDataFrame([("spam spam eggs",)], "text string")
    r = df.select(dup_line_frac("text", " ").alias("v")).collect()[0]
    assert r["v"] == pytest.approx(1 / 3)


def test_frame_modes_agree_exactly(spark):
    """mode='explode' (giant-doc fallback: explode + groupBy + n-way
    position join) computes the SAME integer intermediates as the
    in-row sorted-run shape, so the double results are exactly equal."""
    from osmquadtreepostgis_spark.functions.repetition import (
        repetition_signals_frame,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    # extra hand-built edge cases: heavy repeats, single token, empty
    extra = spark.createDataFrame(
        [
            (100001, "a a a a a"),
            (100002, "x"),
            (100003, ""),
            (100004, "p q p q p q r"),
        ],
        "doc_id bigint, text string",
    )
    d = docs.union(extra)
    kw = dict(line_delim=" ", top_n=2, dup_n=2)
    a = {
        r["doc_id"]: (
            r["dup_line_frac"],
            r["dup_line_char_frac"],
            r["top_ngram_frac"],
            r["dup_ngram_frac"],
        )
        for r in repetition_signals_frame(d, mode="inrow", **kw).collect()
    }
    b = {
        r["doc_id"]: (
            r["dup_line_frac"],
            r["dup_line_char_frac"],
            r["top_ngram_frac"],
            r["dup_ngram_frac"],
        )
        for r in repetition_signals_frame(d, mode="explode", **kw).collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], (k, a[k], b[k])  # exact, not approx


def test_frame_unknown_mode_raises(spark):
    from osmquadtreepostgis_spark.functions.repetition import (
        repetition_signals_frame,
    )

    docs = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="mode"):
        repetition_signals_frame(docs, mode="nope")
