"""PII scrubbing (functions/pii.py): detector hits/non-hits and the
counts-match-replacements invariant, Spark vs DuckDB twin."""

import duckdb
import pytest

from osmquadtreepostgis_spark.functions.pii import (
    pii_counts,
    scrub_pii,
    sql_pii_counts,
    sql_scrub_pii,
)

CASES = [
    # (text, expect_email, expect_ip, expect_phone)
    ("mail me at alice.smith+x@sub.example.co.uk thanks", 1, 0, 0),
    ("server at 10.0.255.3 responded", 0, 1, 0),
    ("call +1 555-019-2234 or (020) 7946 0958 now", 0, 0, 2),
    ("born in 1984, id 123456789, room 42", 0, 0, 0),  # bare digit runs survive
    ("a@b.co and 192.168.1.1 and +44 20 7946-0958", 1, 1, 1),
    ("no pii here at all", 0, 0, 0),
    ("version 1.2.3.4 of the lib", 0, 1, 0),  # dotted quad = IP shape, documented
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(CASES)], "i int, t string"
    )
    ne, ni, np_ = pii_counts("t")
    return {
        r["i"]: (r["c"], r["ne"], r["ni"], r["np"])
        for r in df.select(
            "i",
            scrub_pii("t").alias("c"),
            ne.alias("ne"),
            ni.alias("ni"),
            np_.alias("np"),
        ).collect()
    }


def test_detector_counts(scrubbed):
    for i, (t, ee, ei, ep) in enumerate(CASES):
        c, ne, ni, np_ = scrubbed[i]
        assert (ne, ni, np_) == (ee, ei, ep), (t, ne, ni, np_)


def test_counts_match_replacements(scrubbed):
    for i, _ in enumerate(CASES):
        c, ne, ni, np_ = scrubbed[i]
        assert c.count("<EMAIL>") == ne
        assert c.count("<IP>") == ni
        assert c.count("<PHONE>") == np_


def test_duckdb_twin_byte_identical(scrubbed):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, txt VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(i, t) for i, (t, *_) in enumerate(CASES)],
    )
    ne, ni, np_ = sql_pii_counts("txt")
    q = (
        f"SELECT i, {sql_scrub_pii('txt')} AS c, {ne} AS ne, "
        f"{ni} AS ni, {np_} AS np FROM t"
    )
    for i, c, ne_v, ni_v, np_v in con.execute(q).fetchall():
        assert scrubbed[i] == (c, ne_v, ni_v, np_v), i


def test_phone_long_groups_leave_no_residue(spark):
    """Digit runs longer than 4 next to a prefix are swallowed whole —
    no digit residue beside the placeholder (code-review r4)."""
    from osmquadtreepostgis_spark.functions.pii import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "call +44 20 79460000 today"),
            (2, "call +44 20 79123-09123 today"),
            (3, "+1 5551234567"),
        ],
        "i int, t string",
    )
    got = {r["i"]: r["c"] for r in df.select("i", scrub_pii("t").alias("c")).collect()}
    assert got[1] == "call <PHONE> today"
    assert got[2] == "call <PHONE> today"
    assert got[3] == "<PHONE>"
    for v in got.values():
        import re
        assert not re.search(r"<PHONE>[0-9]|[0-9]<PHONE>", v), v
