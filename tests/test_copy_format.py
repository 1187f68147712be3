"""COPY-text / hstore emitters: byte-compatibility with PostgreSQL's
COPY FROM (FORMAT text) + hstore text literals (F4/S3,
src/postgiswriter.cpp:404,1193-1328)."""

import glob
import gzip

from pyspark.sql import functions as F

from osmquadtreepostgis_spark.sources.sinks import (
    copy_text_row,
    hstore_literal,
    write_tables_copy_text,
)


def _copy_unescape(s: str) -> str:
    """Inverse of COPY TEXT escaping (the parse PostgreSQL applies)."""
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\":
            n = s[i + 1]
            out.append({"t": "\t", "n": "\n", "r": "\r", "\\": "\\"}[n])
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def test_hstore_literal_escaping(spark):
    df = spark.createDataFrame(
        [({"b": "plain", "a": 'q"uote', "c": "back\\slash"},)], "m map<string,string>"
    )
    lit = df.select(hstore_literal("m").alias("h")).collect()[0]["h"]
    # sorted by key; quotes and backslashes escaped inside quotes
    assert lit == '"a"=>"q\\"uote", "b"=>"plain", "c"=>"back\\\\slash"'


def test_copy_text_row_bytes(spark):
    df = spark.createDataFrame(
        [
            (1, "tab\there\nand newline", bytearray(b"\x01\xab"), {"k": "v"}),
            (2, None, None, None),
        ],
        "id long, txt string, blob binary, tags map<string,string>",
    )
    rows = {
        r["id"]: r["line"]
        for r in df.select(
            "id", copy_text_row(df).alias("line")
        ).collect()
    }
    f1 = rows[1].split("\t")
    # escaped tab/newline keep the row to one line, 4 fields
    assert len(f1) == 4
    assert _copy_unescape(f1[1]) == "tab\there\nand newline"
    assert f1[2] == "\\\\x01ab"  # bytea \x hex, backslash doubled on the wire
    assert _copy_unescape(f1[3]) == '"k"=>"v"'
    assert rows[2].split("\t")[1:] == ["\\N", "\\N", "\\N"]


def test_write_tables_copy_text_roundtrip(spark, tmp_path):
    routed = spark.createDataFrame(
        [
            ("line", 1, "name\twith tab", {"x": "1"}),
            ("line", 2, None, None),
            ("point", 3, "plain", {"y": "2"}),
        ],
        "table string, osm_id long, name string, tags map<string,string>",
    )
    paths = write_tables_copy_text(routed, str(tmp_path))
    assert set(paths) == {"line", "point"}
    lines = []
    for f in sorted(set(glob.glob(paths["line"] + "/part-*.gz"))):
        with gzip.open(f, "rt") as fh:
            lines += [ln.rstrip("\n") for ln in fh if ln.strip()]
    got = sorted(ln.split("\t") for ln in lines)
    assert got[0][0] == "1" and _copy_unescape(got[0][1]) == "name\twith tab"
    assert got[1] == ["2", "\\N", "\\N"]
