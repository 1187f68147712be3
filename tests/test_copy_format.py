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


def test_copy_binary_roundtrip(spark):
    """PGCOPY binary stream (F5/F7): signature, big-endian length
    prefixes, NULLs, hstore send format — parsed back exactly."""
    from osmquadtreepostgis_spark.sources.copy_binary import (
        PGCOPY_SIGNATURE,
        copy_binary_blocks,
        parse_copy_binary,
    )

    df = spark.createDataFrame(
        [
            (1, 2.5, "txt", bytearray(b"\x00\xff"), {"a": "1", "b": None}),
            (2, None, None, None, None),
        ],
        "id long, x double, s string, b binary, m map<string,string>",
    ).coalesce(1)
    blocks = copy_binary_blocks(df).collect()
    assert len(blocks) == 1 and blocks[0]["n_rows"] == 2
    raw = bytes(blocks[0]["block"])
    assert raw.startswith(PGCOPY_SIGNATURE)
    rows = parse_copy_binary(raw, ["long", "double", "string", "binary", "map"])
    assert rows[0] == (1, 2.5, "txt", b"\x00\xff", {"a": "1", "b": None})
    assert rows[1] == (2, None, None, None, None)


def test_compact_and_analyze(spark, tmp_path):
    """D5 analog: compaction shrinks the file count preserving rows +
    order layout; analyze returns one-pass per-column stats."""
    import numpy as np
    import pandas as pd

    from osmquadtreepostgis_spark.functions.cells import cell_encode_udf
    from osmquadtreepostgis_spark.sources.maintenance import (
        analyze_table,
        compact_table,
    )

    rng = np.random.default_rng(3)
    path = str(tmp_path / "t")
    # fragmented table: 5 incremental appends, each clustered write
    # leaves its own small file per partition dir (the accumulation
    # pattern VACUUM exists for)
    from osmquadtreepostgis_spark.functions.cells import cell_tile_col

    for i in range(5):
        pdf = pd.DataFrame(
            {
                "pt_id": np.arange(i * 1000, (i + 1) * 1000),
                # one small region -> few partition dirs, many files each
                "lon": rng.uniform(5, 15, 1000),
                "lat": rng.uniform(45, 55, 1000),
            }
        )
        df = spark.createDataFrame(pdf).withColumn(
            "cell", cell_encode_udf(18)("lon", "lat")
        ).withColumn("__ptile", cell_tile_col("cell", 4))
        df.write.mode("append").partitionBy("__ptile").parquet(path)
    res = compact_table(spark, path, target_rows_per_file=5000)
    assert res["rows"] == 5000
    assert res["files_after"] < res["files_before"]
    back = spark.read.parquet(path)
    assert back.count() == 5000
    stats = {r["column"]: r for r in analyze_table(back.drop("__ptile"))}
    assert stats["pt_id"]["n_rows"] == 5000
    assert stats["pt_id"]["n_nulls"] == 0
    assert int(stats["pt_id"]["min"]) == 0 and int(stats["pt_id"]["max"]) == 4999
    assert abs(stats["pt_id"]["approx_distinct"] - 5000) / 5000 < 0.15


def test_copy_binary_nan_is_not_null(spark):
    """Float NaN is a valid PostgreSQL float8 value: it must ship as
    IEEE754 bytes, while a true SQL NULL ships as length -1 — the Arrow
    null bitmap keeps them distinct (ADVICE r2 #5)."""
    import math

    from pyspark.sql import functions as F

    from osmquadtreepostgis_spark.sources.copy_binary import (
        copy_binary_blocks,
        parse_copy_binary,
    )

    df = (
        spark.range(3)
        .select(
            F.col("id").cast("long"),
            F.when(F.col("id") == 0, F.lit(1.5))
            .when(F.col("id") == 1, F.lit(float("nan")))
            .otherwise(F.lit(None).cast("double"))
            .alias("x"),
        )
        .coalesce(1)
    )
    raw = bytes(copy_binary_blocks(df).collect()[0]["block"])
    rows = dict(parse_copy_binary(raw, ["long", "double"]))
    assert rows[0] == 1.5
    assert isinstance(rows[1], float) and math.isnan(rows[1])
    assert rows[2] is None
