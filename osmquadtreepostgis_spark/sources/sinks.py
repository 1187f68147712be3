"""Output sinks (SURVEY.md §2.1 S3-S6).

* ``write_tables_parquet`` — the PostGIS-COPY analog: one table dir
  per routed output table, tile-range-clustered (S3; the reference's
  single-transaction COPY, src/postgiswriter.cpp:1193-1328, maps to
  atomic per-table overwrite).
* ``write_tables_csv_gz`` — gzip CSV per table, header once, WKB hex
  at the export boundary (S4, src/postgis_python.cpp:168-203).
* ``dry_run_counts`` — row+byte counts per table instead of writing
  (S6, the connstring=="null" counting sink,
  src/postgiswriter.cpp:1338-1360).
* ``foreach_batch_sink`` — user-callback sink for streaming
  micro-batches (X3, the reference's csvblock python callback,
  src/postgis_python.cpp:136-158).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "write_tables_parquet",
    "write_tables_csv_gz",
    "dry_run_counts",
    "foreach_batch_sink",
]


def _split_by_table(routed: DataFrame, table_col: str = "table"):
    tables = [r[0] for r in routed.select(table_col).distinct().collect()]
    for t in sorted(tables):
        yield t, routed.filter(F.col(table_col) == t).drop(table_col)


def write_tables_parquet(
    routed: DataFrame, out_dir: str, table_col: str = "table", cluster_col: str | None = "tile"
) -> dict[str, str]:
    """One parquet table per routed target, optionally range-clustered
    by tile so file min/max stats prune tile-range scans (the
    gist-index replacement)."""
    paths = {}
    for t, df in _split_by_table(routed, table_col):
        if cluster_col and cluster_col in df.columns:
            df = df.repartitionByRange(cluster_col)
        path = f"{out_dir.rstrip('/')}/{t}"
        df.write.mode("overwrite").parquet(path)
        paths[t] = path
    return paths


def write_tables_csv_gz(
    routed: DataFrame, out_dir: str, table_col: str = "table"
) -> dict[str, str]:
    """gzip CSV per table; binary columns hex-encoded, map columns
    json-encoded at the export boundary (the reference only
    stringifies on the wire, src/postgiswriter.cpp:232-240)."""
    paths = {}
    for t, df in _split_by_table(routed, table_col):
        cols = []
        for f in df.schema.fields:
            c = F.col(f.name)
            if f.dataType.typeName() == "binary":
                c = F.hex(c)
            elif f.dataType.typeName() in ("map", "array", "struct"):
                c = F.to_json(c)
            cols.append(c.alias(f.name))
        path = f"{out_dir.rstrip('/')}/{t}.csv"
        (
            df.select(cols)
            .write.mode("overwrite")
            .option("header", True)
            .option("compression", "gzip")
            .csv(path)
        )
        paths[t] = path
    return paths


def dry_run_counts(routed: DataFrame, table_col: str = "table") -> DataFrame:
    """Per-table row + approximate byte counts without writing."""
    sz = F.lit(0)
    for f in routed.schema.fields:
        if f.name == table_col:
            continue
        c = F.col(f.name)
        if f.dataType.typeName() == "binary":
            sz = sz + F.coalesce(F.octet_length(c), F.lit(0))
        else:
            sz = sz + F.coalesce(F.octet_length(c.cast("string")), F.lit(0))
    return (
        routed.withColumn("__bytes", sz)
        .groupBy(table_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__bytes").alias("n_bytes"),
        )
    )


def foreach_batch_sink(streaming_df: DataFrame, fn, name: str = "fb_sink"):
    """Run a bounded stream through a per-micro-batch user callback
    ``fn(batch_df, batch_id)`` to completion (EOS flush analog)."""
    q = streaming_df.writeStream.outputMode("update").foreachBatch(fn).queryName(
        name
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
