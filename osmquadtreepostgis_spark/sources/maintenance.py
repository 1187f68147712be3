"""Table maintenance — the Spark-native VACUUM/ANALYZE analog (D5).

The reference issues ``vacuum analyze`` per table after load
(/root/reference/osmquadtreepostgis/__init__.py: the index/maintenance
phase that costs it 12,612-66,264 s). Under a lakehouse layout the
equivalent operations are:

* **compaction** (VACUUM): rewrite a clustered table's small files to
  a target size, preserving the cell-sort order the pruning layer
  depends on — dead-file removal falls out of the atomic overwrite;
* **statistics** (ANALYZE): per-column null counts / min / max /
  distinct estimates computed in ONE pass (a single agg job; the
  planner-facing stats a metastore would record).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

__all__ = ["compact_table", "analyze_table"]


def compact_table(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
    cell_col: str = "cell",
) -> dict:
    """Rewrite the table with files sized to ``target_rows_per_file``,
    keeping partition dirs (``__ptile``) and the within-file cell sort
    (catalog.write_clustered layout). Returns {files_before,
    files_after, rows}."""
    df = spark.read.parquet(path)
    files_before = len(df.inputFiles())
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    has_ptile = "__ptile" in df.columns
    cols = (["__ptile", cell_col] if has_ptile else [cell_col])
    out = df.repartitionByRange(n_files, *[F.col(c) for c in cols])
    if cell_col in df.columns:
        out = out.sortWithinPartitions(*cols)
    tmp = path.rstrip("/") + "__compact_tmp"
    w = out.write.mode("overwrite")
    if has_ptile:
        w = w.partitionBy("__ptile")
    w.parquet(tmp)
    # crash-safe swap: rename the live table ASIDE first, move the new
    # data into place, then drop the old copy — a crash between any two
    # steps leaves either the original (at path or path__compact_old)
    # or the completed swap, never a destroyed table (ADVICE r2 #2)
    import shutil

    old = path.rstrip("/") + "__compact_old"
    if os.path.exists(old):
        shutil.rmtree(old)  # leftover from a prior crashed run
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)
    after = spark.read.parquet(path)
    return {
        "files_before": files_before,
        "files_after": len(after.inputFiles()),
        "rows": n,
    }


def analyze_table(df: DataFrame, approx_rsd: float = 0.05) -> list[Row]:
    """One-pass per-column statistics (ANALYZE): rows, nulls, min, max,
    approx distinct. Returns one Row per column."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    simple = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("long", "integer", "double", "float", "string", "timestamp", "date")
    ]
    for c in simple:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__n_{c}"),
            F.min(c).alias(f"__min_{c}"),
            F.max(c).alias(f"__max_{c}"),
            F.approx_count_distinct(c, approx_rsd).alias(f"__d_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    return [
        Row(
            column=c,
            n_rows=row["__rows"],
            n_nulls=row[f"__n_{c}"],
            min=str(row[f"__min_{c}"]),
            max=str(row[f"__max_{c}"]),
            approx_distinct=row[f"__d_{c}"],
        )
        for c in simple
    ]
