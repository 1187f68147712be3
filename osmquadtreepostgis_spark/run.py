"""CLI entry point — the spark-submit deployment surface.

On a real cluster:

    python -m osmquadtreepostgis_spark.deploy   # -> pyfiles zip path
    spark-submit --py-files oqps_pyfiles.zip \\
        -m osmquadtreepostgis_spark.run flagship \\
        --input s3://.../pages --out s3://.../tiles --resume

Locally (this sandbox):

    python -m osmquadtreepostgis_spark.run flagship \\
        --synthesize 100000 --out /tmp/tiles
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="osmquadtreepostgis_spark.run")
    sub = p.add_subparsers(dest="cmd", required=True)

    fl = sub.add_parser("flagship", help="mine->encode->PIP->tile, checkpointed")
    fl.add_argument("--input", help="pages parquet path (url, warc_ts, html, text, lang)")
    fl.add_argument("--synthesize", type=int, default=0, help="generate N synthetic pages instead of --input")
    fl.add_argument("--out", required=True, help="output dir (data + _lineage)")
    fl.add_argument("--buckets", type=int, default=64)
    fl.add_argument("--no-resume", action="store_true")
    fl.add_argument("--cores", type=int, default=None)

    dc = sub.add_parser("documents", help="flagship over a driver sf dir")
    dc.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    dc.add_argument("--cores", type=int, default=None)

    ex = sub.add_parser(
        "export", help="export a checkpointed output as COPY text files"
    )
    ex.add_argument("--data", required=True, help="checkpointed data dir")
    ex.add_argument("--out", required=True, help="COPY text output dir")
    ex.add_argument("--cores", type=int, default=None)

    mt = sub.add_parser("maintain", help="compact + analyze a clustered table")
    mt.add_argument("--path", required=True)
    mt.add_argument("--target-rows", type=int, default=1_000_000)
    mt.add_argument("--cell-col", default="cell")
    mt.add_argument("--cores", type=int, default=None)

    args = p.parse_args(argv)

    from .session import get_spark

    spark = get_spark("oqps_run", cores=args.cores)
    try:
        if args.cmd == "flagship":
            from .plans.pipeline import run_pages_checkpointed
            from .sources.pages import pages

            if args.synthesize:
                pages_df = pages(spark, args.synthesize)
            elif args.input:
                pages_df = spark.read.parquet(args.input)
            else:
                p.error("flagship needs --input or --synthesize")
            stats = run_pages_checkpointed(
                pages_df, args.out, n_buckets=args.buckets, resume=not args.no_resume
            )
            print(json.dumps(stats))
        elif args.cmd == "documents":
            from .plans.pipeline import documents_pipeline

            rows = documents_pipeline(spark, args.sf_dir).collect()
            print(json.dumps({"rows": len(rows), "sample": str(rows[0]) if rows else None}))
        elif args.cmd == "export":
            from pyspark.sql import functions as F

            from .sources.sinks import write_tables_copy_text

            df = spark.read.parquet(args.data).withColumn(
                "table", F.lit("tiles")
            )
            paths = write_tables_copy_text(df, args.out)
            print(json.dumps(paths))
        elif args.cmd == "maintain":
            from .sources.maintenance import analyze_table, compact_table

            stats = compact_table(
                spark, args.path, args.target_rows, cell_col=args.cell_col
            )
            cols = analyze_table(spark.read.parquet(args.path))
            stats["columns"] = [r.asDict() for r in cols]
            print(json.dumps(stats))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
