"""Local replica of the driver's sf0.01 correctness sweep.

Usage:
    python BENCH/parity_sweep.py [entry ...]      # default: all entries

Compares each __spark_entry__.queries() entry against its oracle_sql()
twin on $SPARK_GRAFT_PARITY_DIR (default /root/testdata/sf0.01) with
exact values after canonical column sort — the same comparison the
round driver applies.  Prints one line per entry and a final summary.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == "object":
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    names = sys.argv[1:] or list(qs)
    n_ok = 0
    failures = []
    for name in names:
        try:
            got = canon(qs[name](spark, SF_DIR).toPandas())
            want = canon(con.sql(osql[name]).df())
            assert list(got.columns) == list(want.columns), (
                f"cols {list(got.columns)} != {list(want.columns)}"
            )
            assert len(got) == len(want), f"rows {len(got)} != {len(want)}"
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, check_exact=True
            )
            print(f"| `{name}` | {len(got)} | ok |", flush=True)
            n_ok += 1
        except Exception as e:  # noqa: BLE001
            msg = str(e).replace("\n", " ")[:300]
            print(f"| `{name}` | - | FAIL: {msg} |", flush=True)
            failures.append(name)
    print(f"\n{n_ok}/{len(names)} ok; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
