"""Sinks (parquet/csv.gz/dry-run/foreachBatch), compat views, salted
aggregation, observe metrics."""

import glob

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.operators import routing as RT
from osmquadtreepostgis_spark.operators.skew import salted_agg
from osmquadtreepostgis_spark.plans.elements import elements_df
from osmquadtreepostgis_spark.plans.views import register_compat_views
from osmquadtreepostgis_spark.sources.sinks import (
    dry_run_counts,
    foreach_batch_sink,
    write_tables_csv_gz,
    write_tables_parquet,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def routed(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    el = elements_df(docs).withColumn("z_order", RT.z_order_col(F.col("tags")))
    el = el.withColumn(
        "minzoom",
        RT.minzoom_col(F.col("tags"), F.col("geom_type"), F.col("way_area")),
    )
    return RT.explode_routes(
        el, RT.route_extended(F.col("geom_type"), F.col("tags"), F.col("z_order"))
    ).drop("tags")


def test_write_tables_parquet_roundtrip(spark, routed, tmp_path):
    paths = write_tables_parquet(routed, str(tmp_path), cluster_col=None)
    assert set(paths) >= {"point", "line", "polygon"}
    total = sum(spark.read.parquet(p).count() for p in paths.values())
    assert total == routed.count()


def test_write_tables_csv_gz(spark, routed, tmp_path):
    paths = write_tables_csv_gz(routed, str(tmp_path))
    assert glob.glob(paths["point"] + "/*.csv.gz")
    back = spark.read.option("header", True).csv(paths["point"])
    assert back.count() == routed.filter("table = 'point'").count()


def test_dry_run_counts(spark, routed):
    pdf = dry_run_counts(routed).toPandas().set_index("table")
    assert pdf["n_rows"].sum() == routed.count()
    assert (pdf["n_bytes"] > 0).all()


def test_foreach_batch_sink(spark):
    from osmquadtreepostgis_spark.streaming.stream import stream_events_windowed

    got = []
    foreach_batch_sink(
        stream_events_windowed(spark, SF),
        lambda df, bid: got.append(df.count()),
    )
    assert got and sum(got) > 0


def test_compat_views(spark, routed):
    tables = {
        t: routed.filter(F.col("table") == t).drop("table")
        for t in ["point", "line", "highway", "polygon", "building", "boundary"]
    }
    names = register_compat_views(spark, tables, lowzoom=[6])
    assert "planet_osm_line" in names and "planet_osm_roads" in names
    line = spark.table("planet_osm_line")
    assert line.count() == tables["line"].count() + tables["highway"].count()
    # lowzoom views filter by minzoom
    lz = [n for n in names if n.endswith("_lz6")]
    assert lz
    for n in lz:
        assert spark.table(n).filter(F.col("minzoom") > 6).count() == 0
    # roads: only ranked road classes + negative-id boundaries
    roads = spark.table("planet_osm_roads")
    assert roads.count() > 0


def test_salted_agg_exact(spark):
    df = spark.range(100000).select(
        (F.col("id") % 7).alias("k"),  # 7 hot keys
        (F.col("id") * 3 % 101).alias("v"),
    )
    got = (
        salted_agg(
            df,
            ["k"],
            {
                "n": ("count", F.lit(1)),
                "sum_v": ("sum", F.col("v")),
                "max_v": ("max", F.col("v")),
            },
            n_salt=8,
            salt_source=F.col("v"),
        )
        .toPandas()
        .sort_values("k", ignore_index=True)
    )
    want = (
        df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_v"),
            F.max("v").alias("max_v"),
        )
        .toPandas()
        .sort_values("k", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_observe_metrics(spark):
    """A3 progress counters: Observation variant returns the metrics."""
    from pyspark.sql import Observation

    from osmquadtreepostgis_spark.operators.mine import mine_gazetteer_terms

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    obs = Observation("mine")
    m = mine_gazetteer_terms(docs).observe(
        obs, F.count(F.lit(1)).alias("n_mentions"),
        F.sum("n_occurrences").alias("n_occ"),
    )
    n = m.count()
    assert obs.get["n_mentions"] == n
    assert obs.get["n_occ"] >= n
    # the named-observe variant inside documents_pipeline must not
    # break the plan
    from osmquadtreepostgis_spark.plans.pipeline import documents_pipeline

    assert documents_pipeline(spark, SF).count() > 0


def test_lowzoom_multiple_cutoffs_no_nesting(spark):
    """lowzoom=[6, 10] must not register nested views like
    planet_osm_line_lz6_lz10 (ADVICE r1, views.py:77)."""
    from osmquadtreepostgis_spark.plans.views import register_compat_views

    line = spark.range(5).select(
        F.col("id").alias("osm_id"), (F.col("id") % 12).alias("minzoom")
    )
    names = register_compat_views(
        spark, {"line": line}, prefix="tnest", lowzoom=[6, 10]
    )
    assert not [n for n in names if n.count("_lz") > 1], names
    assert "tnest_line_lz6" in names and "tnest_line_lz10" in names


def test_write_tee_both_sinks_from_one_materialization(spark, tmp_path):
    """S7 re-pack tee: parquet + COPY text written from one persisted
    routed frame, same rows in both."""
    from osmquadtreepostgis_spark.sources.sinks import write_tee

    routed = spark.createDataFrame(
        [("line", 1, "a"), ("line", 2, None), ("point", 3, "c")],
        "table string, osm_id long, name string",
    )
    out = write_tee(routed, str(tmp_path / "pq"), str(tmp_path / "cp"))
    assert set(out["parquet"]) == {"line", "point"}
    assert spark.read.parquet(out["parquet"]["line"]).count() == 2
    import glob
    import gzip

    lines = []
    for f in glob.glob(out["copy"]["line"] + "/part-*.gz"):
        with gzip.open(f, "rt") as fh:
            lines += [ln for ln in fh if ln.strip()]
    assert len(lines) == 2


def test_write_jsonl_gz_roundtrip(spark, tmp_path):
    """Sharded gzip JSONL: part files are .json.gz, rows round-trip,
    shard count honored."""
    import glob

    from osmquadtreepostgis_spark.sources.sinks import write_jsonl_gz

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "corpus_jsonl")
    write_jsonl_gz(docs.select("doc_id", "text"), out, num_shards=4)
    parts = glob.glob(f"{out}/part-*.json.gz")
    assert len(parts) == 4
    back = spark.read.json(out)
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in back.collect()}
    b = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    assert a == b
