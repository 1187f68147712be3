"""Geohash encode: public test vectors, prefix/key coherence, and the
no-shuffle plan contract."""

import duckdb
import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.functions.geohash import (
    GEOHASH_BASE32,
    sql_geohash_chars,
    sql_geohash_key,
    sql_geohash_scaled,
    with_geohash,
)

# (lon, lat, expected) — canonical public examples (docs of the format
# itself; ezs42 is the original worked example, u4pruydq the Jutland
# lighthouse coordinate every implementation pins).
VECTORS = [
    (10.40744, 57.64911, "u4pruydq"),
    (-5.6, 42.6, "ezs42"),
    (0.0, 0.0, "s0000000"),
    (-180.0, -90.0, "00000000"),
    (180.0, 90.0, "zzzzzzzz"),
    (-0.0000001, -0.0000001, "7zzzzzzz"),
]


def _spark_geohash(spark, lon, lat, precision=8):
    df = spark.createDataFrame([(float(lon), float(lat))], "lon double, lat double")
    return with_geohash(df, "lon", "lat", precision).collect()[0]


@pytest.mark.parametrize("lon,lat,want", VECTORS)
def test_public_vectors_spark(spark, lon, lat, want):
    assert _spark_geohash(spark, lon, lat, len(want)).geohash == want


@pytest.mark.parametrize("lon,lat,want", VECTORS)
def test_public_vectors_duckdb(lon, lat, want):
    p = len(want)
    li, la = sql_geohash_scaled(repr(lon), repr(lat), p)
    key = sql_geohash_key("loni", "lati", p)
    got = duckdb.sql(
        f"SELECT {sql_geohash_chars('k', p)} FROM "
        f"(SELECT {key} AS k FROM (SELECT {li} AS loni, {la} AS lati))"
    ).fetchone()[0]
    assert got == want


def test_key_orders_like_string(spark):
    """The packed int key and the base32 string impose the SAME total
    order (5 bits/char, alphabet is sorted ASCII): sorting tiles by
    gh_key equals sorting by geohash text."""
    df = spark.range(500).select(
        ((F.col("id") * 7919 % 360) - 180.0).alias("lon"),
        ((F.col("id") * 104729 % 180) - 90.0).alias("lat"),
    )
    rows = with_geohash(df, "lon", "lat", 8).collect()
    by_key = [r.geohash for r in sorted(rows, key=lambda r: r.gh_key)]
    assert by_key == sorted(by_key)
    assert all(set(r.geohash) <= set(GEOHASH_BASE32) for r in rows)


def test_shorter_precision_is_prefix(spark):
    df = spark.createDataFrame([(10.40744, 57.64911)], "lon double, lat double")
    g8 = with_geohash(df, "lon", "lat", 8).collect()[0].geohash
    g5 = with_geohash(df, "lon", "lat", 5).collect()[0].geohash
    assert g8.startswith(g5)


def test_plan_is_projection_only(spark):
    df = spark.range(100).select(
        (F.col("id") % 360 - 180.0).alias("lon"),
        (F.col("id") % 180 - 90.0).alias("lat"),
    )
    plan = with_geohash(df, "lon", "lat", 8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_precision_bounds():
    with pytest.raises(ValueError):
        sql_geohash_scaled("lon", "lat", 0)
    with pytest.raises(ValueError):
        sql_geohash_scaled("lon", "lat", 13)
