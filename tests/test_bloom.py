"""Bloom-prefiltered exact incremental dedup (operators/bloom.py).

Pins: (1) output equals the plain exact join; (2) no false negatives
even at an absurdly small filter (the exactness guarantee does not
depend on sizing — FPs die in verify); (3) the sized FP rate holds;
(4) the probe is Arrow-batched, never row-wise Python.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.operators.bloom import (
    bloom_parameters,
    build_bloom,
    dedup_incremental_bloom,
    with_bloom_maybe,
)


def _corpus(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc body number "), F.col("id").cast("string")).alias(
            "text"
        ),
    )


def test_equals_plain_join(spark):
    docs = _corpus(spark)
    seen = docs.filter(F.col("doc_id") % 5 == 0).select("text")
    got = {
        r.doc_id: r.seen_before
        for r in dedup_incremental_bloom(docs, seen).collect()
    }
    assert got == {i: i % 5 == 0 for i in range(400)}


def test_exact_even_with_tiny_filter(spark):
    # m=64 bits for 80 seen keys: the filter saturates, nearly every
    # probe is a false positive — verify must still return the exact
    # answer (this is the no-silent-wrong-answer property).
    docs = _corpus(spark, 200)
    seen = docs.filter(F.col("doc_id") % 5 == 0).select("text")
    keys = seen.select(F.col("text").alias("__k")).distinct()
    words = build_bloom(keys, "__k", 64, 2)
    probed = with_bloom_maybe(
        docs.select("doc_id", F.col("text").alias("__k")), "__k", words, 64, 2
    )
    maybe = probed.filter(F.col("__maybe"))
    # no false negatives: every true member is flagged maybe
    flagged = {r.doc_id for r in maybe.collect()}
    assert {i for i in range(200) if i % 5 == 0} <= flagged
    truly = maybe.join(keys, "__k", "left_semi")
    assert {r.doc_id for r in truly.collect()} == {
        i for i in range(200) if i % 5 == 0
    }


def test_fp_rate_near_sizing(spark):
    n_seen = 1000
    m, k = bloom_parameters(n_seen, fp_rate=0.01)
    seen = spark.range(n_seen).select(
        F.concat(F.lit("seen-"), F.col("id").cast("string")).alias("__k")
    )
    words = build_bloom(seen, "__k", m, k)
    fresh = spark.range(8000).select(
        F.concat(F.lit("fresh-"), F.col("id").cast("string")).alias("__k")
    )
    probed = with_bloom_maybe(fresh, "__k", words, m, k)
    fp = probed.filter(F.col("__maybe")).count() / 8000
    assert fp < 0.05, fp  # sized for 1%; generous slack for hash variance
    # and the members themselves all hit
    hits = with_bloom_maybe(seen, "__k", words, m, k)
    assert hits.filter(~F.col("__maybe")).count() == 0


def test_probe_is_arrow_batched(spark):
    docs = _corpus(spark, 50)
    seen = docs.limit(10).select("text")
    plan = (
        dedup_incremental_bloom(docs, seen)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan  # row-wise Python forbidden


def test_parameter_validation():
    with pytest.raises(ValueError):
        bloom_parameters(0)
    with pytest.raises(ValueError):
        bloom_parameters(10, 1.5)
    m, k = bloom_parameters(10_000_000, 0.01)
    assert m & (m - 1) == 0  # power of two
    assert 1 <= k <= 16
