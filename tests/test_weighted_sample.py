"""Deterministic weighted sampling without replacement
(operators/corpus.py weighted_sample — exponential keys / A-ES).

Pins: (1) exact selection equality with a pure-python reference
computing the identical md5 keys; (2) inclusion frequency is monotone
in weight across independent salts (the statistical contract);
(3) non-positive/NULL weights are excluded; (4) the plan is
TakeOrderedAndProject, never a global sort exchange.
"""

import hashlib
import math

from pyspark.sql import functions as F

from osmquadtreepostgis_spark.operators.corpus import weighted_sample


def _py_key(doc_id, w, salt=0):
    h = int(hashlib.md5(f"{doc_id}:ws:{salt}".encode()).hexdigest()[:15], 16)
    u = (h + 1.0) / float(1 << 60)
    return -math.log(u) / w


def _df(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") % 7) + 1).cast("double").alias("w"),
    )


def test_selection_matches_python_reference(spark):
    n, k = 400, 60
    got = {r.doc_id for r in weighted_sample(_df(spark, n), k, "w").collect()}
    keys = sorted(
        (( _py_key(i, (i % 7) + 1), i) for i in range(n))
    )
    want = {i for _, i in keys[:k]}
    assert got == want


def test_inclusion_monotone_in_weight(spark):
    # two weight classes 1 vs 9: across salts the heavy class must be
    # sampled far more often (exponential-keys gives P ∝ w for k << n)
    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 9.0).otherwise(1.0).alias("w"),
    )
    heavy = light = 0
    for salt in range(5):
        rows = weighted_sample(df, 50, "w", salt=salt).collect()
        heavy += sum(1 for r in rows if r.doc_id % 2 == 0)
        light += sum(1 for r in rows if r.doc_id % 2 == 1)
    assert heavy > 3 * light, (heavy, light)


def test_nonpositive_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, 0.0), (3, -1.0), (4, None), (5, 1.0)],
        "doc_id long, w double",
    )
    got = {r.doc_id for r in weighted_sample(df, 10, "w").collect()}
    assert got == {1, 5}


def test_salts_draw_independent_samples(spark):
    a = {r.doc_id for r in weighted_sample(_df(spark), 40, "w", salt=0).collect()}
    b = {r.doc_id for r in weighted_sample(_df(spark), 40, "w", salt=1).collect()}
    assert a != b
    # and each is reproducible
    a2 = {r.doc_id for r in weighted_sample(_df(spark), 40, "w", salt=0).collect()}
    assert a == a2


def test_plan_is_take_ordered(spark):
    plan = (
        weighted_sample(_df(spark), 10, "w")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()  # no global sort
