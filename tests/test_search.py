"""Conjunctive boolean retrieval (operators/tfidf.py search_conjunctive).

Pins: AND semantics (a doc missing ANY query term is out), scoring
against a closed-form fixture, duplicate/unsorted query-term
normalization, the pre-aggregate query-term filter in the plan, and
TakeOrderedAndProject for the global top-k.
"""

import math

import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.operators.tfidf import search_conjunctive


def _docs(spark):
    rows = [
        (1, "alpha beta gamma"),            # all three terms, len 3
        (2, "alpha beta beta delta"),       # missing gamma
        (3, "alpha alpha beta gamma gamma"),  # all three, len 5
        (4, "delta epsilon"),               # none
        (5, None),                          # null text
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_and_semantics_and_scores(spark):
    out = {
        r.doc_id: (r.n_hits, r.score)
        for r in search_conjunctive(
            _docs(spark), ["alpha", "beta", "gamma"], k=10
        ).collect()
    }
    assert set(out) == {1, 3}  # only docs with ALL terms
    # closed-form: n_docs=4 (nulls excluded); dfreq: alpha 3, beta 3,
    # gamma 2 (computed over query-term postings)
    idf = {t: math.log((1 + 4) / (1 + d)) + 1 for t, d in
           [("alpha", 3), ("beta", 3), ("gamma", 2)]}
    s1 = (idf["alpha"] + idf["beta"] + idf["gamma"]) / 3
    s3 = (2 * idf["alpha"] + idf["beta"] + 2 * idf["gamma"]) / 5
    assert out[1] == (3, round(s1, 4))
    assert out[3] == (5, round(s3, 4))


def test_duplicate_terms_normalized(spark):
    a = search_conjunctive(_docs(spark), ["beta", "alpha", "beta"], k=10)
    b = search_conjunctive(_docs(spark), ["alpha", "beta"], k=10)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_k_limits_and_orders(spark):
    rows = [(i, "alpha " + "pad " * i) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = search_conjunctive(df, ["alpha"], k=5).collect()
    # shorter docs score higher (same single hit / smaller doclen)
    assert [r.doc_id for r in out] == [1, 2, 3, 4, 5]


def test_empty_terms_raise():
    with pytest.raises(ValueError):
        search_conjunctive(None, [])


def test_plan_filters_before_aggregate_and_takeordered(spark):
    df = _docs(spark)
    plan = (
        search_conjunctive(df, ["alpha", "beta"], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    # the query-term IN filter sits directly on the exploded tokens,
    # under every aggregate: non-query terms never reach a shuffle
    assert "IN (alpha,beta)" in plan
    assert plan.find("IN (alpha,beta)") > plan.find("HashAggregate")
