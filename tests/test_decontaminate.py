"""Benchmark decontamination (operators/dedup.py:decontaminate):
train docs sharing any n-gram with the eval set are flagged with
interval-union token coverage."""

import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.operators.dedup import decontaminate

pytestmark = pytest.mark.usefixtures("spark")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_basic_flagging_and_coverage(spark):
    # eval doc contributes 3-grams "a b c" and "b c d"
    ev = _docs(spark, [(100, "a b c d")])
    train = _docs(
        spark,
        [
            (1, "x a b c y"),        # one hit gram at pos 2 -> 3 tokens
            (2, "a b c d"),          # grams at pos 1,2 -> merged span, 4 tokens
            (3, "no overlap here at all"),
            (4, "a b"),              # shorter than n -> no grams, kept
        ],
    )
    out = _by_id(decontaminate(train, ev, n=3))
    assert out[1]["n_hit_grams"] == 1
    assert out[1]["contaminated_tokens"] == 3
    assert out[1]["total_tokens"] == 5
    assert out[1]["contaminated_frac"] == pytest.approx(0.6)
    assert out[1]["keep"] is False
    assert out[2]["n_hit_grams"] == 2
    assert out[2]["contaminated_tokens"] == 4  # merged interval, not 6
    assert out[2]["contaminated_frac"] == pytest.approx(1.0)
    assert out[3] == {
        "doc_id": 3,
        "n_hit_grams": 0,
        "contaminated_tokens": 0,
        "total_tokens": 5,
        "contaminated_frac": 0.0,
        "keep": True,
    }
    assert out[4]["keep"] is True and out[4]["total_tokens"] == 2


def test_disjoint_spans_sum_not_merge(spark):
    # two hits separated by a gap > n must stay two islands
    ev = _docs(spark, [(100, "a b c"), (101, "x y z")])
    train = _docs(spark, [(1, "a b c q q q q q x y z")])
    out = _by_id(decontaminate(train, ev, n=3))[1]
    assert out["n_hit_grams"] == 2
    assert out["contaminated_tokens"] == 6  # 3 + 3, islands disjoint
    assert out["total_tokens"] == 11


def test_max_overlap_frac_threshold(spark):
    ev = _docs(spark, [(100, "a b c")])
    train = _docs(spark, [(1, "a b c q q q q q q q")])  # frac 0.3
    keep_strict = _by_id(decontaminate(train, ev, n=3))[1]["keep"]
    keep_loose = _by_id(
        decontaminate(train, ev, n=3, max_overlap_frac=0.5)
    )[1]["keep"]
    assert keep_strict is False and keep_loose is True


def test_broadcast_off_matches_broadcast_on(spark):
    ev = _docs(spark, [(100, "a b c d e"), (101, "p q r s")])
    train = _docs(
        spark,
        [(i, t) for i, t in enumerate(
            ["a b c d e f", "z p q r s", "m n o", "c d e", "q r"]
        )],
    )
    on = sorted(map(tuple, decontaminate(train, ev, n=3).collect()))
    off = sorted(
        map(
            tuple,
            decontaminate(train, ev, n=3, broadcast_eval=False).collect(),
        )
    )
    assert on == off and len(on) == 5


def test_plan_is_broadcast_and_columnar(spark):
    """Default mode must broadcast the eval gram set (no shuffle of the
    train side for the probe) and contain no Python row evaluation."""
    ev = _docs(spark, [(100, "a b c d")])
    train = _docs(spark, [(1, "a b c d e")])
    plan = (
        decontaminate(train, ev, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
