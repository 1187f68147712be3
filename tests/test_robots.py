"""robots.txt longest-match evaluation (operators/robots.py, RFC 9309).

Pins the spec corners: longest matching prefix wins; a length tie goes
to Allow; a page with no matching rule (or no rules at all for its
domain) is allowed; the empty prefix matches everything at length 0;
and the plan is a domain equi-join + one aggregate, no nested loop.
"""

from pyspark.sql import functions as F

from osmquadtreepostgis_spark.operators.robots import robots_gate


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string")


def _rules(spark, rows):
    return spark.createDataFrame(
        rows, "domain string, allow boolean, path_prefix string"
    )


def _gate(spark, pages, rules):
    return {
        r.doc_id: (r.allowed, r.rule_len)
        for r in robots_gate(_pages(spark, pages), _rules(spark, rules)).collect()
    }


def test_longest_match_wins(spark):
    rules = [
        ("example.org", False, "/private/"),
        ("example.org", True, "/private/public/"),
    ]
    got = _gate(
        spark,
        [
            (1, "https://www.example.org/private/a"),
            (2, "https://www.example.org/private/public/a"),
            (3, "https://www.example.org/other"),
        ],
        rules,
    )
    assert got == {1: (False, 9), 2: (True, 16), 3: (True, 0)}


def test_tie_goes_to_allow(spark):
    rules = [
        ("example.org", False, "/p/"),
        ("example.org", True, "/p/"),
    ]
    got = _gate(spark, [(1, "https://example.org/p/x")], rules)
    assert got == {1: (True, 3)}


def test_empty_prefix_is_catch_all(spark):
    rules = [
        ("closed.org", False, ""),
        ("closed.org", True, "/open/"),
    ]
    got = _gate(
        spark,
        [
            (1, "https://closed.org/anything"),
            (2, "https://closed.org/open/x"),
            (3, "https://elsewhere.org/x"),  # no rules: allowed
        ],
        rules,
    )
    assert got == {1: (False, 0), 2: (True, 6), 3: (True, 0)}


def test_registered_domain_grouping(spark):
    # rules bind to the eTLD+1, so any subdomain of it is governed
    rules = [("example.org", False, "/ads/")]
    got = _gate(
        spark,
        [
            (1, "https://a.b.example.org/ads/1"),
            (2, "https://example.org/ads/2"),
            (3, "https://example.org/fine"),
        ],
        rules,
    )
    assert got == {1: (False, 5), 2: (False, 5), 3: (True, 0)}


def test_plan_is_equi_join(spark):
    pages = _pages(spark, [(1, "https://example.org/x")])
    rules = _rules(spark, [("example.org", True, "/")])
    plan = (
        robots_gate(pages, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
