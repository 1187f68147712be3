"""URL blocklist gatekeeper: filter/audit agreement, broadcast equi
plan, regex folding."""

from pyspark.sql import functions as F

from osmquadtreepostgis_spark.operators.blocklist import (
    audit_blocklist,
    filter_blocklist,
)


def _docs(spark):
    rows = [
        (1, "https://a.blocked.org/p/1"),
        (2, "https://sub.host.fine.com/p/2"),
        (3, "https://ok.net/ads/3"),          # path keyword hit
        (4, "https://www.blocked.org/x"),     # same registered domain as 1
        (5, "https://clean.io/page"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, url string")


def _rules(spark):
    return spark.createDataFrame([("blocked.org",)], "domain string")


def test_filter_and_audit_agree(spark):
    d, r = _docs(spark), _rules(spark)
    kw = ["/ads/"]
    kept = {x.doc_id for x in filter_blocklist(d, r, kw).collect()}
    audit = audit_blocklist(d, r, kw).collect()
    assert kept == {x.doc_id for x in audit if x.kept}
    by_id = {x.doc_id: x for x in audit}
    assert by_id[1].blocked_domain and not by_id[1].blocked_path
    assert by_id[4].blocked_domain  # www. strip via registered domain
    assert by_id[3].blocked_path and not by_id[3].blocked_domain
    assert kept == {2, 5}
    # audit keeps every input row
    assert len(audit) == 5


def test_no_keywords_means_domain_only(spark):
    d, r = _docs(spark), _rules(spark)
    kept = {x.doc_id for x in filter_blocklist(d, r, None).collect()}
    assert kept == {2, 3, 5}


def test_plan_is_broadcast_equi_join(spark):
    d, r = _docs(spark), _rules(spark)
    plan = (
        filter_blocklist(d, r, ["/ads/"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_keywords_are_escaped_literals(spark):
    # a regex metachar in a keyword must not act as a wildcard
    d = _docs(spark)
    r = _rules(spark).limit(0)
    kept = {
        x.doc_id
        for x in filter_blocklist(d, r, ["p.2"]).collect()
    }
    # 'p.2' literal matches nothing ('/p/2' would match the UNescaped
    # regex); every row survives
    assert kept == {1, 2, 3, 4, 5}
