"""robots.txt rule evaluation (RFC 9309 longest-match) — crawl
politeness as a distributed join, the second gatekeeper beside the
blocklist (:mod:`.blocklist`).

Semantics re-derived from the public spec (RFC 9309 / the REP draft):
for the rule group matching a page's domain, the Allow/Disallow rule
with the LONGEST matching path prefix wins; a length tie goes to
Allow; a page matching no rule is allowed.  (Real robots.txt carries
``*``/``$`` wildcards; this operator evaluates the pre-expanded
prefix-rule form a crawl pipeline materializes its fetched robots
files into — one (domain, allow, path_prefix) row per rule.)

Scale shape: rules are DATA (one row per rule per fetched
robots.txt — billions of rows across the web), so evaluation must be
a join, never a compiled literal:

* pages → rules is an EQUI left join on the registered domain
  (broadcast when the rule table fits, shuffled hash join otherwise —
  never a nested loop); the prefix test rides as a join residual, so
  each page meets only ITS domain's rules (robots groups are small —
  tens of rules — so the per-key fan-out is bounded).
* longest-match + Allow-tie resolution is ONE map-side-combinable
  aggregate: ``max(struct(prefix_len, allow))`` — struct ordering
  compares length first, then boolean (true > false), which IS the
  spec's tie rule.  No window, no sort, no second shuffle beyond the
  aggregate's own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import registered_domain

__all__ = ["robots_gate"]


def robots_gate(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    rules_domain_col: str = "domain",
    allow_col: str = "allow",
    prefix_col: str = "path_prefix",
    broadcast: bool = True,
) -> DataFrame:
    """One row per page: (id, domain, allowed, rule_len) — ``allowed``
    by the longest matching rule (tie → allow; no rule → allowed,
    rule_len 0).  ``rule_len`` is the winning prefix length, the
    audit/debug column every crawl operator asks for first."""
    p = pages.select(
        F.col(id_col),
        registered_domain(F.col(url_col)).alias("domain"),
        # path = everything from the first '/' after the authority
        F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/]*(/.*)$", 1)
        .alias("__path"),
    )
    r = rules.select(
        F.col(rules_domain_col).alias("__rdom"),
        F.col(allow_col).cast("boolean").alias("__allow"),
        F.col(prefix_col).alias("__pref"),
    )
    if broadcast:
        r = F.broadcast(r)
    joined = p.join(
        r,
        (p["domain"] == r["__rdom"])
        & F.col("__path").startswith(F.col("__pref")),
        "left",
    )
    best = joined.groupBy(id_col, "domain").agg(
        F.max(
            F.struct(
                F.length("__pref").alias("l"), F.col("__allow").alias("a")
            )
        ).alias("__best")
    )
    return best.select(
        id_col,
        "domain",
        F.coalesce(F.col("__best.a"), F.lit(True)).alias("allowed"),
        F.coalesce(F.col("__best.l"), F.lit(0)).cast("bigint").alias("rule_len"),
    )
