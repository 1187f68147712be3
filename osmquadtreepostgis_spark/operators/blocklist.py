"""URL blocklist filtering — the gatekeeper stage of a crawl pipeline.

Every Common-Crawl-scale corpus run starts by dropping pages from
blocked registrable domains (spam/adult/malware lists run to millions
of entries) and pages whose URL carries a blocked path keyword.  The
reference's analog is its partial-index predicate gating which rows
reach each output table (/root/reference/osmquadtreepostgis/
__init__.py table specs); here the predicate source is a *table* of
rules, so the operator must stay a join, not a literal filter.

Scale split (the part that matters at 10^12 rows):

* **domain rules** can be millions of entries → expressed as an EQUI
  anti-join on the registered domain (eTLD+1 via
  :func:`..functions.urls.registered_domain`).  Small-side broadcast
  when it fits (`broadcast=True`, the default — a 10 M-entry list is
  ~200 MB, still broadcastable on real executors); shuffle hash
  anti-join otherwise.  Never a nested loop.
* **path keywords** are a small curated vocabulary → folded at plan
  time into ONE compiled regex alternation, a codegen'd Column
  filter.  Folding keeps the plan free of
  BroadcastNestedLoopJoin/cartesian shapes (mechanically forbidden by
  tests/test_plan_discipline.py); a keyword list big enough to break
  a single regex belongs in the domain-rule table instead.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import registered_domain

__all__ = ["filter_blocklist", "audit_blocklist"]


def _domain_rules(rules_df: DataFrame, col: str) -> DataFrame:
    return rules_df.select(F.col(col).alias("__bl_dom")).distinct()


def _path_pattern(path_keywords: list[str] | None) -> str | None:
    if not path_keywords:
        return None
    return "|".join(re.escape(k) for k in sorted(path_keywords))


def filter_blocklist(
    df: DataFrame,
    rules_df: DataFrame,
    path_keywords: list[str] | None = None,
    url_col: str = "url",
    rules_domain_col: str = "domain",
    broadcast: bool = True,
) -> DataFrame:
    """Rows of ``df`` whose URL survives the blocklist: registered
    domain not in ``rules_df`` (anti-join) and no path keyword match
    (folded regex).  Adds ``domain`` (the registered domain) to the
    output — callers invariably need it next."""
    rules = _domain_rules(rules_df, rules_domain_col)
    if broadcast:
        rules = F.broadcast(rules)
    out = df.withColumn("domain", registered_domain(F.col(url_col)))
    out = out.join(rules, out["domain"] == rules["__bl_dom"], "left_anti")
    pat = _path_pattern(path_keywords)
    if pat is not None:
        out = out.filter(~F.col(url_col).rlike(pat))
    return out


def audit_blocklist(
    df: DataFrame,
    rules_df: DataFrame,
    path_keywords: list[str] | None = None,
    url_col: str = "url",
    rules_domain_col: str = "domain",
    broadcast: bool = True,
) -> DataFrame:
    """Per-row audit variant: every input row with ``domain``,
    ``blocked_domain``, ``blocked_path`` and the net ``kept`` flag.
    Same join shape as :func:`filter_blocklist` (broadcast LEFT equi
    join instead of anti), so the audit costs what the filter costs."""
    rules = _domain_rules(rules_df, rules_domain_col).withColumn(
        "__bl_hit", F.lit(True)
    )
    if broadcast:
        rules = F.broadcast(rules)
    out = df.withColumn("domain", registered_domain(F.col(url_col)))
    out = out.join(rules, out["domain"] == rules["__bl_dom"], "left").drop(
        "__bl_dom"
    )
    out = out.withColumn(
        "blocked_domain", F.coalesce(F.col("__bl_hit"), F.lit(False))
    ).drop("__bl_hit")
    pat = _path_pattern(path_keywords)
    path_hit = (
        F.col(url_col).rlike(pat) if pat is not None else F.lit(False)
    )
    return out.withColumn("blocked_path", path_hit).withColumn(
        "kept", ~F.col("blocked_domain") & ~F.col("blocked_path")
    )
