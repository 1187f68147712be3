"""URL canonicalization for web-corpus curation, pure-Column + twins.

Common-Crawl-style pipelines key massive amounts of work on URLs:
exact URL dedup, per-registered-domain quality statistics and rate
caps, tracking-parameter stripping before fingerprinting.  The
reference has no URL surface (its keys are OSM ids); this module
belongs to the north-rule web-pages retarget (BASELINE.json
input_hint carries ``url:string``).

Everything is a chain of JVM regexp/HOF Columns (no Python), with
DuckDB twins generated from the same pattern constants:

* :func:`url_host`         — lowercased host (no port / userinfo);
* :func:`registered_domain`— public-suffix-LITE eTLD+1: last two
  labels, or last three when the middle label is a well-known
  second-level registry (``co.uk``, ``com.au``, ...).  The full
  public-suffix list is data, not code — at scale it rides a
  broadcast join against the PSL snapshot table; the heuristic here
  covers the overwhelming bulk of traffic and is deterministic;
* :func:`normalize_url`    — lowercase scheme+host, strip default
  ports (``:80`` http / ``:443`` https), drop the fragment, drop
  tracking params (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``),
  sort surviving query params for order-insensitive equality, drop
  the now-empty ``?``.

Normalization is idempotent: normalize(normalize(u)) == normalize(u)
(property-tested in tests/test_urls.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "url_host",
    "registered_domain",
    "normalize_url",
    "sql_url_host",
    "sql_registered_domain",
    "sql_normalize_url",
]

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+).*$"
# well-known second-level registries (public-suffix-lite)
_SECOND_LEVEL = ["co", "com", "org", "net", "ac", "gov", "edu"]
_TRACKING_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)="


def _col(u) -> Column:
    return F.col(u) if isinstance(u, str) else u


def url_host(url) -> Column:
    """Lowercased host of an absolute URL ('' when unparseable)."""
    return F.lower(F.regexp_extract(_col(url), _HOST_RE, 1))


def registered_domain(url) -> Column:
    """eTLD+1 of the host under the public-suffix-lite rule."""
    labels = F.split(url_host(url), r"\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    take3 = (n >= 3) & second.isin(_SECOND_LEVEL)
    return F.when(
        n >= 2,
        F.when(
            take3,
            F.concat_ws(
                ".",
                F.element_at(labels, -3),
                second,
                F.element_at(labels, -1),
            ),
        ).otherwise(F.concat_ws(".", second, F.element_at(labels, -1))),
    ).otherwise(F.concat_ws(".", labels))


def normalize_url(url) -> Column:
    """Canonical URL for exact-dedup keys (see module docstring)."""
    u = _col(url)
    # drop fragment
    u = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    # drop userinfo, lowercase host(+port), strip default ports
    hp = F.lower(F.regexp_replace(hostport, r"^[^/@]*@", ""))
    hp = F.when(
        (scheme == "http") & hp.endswith(":80"),
        F.regexp_replace(hp, r":80$", ""),
    ).when(
        (scheme == "https") & hp.endswith(":443"),
        F.regexp_replace(hp, r":443$", ""),
    ).otherwise(hp)
    # split path vs query; filter tracking params; sort the rest
    path = F.regexp_replace(rest, r"\?.*$", "")
    query = F.when(
        rest.contains("?"), F.regexp_replace(rest, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(_TRACKING_RE),
    )
    params = F.array_sort(params)
    qnorm = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    # non-absolute input (no scheme): pass through, fragment stripped
    return F.when(scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), hp, path, qnorm)
    )


# --- DuckDB twins ----------------------------------------------------------


def sql_url_host(expr: str) -> str:
    return f"lower(regexp_extract({expr}, '{_HOST_RE}', 1))"


def sql_registered_domain(expr: str) -> str:
    host = sql_url_host(expr)
    labels = f"string_split({host}, '.')"
    inlist = ", ".join(f"'{s}'" for s in _SECOND_LEVEL)
    return (
        f"(CASE WHEN len({labels}) >= 3 AND "
        f"list_contains([{inlist}], ({labels})[-2]) "
        f"THEN ({labels})[-3] || '.' || ({labels})[-2] || '.' || ({labels})[-1] "
        f"WHEN len({labels}) >= 2 "
        f"THEN ({labels})[-2] || '.' || ({labels})[-1] "
        f"ELSE list_aggregate({labels}, 'string_agg', '.') END)"
    )


def sql_normalize_url(expr: str) -> str:
    u = f"regexp_replace({expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport = f"regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)"
    rest = f"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')"
    hp = f"lower(regexp_replace({hostport}, '^[^/@]*@', ''))"
    hp = (
        f"(CASE WHEN {scheme} = 'http' AND {hp} LIKE '%:80' "
        f"THEN regexp_replace({hp}, ':80$', '') "
        f"WHEN {scheme} = 'https' AND {hp} LIKE '%:443' "
        f"THEN regexp_replace({hp}, ':443$', '') ELSE {hp} END)"
    )
    path = f"regexp_replace({rest}, '\\?.*$', '')"
    query = (
        f"(CASE WHEN contains({rest}, '?') "
        f"THEN regexp_replace({rest}, '^[^?]*\\?', '') ELSE '' END)"
    )
    params = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> length(p) > 0 AND NOT regexp_matches(p, '{_TRACKING_RE}')))"
    )
    qnorm = (
        f"(CASE WHEN len({params}) > 0 "
        f"THEN '?' || list_aggregate({params}, 'string_agg', '&') ELSE '' END)"
    )
    return (
        f"(CASE WHEN {scheme} = '' THEN {u} "
        f"ELSE {scheme} || '://' || {hp} || {path} || {qnorm} END)"
    )
