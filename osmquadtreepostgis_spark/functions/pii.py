"""PII scrubbing for web-corpus curation, pure-Column + DuckDB twins.

Training-data pipelines scrub personally-identifiable strings before
anything else touches the text (the reference has no text surface —
this belongs to the north-rule web-pages retarget, like
:mod:`.urls`).  Three detector classes, chosen because they are
regular (RE2-safe: no lookbehind, no backreferences) and near-zero
false-positive on web text:

* email addresses  -> ``<EMAIL>``
* phone numbers    -> ``<PHONE>`` (international/US shapes, 7+ digits
  with separators — the digit-run guard keeps years/ids untouched)
* IPv4 addresses   -> ``<IP>``

Everything is a chain of JVM ``regexp_replace``/``regexp_count``
Columns fused into the scan — no UDF, no shuffle; the twins are
generated from the SAME pattern constants so both engines transform
byte-identically.

Scale note: at 100 TB this is a pure map stage; the audit counts ride
the same projection so a "how much PII did we remove" dataset-card
stat costs nothing extra.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "scrub_pii",
    "pii_counts",
    "sql_scrub_pii",
    "sql_pii_counts",
]

# ordered: emails first (their local part may contain digits that the
# phone pattern would otherwise nibble), then IPs (dotted digit runs),
# then phones
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IP_RE = (
    r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
)
# phone shapes: with a +country or (area) prefix, one digit run (2-10
# digits) suffices — the prefix is the signal; without a prefix, 3+
# separated groups are required so years, ids, and "12 34"-style
# pairs survive (a 3-group date like 12-03-1999 is treated as
# phone-like — the conservative direction for PII removal). Group
# bounds go to 10 digits so a long subscriber run ("+44 20 79460000")
# is swallowed whole instead of leaving digit residue beside the
# placeholder.
_PHONE_RE = (
    r"(?:\+[0-9]{1,3}[ .-]?|\([0-9]{2,4}\)[ .-]?)"
    r"(?:\([0-9]{2,4}\)[ .-]?)?[0-9]{2,10}(?:[ .-][0-9]{2,10})*"
    r"|[0-9]{2,10}[ .-][0-9]{2,10}(?:[ .-][0-9]{2,10})+"
)

_REPLACEMENTS = [
    (_EMAIL_RE, "<EMAIL>"),
    (_IP_RE, "<IP>"),
    (_PHONE_RE, "<PHONE>"),
]


def _col(text) -> Column:
    return F.col(text) if isinstance(text, str) else text


def scrub_pii(text) -> Column:
    """Text with emails, IPv4s, and phone shapes replaced by typed
    placeholder tokens, in a fixed detector order."""
    c = _col(text)
    for pat, token in _REPLACEMENTS:
        c = F.regexp_replace(c, pat, token)
    return c


def pii_counts(text):
    """(n_emails, n_ips, n_phones) audit Columns — counted on the
    PROGRESSIVELY scrubbed text exactly as :func:`scrub_pii` sees it,
    so counts and replacements always agree."""
    c = _col(text)
    out = []
    for pat, token in _REPLACEMENTS:
        out.append(F.regexp_count(c, F.lit(pat)).cast("long"))
        c = F.regexp_replace(c, pat, token)
    return tuple(out)


# --- DuckDB twins ----------------------------------------------------------


def _q(pat: str) -> str:
    return pat.replace("'", "''")


def sql_scrub_pii(expr: str) -> str:
    c = expr
    for pat, token in _REPLACEMENTS:
        c = f"regexp_replace({c}, '{_q(pat)}', '{token}', 'g')"
    return c


def sql_pii_counts(expr: str) -> list[str]:
    c = expr
    out = []
    for pat, token in _REPLACEMENTS:
        out.append(f"cast(len(regexp_extract_all({c}, '{_q(pat)}')) as bigint)")
        c = f"regexp_replace({c}, '{_q(pat)}', '{token}', 'g')"
    return out
