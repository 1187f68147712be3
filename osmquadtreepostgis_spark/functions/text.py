"""Text-analysis column functions for the training-data pipeline:
language-ID, quality scoring, token counting, fingerprinting.

All pure-Column (JVM, codegen'd) so they run at full scan speed over
100 TB of text; every one has an exact ANSI-SQL twin used by the
DuckDB oracle (the SQL is generated from the same constant tables, so
the two can never drift).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "subword_token_count",
    "sql_subword_token_count",
    "lang_id",
    "quality_score",
    "fingerprint",
    "fingerprint128",
    "STOPWORDS_BY_LANG",
    "sql_token_count",
    "sql_lang_id",
    "sql_quality_score",
    "sql_fingerprint",
]

# tiny deterministic stopword lists per language (n-gram-heuristic
# stand-in: the language whose stopwords dominate wins)
STOPWORDS_BY_LANG: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}
_LANG_ORDER = sorted(STOPWORDS_BY_LANG)  # deterministic tie order

_EN_STOPS = ["the", "a", "and", "of", "to", "in"]


def _tok(text) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text) -> Column:
    """Whitespace token count (empty string -> 0)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(F.size(_tok(c))).cast("long")


# GPT-2-style pre-tokenizer, RE2-safe: the canonical pattern's
# trailing-whitespace negative lookahead is dropped (lookaheads are
# not portable), and \p classes are narrowed to ASCII for the fixture
# corpus — contractions, letter runs, digit runs, punctuation runs,
# whitespace runs, in that order (leftmost-first alternation in both
# Java regex and RE2).
_SUBWORD_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def subword_token_count(text) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pre-tokenizer
    regex — the standard cheap proxy for 'how many tokens will the
    tokenizer emit' used to budget training-data token counts before
    a real tokenizer exists. Pure JVM ``regexp_count``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(_SUBWORD_RE)).cast("long")


def _stop_hits(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))


def lang_id(text) -> Column:
    """Heuristic language id: argmax over per-language stopword hit
    counts, deterministic ties by language code, 'und' when all zero."""
    toks = _tok(text)
    scored = F.array(
        *[
            F.struct(
                _stop_hits(toks, STOPWORDS_BY_LANG[lang]).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang in _LANG_ORDER
        ]
    )
    # max over structs: highest hits, then lexicographically SMALLEST
    # lang among equals -> sort desc by hits asc by lang == array_min
    # of (-hits, lang); emulate with sort + element_at
    best = F.element_at(
        F.array_sort(
            F.transform(
                scored, lambda s: F.struct((-s["hits"]).alias("neg"), s["lang"].alias("lang"), s["hits"].alias("hits"))
            )
        ),
        1,
    )
    return F.when(best["hits"] == 0, F.lit("und")).otherwise(best["lang"])


def quality_score(text) -> Column:
    """Deterministic quality score in [0, 1]:
    0.25*len_ok + 0.25*(1 - punct_ratio) + 0.25*stopword_signal +
    0.25*avg_word_len_ok. Rounded to 4dp (oracle-hashable)."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c).cast("double")
    toks = _tok(c)
    ntok = F.greatest(F.size(toks).cast("double"), F.lit(1.0))
    punct = (
        n - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    ) / F.greatest(n, F.lit(1.0))
    len_ok = F.least(n / F.lit(200.0), F.lit(1.0))
    stop = F.least(
        _stop_hits(toks, _EN_STOPS).cast("double") * 10.0 / ntok, F.lit(1.0)
    )
    awl = (n - (ntok - 1)) / ntok  # avg word length incl. punctuation
    awl_ok = F.when((awl >= 3.0) & (awl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
    score = 0.25 * len_ok + 0.25 * (1.0 - punct) + 0.25 * stop + 0.25 * awl_ok
    # floor-quantize instead of round: round-half mode differs between
    # JVM (HALF_UP) and C libm (half-even); floor is identical everywhere
    return F.floor(score * 10000.0) / 10000.0


def fingerprint(text) -> Column:
    """Document fingerprint: first 15 hex chars of md5 as int64 —
    portable across engines (rolling-hash stand-in; content-addressed
    dedup key)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def fingerprint128(text) -> tuple[Column, Column]:
    """120-bit document fingerprint as two int64 halves (md5 hex chars
    1-15 and 17-31) for state keys that must not collide at 10^12-doc
    scale: expectation ~n²/2¹²¹ ≈ 10⁻¹³ merged pairs at n = 10^12,
    vs ~1 per 10⁹ docs for the 60-bit single half. The low half is
    byte-identical to :func:`fingerprint`, so (lo) keys and (lo, hi)
    keys agree wherever the 60-bit key was already unique."""
    c = F.col(text) if isinstance(text, str) else text
    h = F.md5(c)
    lo = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    hi = F.conv(F.substring(h, 17, 15), 16, 10).cast("long")
    return lo, hi


# --- ANSI-SQL twins (DuckDB dialect) ---------------------------------------


def sql_token_count(text: str) -> str:
    return (
        f"cast(case when length({text}) = 0 then 0 "
        f"else len(string_split({text}, ' ')) end as bigint)"
    )


def sql_subword_token_count(text: str) -> str:
    pat = _SUBWORD_RE.replace("'", "''")
    return f"cast(len(regexp_extract_all({text}, '{pat}')) as bigint)"


def _sql_stop_hits(text: str, words: list[str]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter(string_split({text}, ' '), "
        f"t -> list_contains([{arr}], lower(t))))"
    )


def sql_lang_id(text: str) -> str:
    structs = ", ".join(
        f"{{'neg': -{_sql_stop_hits(text, STOPWORDS_BY_LANG[lang])}, "
        f"'lang': '{lang}', "
        f"'hits': {_sql_stop_hits(text, STOPWORDS_BY_LANG[lang])}}}"
        for lang in _LANG_ORDER
    )
    best = f"list_sort([{structs}])[1]"
    return (
        f"case when ({best}).hits = 0 then 'und' else ({best}).lang end"
    )


def sql_quality_score(text: str) -> str:
    n = f"cast(length({text}) as double)"
    ntok = f"greatest(cast(len(string_split({text}, ' ')) as double), 1.0)"
    punct = (
        f"(({n}) - length(regexp_replace({text}, '[^\\w\\s]', '', 'g')))"
        f" / greatest({n}, 1.0)"
    )
    len_ok = f"least(({n}) / 200.0, 1.0)"
    stop = f"least(cast({_sql_stop_hits(text, _EN_STOPS)} as double) * 10.0 / ({ntok}), 1.0)"
    awl = f"(({n}) - (({ntok}) - 1)) / ({ntok})"
    awl_ok = f"(case when ({awl}) >= 3.0 and ({awl}) <= 10.0 then 1.0 else 0.0 end)"
    return (
        f"floor((0.25*({len_ok}) + 0.25*(1.0 - ({punct})) + 0.25*({stop})"
        f" + 0.25*({awl_ok})) * 10000.0) / 10000.0"
    )


def sql_fingerprint(text: str) -> str:
    return f"cast(concat('0x', substr(md5({text}), 1, 15)) as bigint)"
