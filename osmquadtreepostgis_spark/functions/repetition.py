"""Gopher-style repetition quality signals, pure-Column + DuckDB twins.

Rae et al. 2021 ("Scaling Language Models: ... Gopher", §A1.1) filter
web documents by REPETITION — duplicate lines and over-represented
n-grams — on top of C4's structural rules (:mod:`..operators.corpus`
implements those).  Four signals, each an exact per-document scalar:

* :func:`dup_line_frac`      — fraction of lines that are repeats of
  an earlier identical line (1 - distinct/total);
* :func:`dup_line_char_frac` — fraction of characters living in lines
  that occur more than once;
* :func:`top_ngram_frac`     — fraction of tokens covered by the
  single most frequent word n-gram (count x n / tokens, capped at 1);
* :func:`dup_ngram_frac`     — fraction of n-gram occurrences that
  are repeats (1 - distinct/total grams).

All four are single-pass JVM Column expressions over the in-row
line/gram arrays — no explode, no shuffle, whole-stage codegen; a
quality gate composes them with plain ``filter``.  The duplicate-line
and top-gram counts are quadratic in the number of DISTINCT in-doc
elements (nested ``filter`` per element), which is the right trade
for real documents (thousands of lines at most); a corpus of
pathological single-document books would switch to the
explode -> groupBy(doc, gram) -> max shape instead.

``line_delim`` parameterizes line splitting (literal regex): '\\n'
for real multi-line text; the oracle-checked query uses ' ' so the
signal is exercised non-vacuously on the single-line synthetic docs
(token-level duplicates are line-level duplicates under that
delimiter — same code path, same semantics).

The DuckDB twins are generated from the same shapes; both engines
compute exact rationals of integer counts, so parity is exact (the
query rounds 4dp only to stabilize the value-hash formatting).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "dup_line_frac",
    "dup_line_char_frac",
    "top_ngram_frac",
    "dup_ngram_frac",
    "repetition_signals_frame",
    "sql_dup_line_frac",
    "sql_dup_line_char_frac",
    "sql_top_ngram_frac",
    "sql_dup_ngram_frac",
]


def _col(text) -> Column:
    return F.col(text) if isinstance(text, str) else text


def _let(value: Column, body) -> Column:
    """Let-binding for Column expressions — canonical implementation
    and rationale in :func:`..functions.sketches.let_`. Measured here:
    the two gram rule signals over sf0.1 documents cost 13.3 s with
    the token split inlined vs 1.2 s bound."""
    from .sketches import let_

    return let_(value, body)


def _lines(text, delim: str) -> Column:
    return F.split(_col(text), delim)


def _grams_of_toks(toks: Column, n: int) -> Column:
    """n-grams (with multiplicity) over a BOUND token-array variable —
    safe to reference ``toks`` per element only because the caller
    binds it via :func:`_let` (or a materialized column)."""
    k = F.size(toks)
    idx = F.when(k >= n, F.sequence(F.lit(1), k - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )


def _grams(text, n: int) -> Column:
    """ALL word n-grams with multiplicity (the dedup sketches use the
    distinct variant in functions.sketches; repetition needs counts).
    The token array is let-bound so the split runs once per row, not
    once per element access (see :func:`_let`)."""
    return _let(
        F.split(_col(text), " "), lambda toks: _grams_of_toks(toks, n)
    )


def _dup_frac(arr: Column) -> Column:
    # bind arr: it is referenced three times below, and evaluating a
    # gram expression per reference is the O(S^2)-per-reference trap
    # _let documents
    return _let(
        arr,
        lambda a: F.when(
            F.size(a) > 0,
            (F.size(a) - F.size(F.array_distinct(a))) / F.size(a).cast("double"),
        ).otherwise(F.lit(0.0)),
    )


def dup_line_frac(text, line_delim: str = "\n") -> Column:
    """Fraction of lines that are duplicates of another line."""
    return _dup_frac(_lines(text, line_delim))


def _run_state():
    """(prev, run, acc) init for sorted-run aggregates: prev=NULL so
    the first element never extends a phantom run."""
    return F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).cast("long").alias("acc"),
    )


def _close_run(acc: Column, value_fn) -> Column:
    """Contribution of the run being closed: value_fn(run, prev) for
    runs longer than 1, else 0."""
    return F.when(
        acc["run"] > 1, value_fn(acc["run"], acc["prev"]).cast("long")
    ).otherwise(F.lit(0).cast("long"))


def _dup_run_sum(arr: Column, value_fn) -> Column:
    """Sum of value_fn(count, value) over distinct values occurring
    more than once, via a single pass over the SORTED array.

    This shape matters: counting with a nested
    ``filter(arr, y -> y = x)`` per element re-evaluates the whole
    array EXPRESSION per element access (codegen inlines it), turning
    an S-element array built by an S-cost expression into O(S^2)
    expression evaluations — measured 322 s for 5000 x ~54-token docs.
    The sorted-run aggregate references the array once; each lambda
    touches only its element and the accumulator."""
    step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.when(x == acc["prev"], acc["acc"])
        .otherwise(acc["acc"] + _close_run(acc, value_fn))
        .alias("acc"),
    )
    return F.aggregate(
        F.array_sort(arr),
        _run_state(),
        step,
        lambda acc: acc["acc"] + _close_run(acc, value_fn),
    )


def _max_run(arr: Column) -> Column:
    """Length of the longest equal-element run of the sorted array —
    i.e. the max multiplicity; same single-pass shape as _dup_run_sum."""
    step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            acc["acc"],
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .cast("long"),
        ).alias("acc"),
    )
    return F.aggregate(
        F.array_sort(arr), _run_state(), step, lambda acc: acc["acc"]
    )


def dup_line_char_frac(text, line_delim: str = "\n") -> Column:
    """Fraction of characters in lines occurring more than once."""

    def body(lines: Column) -> Column:
        dup_chars = _dup_run_sum(lines, lambda run, prev: run * F.length(prev))
        total = F.aggregate(
            F.transform(lines, F.length),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        return F.when(total > 0, dup_chars / total.cast("double")).otherwise(
            F.lit(0.0)
        )

    # lines referenced twice (dup_chars + total): bind the split once
    return _let(_lines(text, line_delim), body)


def top_ngram_frac(text, n: int = 2) -> Column:
    """Token share of the most frequent n-gram: count*n/tokens, <=1."""
    top = _max_run(_grams(text, n))
    ntok = F.size(F.split(_col(text), " "))
    return F.when(
        (ntok > 0) & (top > 0),
        F.least(F.lit(1.0), top * n / ntok.cast("double")),
    ).otherwise(F.lit(0.0))


def dup_ngram_frac(text, n: int = 5) -> Column:
    """Fraction of n-gram occurrences that are repeats."""
    return _dup_frac(_grams(text, n))


def repetition_signals_frame(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_delim: str = "\n",
    top_n: int = 2,
    dup_n: int = 5,
    mode: str = "inrow",
):
    """All four Gopher signals as one frame
    ``(id, dup_line_frac, dup_line_char_frac, top_ngram_frac,
    dup_ngram_frac)`` with a ``mode`` switch:

    * ``"inrow"`` (default) — the pure-Column sorted-run aggregates
      above, fused into the scan; the right shape for real web docs
      (thousands of lines), where each row's arrays are small.
    * ``"explode"`` — the pathological-giant-doc fallback: a
      10^8-token book cannot live as one in-row array, so lines and
      n-grams are EXPLODED and counted via groupBy(doc, element) —
      splittable by (doc, element) key, bounded task memory. N-grams
      are built distributively by joining the positioned token table
      with itself n-1 times on (doc, pos+j) — no giant row anywhere.

    Both modes compute identical integer intermediates, so the double
    divisions agree EXACTLY (pinned in tests/test_repetition.py).
    ``mode='explode'`` requires non-null text (filter or fillna
    first); the in-row Columns map null text to 0.0.
    """
    ic = F.col(id_col)
    if mode == "inrow":
        return df.select(
            ic,
            dup_line_frac(text_col, line_delim).alias("dup_line_frac"),
            dup_line_char_frac(text_col, line_delim).alias(
                "dup_line_char_frac"
            ),
            top_ngram_frac(text_col, top_n).alias("top_ngram_frac"),
            dup_ngram_frac(text_col, dup_n).alias("dup_ngram_frac"),
        )
    if mode != "explode":
        raise ValueError(f"unknown mode {mode!r}")
    base = df.select(ic, F.col(text_col).alias("__t"))
    ntok = base.select(ic, F.size(F.split("__t", " ")).alias("__ntok"))
    # --- line signals: explode -> count per (doc, line) -> per-doc agg
    ln = base.select(ic, F.explode(F.split("__t", line_delim)).alias("__l"))
    lc = ln.groupBy(ic, "__l").agg(F.count(F.lit(1)).alias("__c"))
    lagg = lc.groupBy(ic).agg(
        F.sum("__c").alias("__nl"),
        F.count(F.lit(1)).alias("__dl"),
        F.sum(F.col("__c") * F.length("__l")).alias("__tc"),
        F.sum(
            F.when(F.col("__c") > 1, F.col("__c") * F.length("__l")).otherwise(
                F.lit(0)
            )
        ).alias("__dc"),
    )
    # --- gram signals: positioned tokens, n-way position self-join
    toks = base.select(
        ic, F.posexplode(F.split("__t", " ")).alias("__p", "__w0")
    )
    grams = None
    for top_or_dup, n in (("top", top_n), ("dup", dup_n)):
        g = toks
        parts = [F.col("__w0")]
        for j in range(1, n):
            nxt = toks.select(
                ic,
                (F.col("__p") - j).alias("__p"),
                F.col("__w0").alias(f"__w{j}"),
            )
            g = g.join(nxt, [id_col, "__p"])
            parts.append(F.col(f"__w{j}"))
        g = g.select(ic, F.concat_ws(" ", *parts).alias("__g"))
        gc = g.groupBy(ic, "__g").agg(F.count(F.lit(1)).alias("__c"))
        # only the aggregates each signal reads: top pass -> max count;
        # dup pass -> total + distinct (unused columns were dead
        # shuffle width on exactly the giant-doc path this mode is for)
        if top_or_dup == "top":
            aggs = [F.max("__c").alias("__top_top")]
        else:
            aggs = [
                F.sum("__c").alias("__dup_ng"),
                F.count(F.lit(1)).alias("__dup_dg"),
            ]
        gagg = gc.groupBy(ic).agg(*aggs)
        grams = gagg if grams is None else grams.join(gagg, id_col, "full")
    out = (
        ntok.join(lagg, id_col, "left").join(grams, id_col, "left")
    )
    zero = F.lit(0.0)
    return out.select(
        ic,
        F.when(
            F.col("__nl") > 0,
            (F.col("__nl") - F.col("__dl")) / F.col("__nl").cast("double"),
        )
        .otherwise(zero)
        .alias("dup_line_frac"),
        F.when(
            F.col("__tc") > 0, F.col("__dc") / F.col("__tc").cast("double")
        )
        .otherwise(zero)
        .alias("dup_line_char_frac"),
        F.when(
            (F.col("__ntok") > 0) & (F.coalesce("__top_top", F.lit(0)) > 0),
            F.least(
                F.lit(1.0),
                F.col("__top_top") * top_n / F.col("__ntok").cast("double"),
            ),
        )
        .otherwise(zero)
        .alias("top_ngram_frac"),
        F.when(
            F.coalesce("__dup_ng", F.lit(0)) > 0,
            (F.col("__dup_ng") - F.col("__dup_dg"))
            / F.col("__dup_ng").cast("double"),
        )
        .otherwise(zero)
        .alias("dup_ngram_frac"),
    )


# --- DuckDB twins, same shapes ---------------------------------------------


def _sql_lines(text: str, delim: str) -> str:
    # F.split is a regex split; string_split_regex is the literal twin
    d = delim.replace("\\", "\\\\").replace("'", "''")
    return f"string_split_regex({text}, '{d}')"


def _sql_grams(text: str, n: int) -> str:
    toks = f"string_split({text}, ' ')"
    parts = " || ' ' || ".join(f"({toks})[i + {j}]" for j in range(n))
    return (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 0) + 1), "
        f"i -> {parts})"
    )


def _sql_dup_frac(arr: str) -> str:
    return (
        f"(CASE WHEN len({arr}) > 0 THEN "
        f"(len({arr}) - len(list_distinct({arr}))) / cast(len({arr}) as double) "
        f"ELSE 0.0 END)"
    )


def sql_dup_line_frac(text: str, line_delim: str = "\n") -> str:
    return _sql_dup_frac(_sql_lines(text, line_delim))


def sql_dup_line_char_frac(text: str, line_delim: str = "\n") -> str:
    lines = _sql_lines(text, line_delim)
    dup = (
        f"list_sum(list_transform({lines}, x -> CASE WHEN "
        f"len(list_filter({lines}, y -> y = x)) > 1 "
        f"THEN length(x) ELSE 0 END))"
    )
    total = f"list_sum(list_transform({lines}, x -> length(x)))"
    return (
        f"(CASE WHEN coalesce({total}, 0) > 0 THEN "
        f"coalesce({dup}, 0) / cast({total} as double) ELSE 0.0 END)"
    )


def sql_top_ngram_frac(text: str, n: int = 2) -> str:
    grams = _sql_grams(text, n)
    counts = (
        f"list_transform(list_distinct({grams}), "
        f"x -> len(list_filter({grams}, y -> y = x)))"
    )
    top = f"coalesce(list_max({counts}), 0)"
    ntok = f"len(string_split({text}, ' '))"
    return (
        f"(CASE WHEN {ntok} > 0 AND {top} > 0 THEN "
        f"least(1.0, {top} * {n} / cast({ntok} as double)) ELSE 0.0 END)"
    )


def sql_dup_ngram_frac(text: str, n: int = 5) -> str:
    return _sql_dup_frac(_sql_grams(text, n))
