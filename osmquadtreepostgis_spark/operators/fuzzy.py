"""Trigram fuzzy text lookup — the gin trigram-index analog.

The reference builds ``gin (name gin_trgm_ops)`` indices on every
geometry table's name column precisely to serve fuzzy name search
(``name % 'query'`` — /root/reference/osmquadtreepostgis/__init__.py:
249-250, 278, 295). The Spark-native twin needs no index: a literal
query probe is a PURE-COLUMN filter (the trigram set of the constant
folds at plan time, the per-row trigram build + intersect stays inside
whole-stage codegen and pushes to the scan), and name-vs-name
similarity pairs reuse the prefix-filtered set-Jaccard join from the
dedup family.

Trigram model (pg_trgm semantics, simplified to its documented
default): lowercase, split on non-alphanumeric, each word padded with
two leading and one trailing space, distinct 3-grams over the padded
words. ``sql_char_trigrams`` emits the identical DuckDB expression so
both operators are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import set_jaccard_pairs

__all__ = [
    "char_trigrams",
    "sql_char_trigrams",
    "name_similar",
    "similar_name_pairs",
]


def char_trigrams(name: Column | str) -> Column:
    """Distinct pg_trgm-style character trigrams of a string column:
    lowercase, words split on non-alphanumeric, each word padded
    ``'  ' + w + ' '``."""
    c = F.col(name) if isinstance(name, str) else name
    words = F.filter(
        F.split(F.lower(c), "[^a-z0-9]+"), lambda w: w != F.lit("")
    )
    padded = F.transform(words, lambda w: F.concat(F.lit("  "), w, F.lit(" ")))
    tri = F.transform(
        padded,
        lambda p: F.transform(
            F.sequence(F.lit(1), F.length(p) - 2),
            lambda i: p.substr(i, F.lit(3)),
        ),
    )
    return F.array_distinct(F.flatten(tri))


def sql_char_trigrams(expr: str) -> str:
    """DuckDB twin of :func:`char_trigrams` (list comprehension over
    ``range``, which is end-exclusive where Spark's ``sequence`` is
    inclusive)."""
    return (
        "list_distinct(flatten(list_transform("
        f"list_filter(string_split_regex(lower({expr}), '[^a-z0-9]+'),"
        " w -> w != ''),"
        " w -> list_transform(range(1, length('  ' || w || ' ') - 1),"
        " i -> substr('  ' || w || ' ', cast(i as int), 3)))))"
    )


def name_similar(
    df: DataFrame,
    query: str,
    threshold: float = 0.3,
    name_col: str = "name",
) -> DataFrame:
    """Fuzzy name lookup: rows whose ``name_col`` has trigram-set
    Jaccard similarity >= ``threshold`` against the literal ``query``
    (the ``name % 'query'`` analog). Appends ``similarity`` (4dp).

    Scale shape: no join, no shuffle — the query's trigram set is a
    constant array, so this is a codegen'd filter evaluated inside the
    scan stage; at 100 TB it costs one pass like any other predicate
    (the role the reference's gin trigram index plays for PostgreSQL).
    """
    tri = char_trigrams(name_col)
    qt = char_trigrams(F.lit(query))
    inter = F.size(F.array_intersect(tri, qt))
    sim = inter / (F.size(tri) + F.size(qt) - inter)
    return df.filter(sim >= threshold).withColumn(
        "similarity", F.round(sim, 4)
    )


def similar_name_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    name_col: str = "name",
    id_col: str = "id",
) -> DataFrame:
    """All (id_a, id_b, jaccard) pairs of rows with trigram-similar
    names — near-duplicate/typo detection across the table, via the
    same prefix-filtered set-Jaccard join the n-gram dedup uses
    (rarest-trigram-first global order caps hot-trigram blowup)."""
    sets = df.select(
        F.col(id_col).alias("id"), char_trigrams(name_col).alias("__sh")
    )
    return set_jaccard_pairs(sets, threshold)
