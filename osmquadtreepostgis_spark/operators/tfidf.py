"""Corpus term-weighting operators: per-document TF-IDF top-k keyword
extraction and global PMI bigram collocation mining.

These are the classical "describe the corpus" steps of a training-data
pipeline (dataset cards, topic drift monitoring, boilerplate term
discovery) that sit beside the dedup/curation family. The reference
exposes tag-value frequency surfaces over its planet tables (e.g. the
per-key tag pivots and minzoom visibility stats,
/root/reference/osmquadtreepostgis/__init__.py:202-279); this module is
the text-corpus analog re-expressed Spark-first.

Scale notes (100 TB):

* Everything is explode -> keyed aggregation -> keyed equi-join. No
  cartesian products, no driver-side state, no collects. The only
  single-row structure is the corpus-total aggregate, joined back via
  an explicit ``broadcast``.
* The (doc_id, term) TF aggregate is the big shuffle; it combines
  map-side (partial count before exchange). The document-frequency
  table is |vocabulary| rows — orders of magnitude smaller than the
  token stream — so the tf⋈df join is a plain shuffle join that AQE
  will demote to broadcast when the vocabulary fits.
* The per-document top-k window partitions by doc_id; per-doc distinct
  terms are bounded by document length, so there is no skewed window
  key (contrast :func:`..corpus.cap_per_key`, which exists for the
  per-DOMAIN capping case where keys do explode).
* Collocation mining's global top-k is ``orderBy(...).limit(k)`` —
  Spark plans TakeOrderedAndProject (per-partition heap + driver merge
  of k rows), not a global sort.

Cross-engine float parity: scores involve ``ln``; the rank ordering is
computed on the UNROUNDED double with a deterministic term tie-break,
and the emitted score is rounded to 4 dp in both engines. All other
arithmetic (integer ratios, +, *) is IEEE-exact and identical across
engines; a last-ulp `ln` divergence can only flip a rank between two
terms whose scores differ by <1e-15 relative — which for distinct
(cnt, df) integer pairs does not occur on real inputs (equal pairs tie
exactly and fall to the term tie-break in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "tfidf_topk",
    "collocations_pmi",
    "sql_tfidf_topk",
    "sql_collocations_pmi",
    "unigram_surprisal",
    "sql_unigram_surprisal",
    "search_conjunctive",
    "sql_search_conjunctive",
]


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace tokens, empty tokens dropped (matches
    functions.text.token_count's split-on-space contract)."""
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .where(F.length("term") > 0)
    )


def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k keywords per document by smoothed TF-IDF
    (sklearn-style ``idf = ln((1+N)/(1+df)) + 1``, ``tf = cnt/len``).

    Output: (id_col, term, cnt, dfreq, tfidf) — cnt is the in-doc term
    count, dfreq the number of documents containing the term, tfidf the
    4-dp-rounded score. Ranking happens on the unrounded score with a
    term-ascending tie-break, so the selected rows are deterministic.

    Plan: one explode, two keyed aggregations sharing the exploded
    scan, a vocabulary-sized shuffle join, a broadcast single-row total,
    and a per-doc bounded window. See module docstring for the 100 TB
    audit.
    """
    toks = _tokens(df, id_col, text_col)
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("cnt"))
    tot = tf.groupBy(id_col).agg(F.sum("cnt").alias("tot"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    nd = (
        df.where(F.col(text_col).isNotNull())
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    raw = (F.col("cnt") / F.col("tot")) * (
        F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("dfreq")))
        + F.lit(1.0)
    )
    scored = (
        tf.join(tot, id_col)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .withColumn("__raw", raw)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__raw").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            id_col,
            "term",
            "cnt",
            "dfreq",
            F.round("__raw", 4).alias("tfidf"),
        )
    )


def sql_tfidf_topk(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> str:
    """DuckDB twin of :func:`tfidf_topk` (identical tokenization,
    arithmetic order, tie-break, and rounding)."""
    return f"""
        WITH d AS (
          SELECT {id_col}, {text_col} FROM {table}
          WHERE {text_col} IS NOT NULL
        ),
        tok AS (
          SELECT d.{id_col}, t.term
          FROM d, unnest(string_split(d.{text_col}, ' ')) AS t(term)
          WHERE length(t.term) > 0
        ),
        tf AS (
          SELECT {id_col}, term, count(*) AS cnt
          FROM tok GROUP BY {id_col}, term
        ),
        tot AS (
          SELECT {id_col}, sum(cnt) AS tot FROM tf GROUP BY {id_col}
        ),
        dfq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY term),
        nd AS (SELECT count(*) AS n_docs FROM d),
        s AS (
          SELECT tf.{id_col}, tf.term, tf.cnt, dfq.dfreq,
                 (tf.cnt / tot.tot)
                   * (ln((1.0 + nd.n_docs) / (1.0 + dfq.dfreq)) + 1.0)
                   AS raw
          FROM tf
          JOIN tot USING ({id_col})
          JOIN dfq USING (term)
          CROSS JOIN nd
        ),
        r AS (
          SELECT s.*, row_number() OVER (
            PARTITION BY {id_col} ORDER BY raw DESC, term ASC
          ) AS rn FROM s
        )
        SELECT {id_col}, term, cnt, dfreq, round(raw, 4) AS tfidf
        FROM r WHERE rn <= {k}"""


def collocations_pmi(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Global top-k bigram collocations by pointwise mutual information:
    ``pmi = ln( (c_ab/B) / ((c_a/U) * (c_b/U)) )`` with unigram totals
    U, bigram totals B, and a ``min_count`` support floor on c_ab.

    Output: (w1, w2, pair_cnt, w1_cnt, w2_cnt, pmi) — k rows, ranked
    pmi desc with (w1, w2) tie-break. Bigrams are adjacent-token pairs
    built pure-Column (two shifted array slices zipped), so the token
    stream is exploded once per arm with no Python in the hot path.
    """
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__toks")
    )
    toks = base.select(
        F.explode("__toks").alias("w")
    ).where(F.length("w") > 0)
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("w_cnt"))
    utot = toks.agg(F.count(F.lit(1)).alias("u_tot"))

    n = F.size("__toks")
    pairs = (
        base.select(
            F.explode(
                F.arrays_zip(
                    F.slice("__toks", 1, n - 1).alias("w1"),
                    F.slice(F.col("__toks"), 2, n - 1).alias("w2"),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .where((F.length("w1") > 0) & (F.length("w2") > 0))
    )
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_cnt"))
    btot = pairs.agg(F.count(F.lit(1)).alias("b_tot"))

    pmi = F.log(
        (F.col("pair_cnt") / F.col("b_tot"))
        / ((F.col("w1_cnt") / F.col("u_tot")) * (F.col("w2_cnt") / F.col("u_tot")))
    )
    scored = (
        big.where(F.col("pair_cnt") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("w_cnt").alias("w1_cnt")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("w_cnt").alias("w2_cnt")), "w2")
        .crossJoin(F.broadcast(utot))
        .crossJoin(F.broadcast(btot))
        .withColumn("__pmi", pmi)
    )
    return (
        scored.orderBy(F.col("__pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(k)
        .select(
            "w1",
            "w2",
            "pair_cnt",
            "w1_cnt",
            "w2_cnt",
            F.round("__pmi", 4).alias("pmi"),
        )
    )


def sql_collocations_pmi(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> str:
    """DuckDB twin of :func:`collocations_pmi`."""
    return f"""
        WITH d AS (
          SELECT {id_col}, string_split({text_col}, ' ') AS toks
          FROM {table} WHERE {text_col} IS NOT NULL
        ),
        tok AS (
          SELECT t.w FROM d, unnest(d.toks) AS t(w) WHERE length(t.w) > 0
        ),
        uni AS (SELECT w, count(*) AS w_cnt FROM tok GROUP BY w),
        utot AS (SELECT count(*) AS u_tot FROM tok),
        pr AS (
          SELECT d.toks[i.i] AS w1, d.toks[i.i + 1] AS w2
          FROM d, unnest(range(1, len(d.toks))) AS i(i)
          WHERE length(d.toks[i.i]) > 0 AND length(d.toks[i.i + 1]) > 0
        ),
        big AS (
          SELECT w1, w2, count(*) AS pair_cnt FROM pr GROUP BY w1, w2
        ),
        btot AS (SELECT count(*) AS b_tot FROM pr),
        s AS (
          SELECT big.w1, big.w2, big.pair_cnt, u1.w_cnt AS w1_cnt,
                 u2.w_cnt AS w2_cnt,
                 ln((big.pair_cnt / btot.b_tot)
                    / ((u1.w_cnt / utot.u_tot) * (u2.w_cnt / utot.u_tot)))
                   AS raw
          FROM big
          JOIN uni u1 ON u1.w = big.w1
          JOIN uni u2 ON u2.w = big.w2
          CROSS JOIN utot CROSS JOIN btot
          WHERE big.pair_cnt >= {min_count}
        )
        SELECT w1, w2, pair_cnt, w1_cnt, w2_cnt, round(raw, 4) AS pmi
        FROM s
        ORDER BY raw DESC, w1 ASC, w2 ASC
        LIMIT {k}"""


def unigram_surprisal(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-trained unigram surprisal score in EXACT integer bits.

    The classical LM-perplexity quality filter (score docs by how
    surprising their tokens are under a corpus-trained language
    model) needs a distributed-deterministic formulation: summing
    ``-ln p(token)`` doubles per document is order-dependent under
    shuffle, so the same job can hash-differ run to run.  This
    operator quantizes per-token surprisal to whole bits computed in
    integer arithmetic::

        bits(token) = ilog2(total_tokens) - ilog2(count(token))
        ilog2(n)    = length(bin(n)) - 1      (exact, no float log)

    i.e. ``floor``-resolution ``-log2`` of the unigram frequency.
    Integer sums are order-independent, so the per-doc aggregate is
    bit-stable at any scale; the only float op is one final division
    (sum_bits / n_tokens), identical in both engines.  Within ±1 bit
    this tracks true unigram surprisal — ample resolution for
    quality filtering, where thresholds are whole bits apart.

    Scale shape: token explode -> ONE (term) count aggregate
    (map-side combined; the vocabulary result is tiny vs the stream)
    -> single-row total via broadcast -> token⋈count keyed equi-join
    (AQE demotes to broadcast when the vocabulary fits; stop-word
    skew combines in the upstream aggregate, and the join build side
    is the vocabulary, not the stream) -> ONE per-doc aggregate.
    """
    toks = _tokens(df, id_col, text_col)
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    scored = (
        toks.join(counts, "term")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            (F.length(F.bin("total")) - F.length(F.bin("cnt"))).alias("__bits"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("__bits").cast("long").alias("sum_bits"),
        (F.sum("__bits").cast("double") / F.count(F.lit(1))).alias("surprisal"),
    )


def sql_unigram_surprisal(
    docs_rel: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`unigram_surprisal` (same integer-bit
    quantization; ``bin()`` exists in both dialects)."""
    return f"""
        WITH __us_tok AS (
          SELECT {id_col}, t.term
          FROM {docs_rel}, unnest(string_split({text_col}, ' ')) AS t(term)
          WHERE {text_col} IS NOT NULL AND length(t.term) > 0
        ),
        __us_cnt AS (
          SELECT term, count(*) AS cnt FROM __us_tok GROUP BY term
        ),
        __us_tot AS (
          SELECT cast(sum(cnt) as bigint) AS total FROM __us_cnt
        ),
        __us_bits AS (
          SELECT k.{id_col},
                 length(bin(t.total)) - length(bin(c.cnt)) AS bits
          FROM __us_tok k JOIN __us_cnt c USING (term), __us_tot t
        )
        SELECT {id_col},
               count(*) AS n_tokens,
               cast(sum(bits) as bigint) AS sum_bits,
               cast(sum(bits) as double) / count(*) AS surprisal
        FROM __us_bits
        GROUP BY {id_col}"""


def search_conjunctive(
    df: DataFrame,
    terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Conjunctive (AND) term retrieval with TF-IDF ranking — the
    boolean-search probe over the same inverted-index shape
    :func:`tfidf_topk` builds.  Returns the global top-``k`` documents
    containing ALL query terms, scored by the summed smoothed TF-IDF
    of the query terms (same idf formula as tfidf_topk so the two
    surfaces agree).

    Output: (id, n_hits, score) — n_hits = total query-term
    occurrences in the doc, score 4-dp (ranking on the unrounded score
    with an id tie-break).

    Scale shape: the query-term filter lands BEFORE the explode-side
    aggregate (posting rows for non-query terms never materialize — at
    production scale this probe runs against a pre-materialized posting
    table partitioned by term, and this operator is exactly that probe
    plan); AND semantics is one count-distinct-terms == |q| aggregate;
    document length comes from a pure-Column token count (no second
    explode); per-term document frequencies are |q| rows, broadcast;
    global top-k is TakeOrderedAndProject, never a sort of the match
    set.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    q = sorted(set(terms))
    toks = _tokens(df, id_col, text_col).where(F.col("term").isin(q))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("cnt"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    nd = (
        df.where(F.col(text_col).isNotNull())
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    # doc length without a second explode: size of the non-empty splits
    dlen = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.size(
            F.filter(
                F.split(F.col(text_col), " "), lambda t: F.length(t) > 0
            )
        ).alias("doclen"),
    )
    idf = F.log(
        (F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("dfreq"))
    ) + F.lit(1.0)
    part = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(nd))
    per_doc = part.groupBy(id_col).agg(
        F.countDistinct("term").alias("__nt"),
        F.sum("cnt").alias("n_hits"),
        F.sum(F.col("cnt") * idf).alias("__num"),
    )
    scored = (
        per_doc.where(F.col("__nt") == len(q))
        .join(dlen, id_col)
        .withColumn("__raw", F.col("__num") / F.col("doclen"))
    )
    return (
        scored.orderBy(F.col("__raw").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "n_hits", F.round("__raw", 4).alias("score"))
    )


def sql_search_conjunctive(
    terms: list[str],
    k: int = 20,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`search_conjunctive` (identical
    tokenization, idf, aggregation order, tie-break, rounding)."""
    q = sorted(set(terms))
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in q)
    return f"""
        WITH d AS (
          SELECT {id_col}, {text_col} FROM {table}
          WHERE {text_col} IS NOT NULL
        ),
        tok AS (
          SELECT d.{id_col}, t.term
          FROM d, unnest(string_split(d.{text_col}, ' ')) AS t(term)
          WHERE length(t.term) > 0 AND t.term IN ({in_list})
        ),
        tf AS (
          SELECT {id_col}, term, count(*) AS cnt
          FROM tok GROUP BY {id_col}, term
        ),
        dfq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY term),
        nd AS (SELECT count(*) AS n_docs FROM d),
        dl AS (
          SELECT {id_col},
                 len(list_filter(string_split({text_col}, ' '),
                                 t -> length(t) > 0)) AS doclen
          FROM d
        ),
        per AS (
          SELECT tf.{id_col},
                 count(DISTINCT tf.term) AS nt,
                 cast(sum(tf.cnt) as bigint) AS n_hits,
                 sum(tf.cnt * (ln((1.0 + nd.n_docs) / (1.0 + dfq.dfreq))
                               + 1.0)) AS num
          FROM tf JOIN dfq USING (term) CROSS JOIN nd
          GROUP BY tf.{id_col}
        )
        SELECT per.{id_col}, per.n_hits,
               round(per.num / dl.doclen, 4) AS score
        FROM per JOIN dl USING ({id_col})
        WHERE per.nt = {len(q)}
        ORDER BY (per.num / dl.doclen) DESC, per.{id_col} ASC
        LIMIT {k}"""
