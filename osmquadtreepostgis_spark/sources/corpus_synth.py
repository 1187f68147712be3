"""Deterministic synthetic document corpus with PLANTED near-duplicate
structure — the scale fixture for the dedup-crossover evidence
(VERDICT r4 #2: banded MinHash vs exact inverted-index at growing
corpus size).

Same synthesis contract as :mod:`.pages`: ``spark.range(n)`` →
``mapInPandas`` building every row from its index only (seedless,
hash-derived), so any partition regenerates its rows independently —
the property that makes the 10^12-row variant embarrassingly parallel
and the output invariant under ``partitions=``.

Duplicate structure (all index-derived, closed-form):

* indices ``[0, n_base)`` are BASE docs: ``L`` tokens drawn from a
  ``w<k>`` vocabulary, ``L`` per-doc in ``[min_tokens, max_tokens]``.
* indices ``[n_base, n)`` are MUTATED COPIES of a base parent
  ``p = mix(i, 3) % n_base``: ``m`` tokens of ``B(p)`` replaced at
  evenly-spaced positions with tokens from a DISJOINT ``m<k>``
  namespace (a replacement can never equal the original).

  - even dup rank → LIGHT mutation, ``m = max(1, L//18)``: 3-gram
    set Jaccard vs parent ≈ (S-3m)/(S+3m) ≳ 0.7 (S = L-2 shingles)
    — a true near-dup at any threshold ≤ 0.7;
  - odd dup rank → HEAVY mutation, ``m = L//4``: Jaccard ≈ 0.13 —
    a hard negative that must NOT pair at t = 0.5.

:func:`synth_dup_truth` reproduces the planted (dup, parent, light)
triples driver-side with the same integer math, so recall tests never
re-derive structure from text.

The reference's analog of "synthesize the load deterministically" is
its fixture planet extracts (docs/output.txt:1-20); here the corpus
is index-derived so the SAME rows exist at every scale prefix:
``synth_documents(spark, n)`` rows 0..m-1 equal
``synth_documents(spark, m)`` rows for m <= n_base (base docs are
scale-invariant; dup parents depend only on n_base).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "synth_documents",
    "synth_dup_truth",
    "stage_synth_documents",
    "sql_synth_documents",
]

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("n_chars", T.IntegerType(), False),
    ]
)

_LANGS = np.array(["en", "de", "fr", "es"])


def _mix(i: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic positive int64 hash of an index (same LCG family
    as sources/pages.py:_mix; reduced mod 2**31 pre-multiply so the
    int64 product cannot overflow for any index)."""
    return ((i % 2147483648) * 1103515245 + 12345 + salt * 2654435761) % 2147483648


def _doc_len(gen_idx: np.ndarray, min_tokens: int, max_tokens: int) -> np.ndarray:
    return min_tokens + _mix(gen_idx, 4) % (max_tokens - min_tokens + 1)


def _split_counts(n_docs: int, dup_frac: float) -> tuple[int, int]:
    n_dup = int(n_docs * dup_frac)
    return n_docs - n_dup, n_dup


def _batch(
    idx: np.ndarray,
    n_base: int,
    min_tokens: int,
    max_tokens: int,
    vocab: int,
) -> pd.DataFrame:
    is_dup = idx >= n_base
    # generator index: the doc whose BASE token stream this row carries
    gen = np.where(is_dup, _mix(idx, 3) % max(n_base, 1), idx)
    L = _doc_len(gen, min_tokens, max_tokens)
    # per-doc replacement count m (0 for base docs); light/heavy by
    # dup rank parity so truth is recoverable without hashing again
    light = (idx - n_base) % 2 == 0
    m = np.where(
        is_dup, np.where(light, np.maximum(1, L // 18), L // 4), 0
    ).astype(np.int64)

    # flat token grid: doc index + intra-doc position per token
    offs = np.zeros(len(idx) + 1, dtype=np.int64)
    np.cumsum(L, out=offs[1:])
    total = int(offs[-1])
    row = np.repeat(np.arange(len(idx), dtype=np.int64), L)
    pos = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], L)

    gen_f = gen[row]
    idx_f = idx[row]
    L_f = L[row]
    m_f = m[row]
    base_tok = _mix(gen_f * 1000003 + pos, 5) % vocab
    # evenly-spaced selection of exactly m positions out of L:
    # position j is selected iff floor((j+1)m/L) > floor(jm/L)
    mut = ((pos + 1) * m_f) // L_f > (pos * m_f) // L_f
    repl_tok = _mix(idx_f * 1021 + pos, 9) % vocab
    toks = np.where(
        mut,
        np.char.add("m", repl_tok.astype("U7")),
        np.char.add("w", base_tok.astype("U7")),
    )

    texts = [" ".join(s) for s in np.split(toks, offs[1:-1])]
    return pd.DataFrame(
        {
            "doc_id": idx,
            "text": texts,
            "lang": _LANGS[_mix(idx, 10) % 4],
            "source": np.where(is_dup, "synth_dup", "synth_base"),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int32),
        }
    )


def synth_documents(
    spark: SparkSession,
    n_docs: int,
    dup_frac: float = 0.25,
    min_tokens: int = 40,
    max_tokens: int = 120,
    vocab: int = 50_000,
    partitions: int | None = None,
) -> DataFrame:
    """The planted-near-dup corpus as a distributed DataFrame with the
    testdata ``documents`` schema (doc_id, text, lang, source,
    n_chars). Partition-count-invariant; no driver-side data."""
    n_base, _ = _split_counts(n_docs, dup_frac)
    rng = spark.range(n_docs, numPartitions=partitions)

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield _batch(
                    pdf["id"].to_numpy(), n_base, min_tokens, max_tokens, vocab
                )

    return rng.mapInPandas(gen, DOCS_SCHEMA)


def synth_dup_truth(
    n_docs: int,
    dup_frac: float = 0.25,
) -> pd.DataFrame:
    """Planted (dup_id, parent_id, light) triples, driver-side, via
    the SAME index math as :func:`synth_documents` — light rows are
    the true near-dup pairs a threshold-0.5 dedup must recall."""
    n_base, n_dup = _split_counts(n_docs, dup_frac)
    dup = np.arange(n_base, n_docs, dtype=np.int64)
    return pd.DataFrame(
        {
            "dup_id": dup,
            "parent_id": _mix(dup, 3) % max(n_base, 1),
            "light": (dup - n_base) % 2 == 0,
        }
    )


def stage_synth_documents(
    spark: SparkSession,
    n_docs: int,
    path: str,
    dup_frac: float = 0.25,
    partitions: int | None = None,
) -> str:
    """Materialize the corpus to parquet (bench staging; generation is
    excluded from timed sections the same way stage_pages_parquet is)."""
    synth_documents(
        spark, n_docs, dup_frac=dup_frac, partitions=partitions
    ).write.mode("overwrite").parquet(path)
    return path


def sql_synth_documents(
    n_docs: int,
    dup_frac: float = 0.25,
    min_tokens: int = 40,
    max_tokens: int = 120,
    vocab: int = 50_000,
) -> str:
    """DuckDB twin of :func:`synth_documents` — a SELECT producing
    (doc_id, text) byte-identical to the Spark generator, from the
    SAME closed-form integer math (the generator is LCG mixing +
    integer division only, so the corpus itself is oracle-checkable:
    the driver's DuckDB gate can regenerate it independently)."""
    n_base, _ = _split_counts(n_docs, dup_frac)
    span = max_tokens - min_tokens + 1

    def mix(expr: str, salt: int) -> str:
        return (
            f"((({expr}) % 2147483648) * 1103515245 + 12345 + "
            f"{salt * 2654435761}) % 2147483648"
        )

    gen = f"(CASE WHEN i >= {n_base} THEN ({mix('i', 3)}) % {n_base} ELSE i END)"
    return f"""
        SELECT doc_id, array_to_string(toks, ' ') AS text FROM (
          SELECT i AS doc_id,
                 list_transform(range(0, L), j -> CASE
                   WHEN ((j + 1) * m) // L > (j * m) // L
                   THEN 'm' || cast(({mix('i * 1021 + j', 9)}) % {vocab} AS varchar)
                   ELSE 'w' || cast(({mix('g * 1000003 + j', 5)}) % {vocab} AS varchar)
                 END) AS toks
          FROM (
            SELECT i, g, L,
                   CASE WHEN i >= {n_base} THEN
                     CASE WHEN (i - {n_base}) % 2 = 0
                          THEN greatest(1, L // 18) ELSE L // 4 END
                   ELSE 0 END AS m
            FROM (
              SELECT i, g, {min_tokens} + ({mix('g', 4)}) % {span} AS L
              FROM (SELECT i, {gen} AS g FROM range(0, {n_docs}) r(i))
            )
          )
        )"""
