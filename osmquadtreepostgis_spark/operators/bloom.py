"""Bloom-prefiltered exact incremental dedup — the crawl seen-set
membership shape at 10^12 documents.

The reference dedups implicitly through its single-writer table keys
(src/postgiswriter.cpp's per-table primary keys); a Common-Crawl-scale
recrawl pipeline needs the explicit form: "has this exact content been
ingested before?" against a corpus orders of magnitude larger than the
batch.  A plain semi-join answers it exactly but shuffles BOTH sides —
at web scale the corpus side is the whole seen-set every batch.  This
operator keeps the exact answer while making the overwhelmingly common
case (a genuinely new document) a MAP-SIDE reject that never joins:

1. **Build** (once per corpus epoch, incrementally extendable since
   Bloom insert is idempotent bit-OR): k bit positions per seen key
   from JVM-side ``xxhash64(key, i)`` (pure Column, no Python), then
   ONE map-side-combinable aggregate ``groupBy(pos >> 6) ->
   bit_or(1 << (pos & 63))`` produces the filter as <= m/64 sparse
   int64 words.  The collect is the filter itself — 2 MiB at m=2^24 —
   a broadcast-side build exactly like PolygonIndex.from_polygons_df
   (operators/pip.py), NOT driver data-path state.
2. **Probe**: the batch computes the same k JVM-side positions and an
   Arrow-batched numpy UDF tests the broadcast words
   (``(words[pos >> 6] >> (pos & 63)) & 1``) — vectorized over the
   whole Arrow batch, never per-row Python.
3. **Verify**: only ``maybe``-rows (true dups + the ~(1-e^{-kn/m})^k
   false-positive sliver) reach the exact semi-join against the
   corpus; definitely-new rows skip it entirely.  No false negatives
   exist by construction, so the final answer is EXACT — the oracle
   is the plain text-equality join.

At a 1 % dup rate and 1 % FP rate the verify join probes ~2 % of the
batch instead of 100 %, and the corpus side of that join is loaded
once per epoch; the Bloom words are the only thing every executor
holds.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

__all__ = [
    "bloom_parameters",
    "bloom_positions",
    "build_bloom",
    "with_bloom_maybe",
    "dedup_incremental_bloom",
]


def bloom_parameters(n_keys: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) sized for ``n_keys`` at ``fp_rate``: the standard
    m = -n ln p / ln²2 rounded up to a power of two (so ``pmod`` is a
    mask-friendly modulus), k = round(m/n ln 2) clamped to [1, 16]."""
    if n_keys <= 0:
        raise ValueError("n_keys must be positive")
    if not 0.0 < fp_rate < 1.0:
        raise ValueError("fp_rate must be in (0, 1)")
    m = max(64, -n_keys * math.log(fp_rate) / (math.log(2) ** 2))
    m_bits = 1 << max(6, math.ceil(math.log2(m)))
    k = max(1, min(16, round(m_bits / n_keys * math.log(2))))
    return m_bits, k


def bloom_positions(key_col: str, m_bits: int, k: int):
    """k bit-position Columns for ``key_col`` — JVM-side
    ``pmod(xxhash64(key, i), m)``; build and probe use THIS function so
    they agree by construction."""
    return [
        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
        for i in range(k)
    ]


def build_bloom(
    keys: DataFrame, key_col: str, m_bits: int, k: int
) -> np.ndarray:
    """Distributed Bloom build -> uint64 word array of length m/64.
    One explode + one map-side-combinable bit_or aggregate; the collect
    IS the (small, broadcastable) filter — labeled broadcast-side
    build, never row data."""
    pos = keys.select(
        F.explode(F.array(*bloom_positions(key_col, m_bits, k))).alias("p")
    )
    words = (
        pos.select(
            F.expr("p >> 6").alias("w"),
            F.expr("shiftleft(1L, cast(p & 63 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        .collect()
    )
    arr = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in words:
        arr[int(r["w"])] = np.uint64(np.int64(r["bits"]).view(np.uint64))
    return arr


def with_bloom_maybe(
    df: DataFrame,
    key_col: str,
    words: np.ndarray,
    m_bits: int,
    k: int,
    out: str = "__maybe",
) -> DataFrame:
    """Adds boolean ``out``: true iff ALL k bits for ``key_col`` are
    set (might-contain).  Positions are JVM Columns; the broadcast
    word-array test is one Arrow-batched numpy UDF (vectorized over
    the batch, no per-row Python)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(words)

    @F.pandas_udf(BooleanType())
    def _probe(positions):  # Series of length-k lists
        w = bc.value
        mat = np.vstack(positions.to_numpy())  # (rows, k) int64 >= 0
        word = w[(mat >> 6).astype(np.int64)]
        bit = np.uint64(1) << (mat.astype(np.uint64) & np.uint64(63))
        return pd.Series(((word & bit) != 0).all(axis=1))

    return df.withColumn(
        out, _probe(F.array(*bloom_positions(key_col, m_bits, k)))
    )


def dedup_incremental_bloom(
    new: DataFrame,
    seen: DataFrame,
    id_col: str = "doc_id",
    key_col: str = "text",
    fp_rate: float = 0.01,
    n_keys: int | None = None,
) -> DataFrame:
    """(id, seen_before) for each new row: EXACT membership of
    ``key_col`` in the seen corpus — Bloom prefilter for the map-side
    definitely-new reject, exact semi-join verification for the maybe
    sliver.  Equal to the plain join by construction (no false
    negatives; false positives die in verify)."""
    keys = seen.select(F.col(key_col).alias("__k")).distinct()
    if n_keys is None:
        n_keys = keys.count()  # one tiny action; corpus-epoch metadata
    m_bits, k = bloom_parameters(max(n_keys, 1), fp_rate)
    words = build_bloom(keys, "__k", m_bits, k)

    probed = with_bloom_maybe(
        new.select(F.col(id_col), F.col(key_col).alias("__k")),
        "__k",
        words,
        m_bits,
        k,
    )
    maybe = probed.filter(F.col("__maybe"))
    truly = maybe.join(keys, "__k", "left_semi").select(
        id_col, F.lit(True).alias("seen_before")
    )
    return (
        probed.select(id_col)
        .join(truly, id_col, "left")
        .select(
            id_col, F.coalesce("seen_before", F.lit(False)).alias("seen_before")
        )
    )
