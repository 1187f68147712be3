"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1).

Distributed synthesis: ``spark.range(n)`` → ``mapInPandas`` building
each row from its index only (seedless, hash-derived) so any partition
can regenerate its rows independently — the property that makes the
10^12-row variant embarrassingly parallel (no driver-side data). All
string assembly is vectorized pandas/numpy.

The ``text`` column embeds 0-3 geo-entity mentions from
CITY_GAZETTEER plus an explicit "at lat, lon" coordinate literal; the
mining operator must recover exactly these (golden fixture
``expected_mentions_pdf``, produced by the same vectorized kernel so
fixture and data cannot drift). ``text`` is the per-row invariant:
every pipeline stage must carry it byte-identically (BASELINE.json).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .gazetteer import CITY_GAZETTEER

_CITIES = sorted(CITY_GAZETTEER)
_CITY_ARR = np.array(_CITIES)
_CLON = np.array([CITY_GAZETTEER[c][0] for c in _CITIES])
_CLAT = np.array([CITY_GAZETTEER[c][1] for c in _CITIES])

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

_LANGS = np.array(["en", "de", "fr", "es"])
_EPOCH = np.datetime64("2026-01-01T00:00:00")


def _mix(i: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic positive int64 hash of row index.

    ``i`` is reduced mod 2**31 before the multiply so the int64 product
    can never overflow (max ~2**61), for any index up to the advertised
    10**12-row variant. Identical values to the unreduced form for all
    idx < 2**31 (every materialized fixture)."""
    return ((i % 2147483648) * 1103515245 + 12345 + salt * 2654435761) % 2147483648


_R5_SINT: np.ndarray | None = None
_R5_DOTFRAC: np.ndarray | None = None


def _round5_luts() -> tuple[np.ndarray, np.ndarray]:
    """Lookup tables for _round5_str, built once per process (workers
    are reused, and this module is importable on executors, so the
    ~40 ms build amortizes across tasks): signed integer-part strings
    for |int| <= 180 (generator domain) and '.'-prefixed,
    trailing-zero-stripped fraction strings for all 100k 5-digit
    fractions."""
    global _R5_SINT, _R5_DOTFRAC
    if _R5_SINT is None:
        _R5_SINT = np.array(
            [str(i) for i in range(181)] + [f"-{i}" for i in range(181)],
            dtype=object,
        )
        _R5_DOTFRAC = np.array(
            ["." + (str(f).rjust(5, "0").rstrip("0") or "0") for f in range(100000)],
            dtype=object,
        )
    return _R5_SINT, _R5_DOTFRAC


def _round5_str(x: np.ndarray) -> np.ndarray:
    """repr of round(x, 5), fully vectorized via integer decimal math.

    Inputs are always np.round(coord, 5) values with |x| in [1.3, 180]
    (city-anchored), so the 5-digit decimal m/1e5 is the shortest
    round-tripping decimal and equals CPython's repr — verified
    EXHAUSTIVELY against repr(round(float(v), 5)) over every (city
    coordinate x offset) value the generator can produce (192k combos,
    0 mismatches). r6: the per-row f-string loop became two LUT
    gathers + one object-array concat (~5x on the synthesis kernel's
    dominant term; byte-identical by construction — the LUT entries
    are the same rjust/rstrip strings the loop built)."""
    m = np.rint(np.asarray(x, dtype=np.float64) * 1e5).astype(np.int64)
    sint, dotfrac = _round5_luts()
    a = np.abs(m)
    key = a // 100000 + np.where(m < 0, 181, 0)
    return np.add(sint[key], dotfrac[a % 100000])


def _mention_cols(idx: np.ndarray, j: int):
    """Mention j (0-based) of each page: (exists, city, lon, lat)."""
    nm = _mix(idx, 0) % 4
    exists = nm > j
    h = _mix(idx, j + 1)
    ci = (h % len(_CITIES)).astype(np.int64)
    jlon = np.round(_CLON[ci] + ((h >> 8) % 1000) / 1e5, 5)
    jlat = np.round(
        np.clip(_CLAT[ci] + ((h >> 4) % 1000) / 1e5, -85.0511, 85.0511), 5
    )
    return exists, _CITY_ARR[ci], jlon, jlat


def synthesize_pdf(idx: np.ndarray) -> pd.DataFrame:
    """Build pages rows for the given indices (vectorized)."""
    idx = np.asarray(idx, dtype=np.int64)
    url = (
        "https://site"
        + pd.Series(idx % 997).astype(str)
        + ".example/p/"
        + pd.Series(idx).astype(str)
    )
    text = "Page " + pd.Series(idx).astype(str) + " from crawl."
    for j in range(3):
        exists, city, jlon, jlat = _mention_cols(idx, j)
        m = (
            " Mention of "
            + pd.Series(city)
            + " at "
            + pd.Series(_round5_str(jlat))
            + ", "
            + pd.Series(_round5_str(jlon))
            + " in passing."
        )
        text = text + m.where(exists, "")
    text = text + " End of page."
    return pd.DataFrame(
        {
            "url": url,
            "warc_ts": pd.Series(_EPOCH + idx.astype("timedelta64[s]")),
            "html": ("<html><body>" + text + "</body></html>").map(
                lambda s: s.encode("utf-8")
            ),
            "text": text,
            "lang": pd.Series(_LANGS[(idx % 4).astype(np.int64)]),
        }
    )


def expected_mentions_pdf(idx: np.ndarray) -> pd.DataFrame:
    """Golden fixture: the mentions the miner must recover (built from
    the same vectorized kernel as synthesize_pdf)."""
    idx = np.asarray(idx, dtype=np.int64)
    frames = []
    url = pd.Series(
        "https://site" + pd.Series(idx % 997).astype(str) + ".example/p/"
        + pd.Series(idx).astype(str)
    )
    for j in range(3):
        exists, city, jlon, jlat = _mention_cols(idx, j)
        frames.append(
            pd.DataFrame(
                {
                    "url": url[exists],
                    "entity": city[exists],
                    "lon": jlon[exists],
                    "lat": jlat[exists],
                    "j": j,
                }
            )
        )
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(["url", "j"], ignore_index=True)[
        ["url", "entity", "lon", "lat"]
    ]


def pages(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages table of ``n`` rows."""
    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            yield synthesize_pdf(pdf["id"].to_numpy())

    return rng.mapInPandas(gen, PAGES_SCHEMA)


def stage_pages_parquet(
    spark: SparkSession, n: int, path: str, partitions: int | None = None
) -> str:
    """Materialize the pages table to parquet (bench/ingest staging —
    the 'Iceberg table of pages' stand-in the pipeline reads from)."""
    pages(spark, n, partitions).write.mode("overwrite").parquet(path)
    return path
