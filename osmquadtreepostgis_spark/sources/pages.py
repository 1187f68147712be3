"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1).

Distributed synthesis: ``spark.range(n)`` → ``mapInPandas`` building
each row from its index only (seedless, hash-derived) so any partition
can regenerate its rows independently — the property that makes the
10^12-row variant embarrassingly parallel (no driver-side data).

The ``text`` column embeds 0-3 geo-entity mentions from
CITY_GAZETTEER plus an explicit "at lat, lon" coordinate literal; the
mining operator must recover exactly these (golden fixture
``expected_mentions``). ``text`` is the per-row invariant: every
pipeline stage must carry it byte-identically (BASELINE.json).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .gazetteer import CITY_GAZETTEER

_CITIES = sorted(CITY_GAZETTEER)

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

_LANGS = ["en", "de", "fr", "es"]
_EPOCH = np.datetime64("2026-01-01T00:00:00")


def _mix(i: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic positive int64 hash of row index (overflow-free)."""
    return (i * 1103515245 + 12345 + salt * 2654435761) % 2147483648


def synthesize_pdf(idx: np.ndarray) -> pd.DataFrame:
    """Build pages rows for the given indices (pure numpy/pandas)."""
    idx = np.asarray(idx, dtype=np.int64)
    url = pd.Series(idx).map(lambda i: f"https://site{i % 997}.example/p/{i}")
    nm = _mix(idx, 0) % 4  # 0-3 mentions per page
    texts = []
    for k, i in enumerate(idx):
        parts = [f"Page {i} from crawl."]
        for j in range(int(nm[k])):
            h = int(_mix(np.array([i]), j + 1)[0])
            city = _CITIES[h % len(_CITIES)]
            lon, lat = CITY_GAZETTEER[city]
            jlon = round(lon + ((h >> 8) % 1000) / 1e5, 5)
            jlat = round(max(min(lat + ((h >> 4) % 1000) / 1e5, 85.0511), -85.0511), 5)
            parts.append(f"Mention of {city} at {jlat}, {jlon} in passing.")
        parts.append("End of page.")
        texts.append(" ".join(parts))
    text = pd.Series(texts)
    return pd.DataFrame(
        {
            "url": url,
            "warc_ts": pd.Series(_EPOCH + idx.astype("timedelta64[s]")),
            "html": ("<html><body>" + text + "</body></html>").map(
                lambda s: s.encode("utf-8")
            ),
            "text": text,
            "lang": pd.Series(idx % 4).map(lambda k: _LANGS[int(k)]),
        }
    )


def expected_mentions_pdf(idx: np.ndarray) -> pd.DataFrame:
    """Golden fixture: the mentions the miner must recover."""
    idx = np.asarray(idx, dtype=np.int64)
    nm = _mix(idx, 0) % 4
    rows = []
    for k, i in enumerate(idx):
        for j in range(int(nm[k])):
            h = int(_mix(np.array([i]), j + 1)[0])
            city = _CITIES[h % len(_CITIES)]
            lon, lat = CITY_GAZETTEER[city]
            jlon = round(lon + ((h >> 8) % 1000) / 1e5, 5)
            jlat = round(max(min(lat + ((h >> 4) % 1000) / 1e5, 85.0511), -85.0511), 5)
            rows.append((f"https://site{i % 997}.example/p/{i}", city, jlon, jlat))
    return pd.DataFrame(rows, columns=["url", "entity", "lon", "lat"])


def pages(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages table of ``n`` rows."""
    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            yield synthesize_pdf(pdf["id"].to_numpy())

    return rng.mapInPandas(gen, PAGES_SCHEMA)
