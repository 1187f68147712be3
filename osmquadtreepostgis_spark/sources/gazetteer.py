"""Deterministic gazetteers — the engine's entity → (lon, lat) lookup.

Two gazetteers:

* ``CITY_GAZETTEER``: real-world city names with fixed coordinates,
  used by the synthetic pages table (FIXTURES.md §1-2) and its mining
  golden fixtures.
* ``VOCAB_GAZETTEER``: the driver's ``documents.text`` vocabulary
  mapped to deterministic coordinates, so geo-entity mining over the
  driver-provided table is fully oracle-checkable (the coordinates are
  emitted as SQL literals via :func:`sql_values`).

Coordinates are plain doubles; ``repr`` round-trips them exactly, so
the Python kernels and the generated oracle SQL see identical values.
"""

from __future__ import annotations

CITY_GAZETTEER: dict[str, tuple[float, float]] = {
    "London": (-0.1276, 51.5072),
    "Paris": (2.3522, 48.8566),
    "Berlin": (13.405, 52.52),
    "Madrid": (-3.7038, 40.4168),
    "Rome": (12.4964, 41.9028),
    "Vienna": (16.3738, 48.2082),
    "Warsaw": (21.0122, 52.2297),
    "Moscow": (37.6173, 55.7558),
    "Istanbul": (28.9784, 41.0082),
    "Cairo": (31.2357, 30.0444),
    "Lagos": (3.3792, 6.5244),
    "Nairobi": (36.8219, -1.2921),
    "Johannesburg": (28.0473, -26.2041),
    "Dubai": (55.2708, 25.2048),
    "Mumbai": (72.8777, 19.076),
    "Delhi": (77.1025, 28.7041),
    "Singapore": (103.8198, 1.3521),
    "Jakarta": (106.8456, -6.2088),
    "Tokyo": (139.6917, 35.6895),
    "Seoul": (126.978, 37.5665),
    "Beijing": (116.4074, 39.9042),
    "Shanghai": (121.4737, 31.2304),
    "Sydney": (151.2093, -33.8688),
    "Auckland": (174.7633, -36.8485),
    "Anchorage": (-149.9003, 61.2181),
    "Vancouver": (-123.1207, 49.2827),
    "Seattle": (-122.3321, 47.6062),
    "SanFrancisco": (-122.4194, 37.7749),
    "LosAngeles": (-118.2437, 34.0522),
    "Denver": (-104.9903, 39.7392),
    "Chicago": (-87.6298, 41.8781),
    "Toronto": (-79.3832, 43.6532),
    "NewYork": (-74.006, 40.7128),
    "Miami": (-80.1918, 25.7617),
    "MexicoCity": (-99.1332, 19.4326),
    "Bogota": (-74.0721, 4.711),
    "Lima": (-77.0428, -12.0464),
    "Santiago": (-70.6693, -33.4489),
    "BuenosAires": (-58.3816, -34.6037),
    "SaoPaulo": (-46.6333, -23.5505),
    "Reykjavik": (-21.8174, 64.1265),
    "Helsinki": (24.9384, 60.1699),
    "Oslo": (10.7522, 59.9139),
    "Lisbon": (-9.1393, 38.7223),
    "Athens": (23.7275, 37.9838),
    "Honolulu": (-157.8583, 21.3069),
    "Perth": (115.8605, -31.9505),
    "CapeTown": (18.4241, -33.9249),
}

# the driver documents.text vocabulary (verified against
# /root/testdata/sf*/documents.parquet), minus bare articles;
# coordinates assigned round-robin from the city list so they are
# spread across the globe and across quadtree tiles.
_VOCAB_TERMS = [
    "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "value", "vector", "window",
]

_CITY_COORDS = list(CITY_GAZETTEER.values())
VOCAB_GAZETTEER: dict[str, tuple[float, float]] = {
    t: _CITY_COORDS[i % len(_CITY_COORDS)] for i, t in enumerate(_VOCAB_TERMS)
}


def sql_values(gaz: dict[str, tuple[float, float]], alias: str = "gaz") -> str:
    """Emit a gazetteer as an ANSI-SQL inline table:
    ``(VALUES ('t', lon, lat), ...) AS alias(entity, lon, lat)``."""
    rows = ", ".join(
        f"('{t}', {lon!r}, {lat!r})" for t, (lon, lat) in sorted(gaz.items())
    )
    return f"(VALUES {rows}) AS {alias}(entity, glon, glat)"
