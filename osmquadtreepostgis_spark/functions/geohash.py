"""Geohash encoding as a third space-filling-curve key family.

The engine already carries two curve encodings of the reference's
64-bit quadtree key space (:mod:`..quadtree` Morton pack mirroring
the reference's quadtree::calculate key packing, and the z_order
style ordering of /root/reference/src/postgiswriter.cpp's planet_osm
z_order column).  Geohash is the public interchange form of the same
idea — an interleaved-bisection key rendered as base32 text — and is
what web corpora actually carry in page metadata, so a
Common-Crawl-scale pipeline wants to emit/join on it directly.

Re-derivation from the public spec (NOT a copy): precision ``p``
chars = ``5*p`` bits alternating longitude-first; each 5-bit group
indexes the base32 alphabet ``0123456789bcdefghjkmnpqrstuvwxyz``.
The bisection bits of a coordinate are exactly the top bits of the
scaled integer ``floor((lon+180)/360 * 2^k)``, so the whole encode is
integer bit math — no trig, no Python.

Parity strategy: ONE set of generators emits SQL expression text that
is valid in BOTH Spark SQL and DuckDB; the Spark Columns are built
from the identical strings via ``F.expr`` (pure Catalyst, inside
whole-stage codegen) and the oracle runs the same text.  floor→bigint
casts, 64-bit shifts and 1-based substring behave identically, so the
outputs are byte-identical by construction.

Like :func:`..quadtree.sql_tile_xy`, the generators are staged for
CTE use so each subexpression is written once:

    loni/lati (scaled ints)  ->  key (interleave)  ->  chars (base32)

Scale: embarrassingly parallel projection — no shuffle, no UDF; at
10^12 rows this is a codegen'd map over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "GEOHASH_BASE32",
    "sql_geohash_scaled",
    "sql_geohash_key",
    "sql_geohash_chars",
    "with_geohash",
]

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bit_split(precision: int) -> tuple[int, int, int]:
    if not 1 <= precision <= 12:
        raise ValueError("geohash precision must be in [1, 12]")
    nbits = 5 * precision
    return nbits, (nbits + 1) // 2, nbits // 2  # total, lon bits, lat bits


def sql_geohash_scaled(lon: str, lat: str, precision: int = 8) -> tuple[str, str]:
    """(lon_scaled, lat_scaled) SQL expressions: the top-k bisection
    bits of each coordinate as an integer, clamped so +180/+90 land in
    the last cell instead of one past it."""
    _, nlon, nlat = _bit_split(precision)
    lon_i = (
        f"least(cast(floor((({lon}) + 180.0) / 360.0 * {1 << nlon}.0) as bigint),"
        f" {(1 << nlon) - 1})"
    )
    lat_i = (
        f"least(cast(floor((({lat}) + 90.0) / 180.0 * {1 << nlat}.0) as bigint),"
        f" {(1 << nlat) - 1})"
    )
    return lon_i, lat_i


def sql_geohash_key(lon_scaled: str, lat_scaled: str, precision: int = 8) -> str:
    """Interleave the scaled ints into the 5*precision-bit geohash key
    (longitude owns the first/MSB bit, per the public spec).  Feed the
    COLUMN NAMES produced from :func:`sql_geohash_scaled` here so the
    scaled ints are evaluated once."""
    nbits, nlon, nlat = _bit_split(precision)
    terms = []
    for b in range(nbits):  # b = 0 is the MSB of the key
        if b % 2 == 0:
            src, k = lon_scaled, nlon - 1 - b // 2
        else:
            src, k = lat_scaled, nlat - 1 - b // 2
        terms.append(f"(((({src}) >> {k}) & 1) << {nbits - 1 - b})")
    return "(" + " | ".join(terms) + ")"


def sql_geohash_chars(key: str, precision: int = 8) -> str:
    """Render a geohash key column as its base32 string."""
    nbits, _, _ = _bit_split(precision)
    chars = [
        f"substring('{GEOHASH_BASE32}',"
        f" cast(((({key}) >> {nbits - 5 * (j + 1)}) & 31) as int) + 1, 1)"
        for j in range(precision)
    ]
    return "(" + " || ".join(chars) + ")"


def with_geohash(df, lon: str, lat: str, precision: int = 8):
    """Staged pure-Column encode: adds ``gh_key`` (packed int) and
    ``geohash`` (base32 string) to ``df``.  Built from the same
    generators as the DuckDB twin, so the engines agree
    byte-for-byte; each stage is one withColumn so the scaled ints
    are named (evaluated once under codegen CSE)."""
    lon_i, lat_i = sql_geohash_scaled(lon, lat, precision)
    return (
        df.withColumn("__gh_loni", F.expr(lon_i))
        .withColumn("__gh_lati", F.expr(lat_i))
        .withColumn(
            "gh_key", F.expr(sql_geohash_key("__gh_loni", "__gh_lati", precision))
        )
        .withColumn("geohash", F.expr(sql_geohash_chars("gh_key", precision)))
        .drop("__gh_loni", "__gh_lati")
    )
