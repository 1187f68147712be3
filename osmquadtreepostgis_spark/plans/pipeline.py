"""The flagship end-to-end pipeline: mine → encode → PIP → tile-assign.

This is the engine's ``write_to_postgis`` analog (reference lifecycle
at /root/reference/osmquadtreepostgis/__init__.py:465-516, SURVEY.md
§3.1), re-shaped for web pages: geo-entities mined from text play the
role of OSM elements; cell encode replaces the oqt quadtree
assignment; the broadcast PIP join replaces query-time gist lookups;
the tile groupBy is the block/tile organization.

Scale notes (the 100 TB plan):
* mining + encoding are narrow (no shuffle);
* the PIP join is broadcast (zero shuffle on the page side);
* the single shuffle is the final groupBy on ``tile`` — a
  range-friendly int64 spatial key, AQE-coalesced;
* ``doc_coords`` synthesis is pure int64 Column math (exactly
  mirrored in oracle SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.mine import mine_coordinate_mentions, mine_gazetteer_terms
from ..operators.pip import PolygonIndex, encode_pip_tile
from ..sources import fixtures

CELL_DEPTH = 18
TILE_DEPTH = 8

__all__ = [
    "doc_coords",
    "sql_doc_coords",
    "load_table",
    "fanout_small_scan",
    "documents_pipeline",
    "pages_pipeline",
    "run_pages_checkpointed",
    "CELL_DEPTH",
    "TILE_DEPTH",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fanout_small_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a scan whose split count is below the
    session's parallelism.

    A parquet file is splittable only at row-group boundaries, so a
    single-row-group table scans as ONE task no matter what
    ``maxPartitionBytes`` says — and every narrow operation fused into
    that scan (shingling, regex mining, embedding math) runs on one
    core while the rest of the machine idles (guide §2.5 "input skew:
    one huge unsplittable file — repartition immediately after the
    read"). The repartition is scale-adaptive, not a tuned constant:
    at 100 TB the table has thousands of splits, the condition is
    false, and this is a no-op; it fires exactly in the
    small-file/local case where the exchange it adds is a few MB.
    Column pruning pushes below the added exchange, so count-style
    queries shuffle only the columns they read."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def doc_coords(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic coordinates from the id — integer math
    only, identical in Spark and the DuckDB oracle (FIXTURES.md §6)."""
    h1 = (F.col(id_col) * F.lit(1103515245) + F.lit(12345)) % F.lit(2147483648)
    h2 = (h1 * F.lit(69069) + F.lit(1)) % F.lit(2147483648)
    return df.withColumn("lon", (h1 % 360000000) / 1e6 - 180.0).withColumn(
        "lat", (h2 % 170000000) / 1e6 - 85.0
    )


def sql_doc_coords(id_col: str = "doc_id") -> tuple[str, str]:
    """The oracle-SQL twin of doc_coords -> (lon_expr, lat_expr)."""
    h1 = f"(({id_col} * 1103515245 + 12345) % 2147483648)"
    h2 = f"(({h1} * 69069 + 1) % 2147483648)"
    return (
        f"(({h1} % 360000000) / 1e6 - 180.0)",
        f"(({h2} % 170000000) / 1e6 - 85.0)",
    )


def documents_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship over the driver's documents table: mine gazetteer
    entities from text → cell encode (pandas UDF, depth 18) → tile
    (JVM bit math, depth 8) → broadcast PIP join against the polygon
    layer → per-tile aggregate.

    Output: (tile, poly_id, n_mentions, n_docs, n_entities) sorted.
    """
    # fan the single-row-group scan out before the regex mining — the
    # expensive narrow stage otherwise runs as one task (see
    # fanout_small_scan; no-op on a many-split production table)
    docs = fanout_small_scan(load_table(spark, sf_dir, "documents"))
    mentions = mine_gazetteer_terms(docs)  # doc_id, entity, lon, lat, n_occurrences
    # running progress counters (the reference's 4-counter progress
    # line, docs/output.txt:16,69) — read via df.observe listeners
    mentions = mentions.observe(
        "mine_metrics",
        F.count(F.lit(1)).alias("n_mentions"),
        F.sum("n_occurrences").alias("n_occurrences"),
    )
    index = PolygonIndex.from_polygons_df(fixtures.polygons_df(spark), depth=6)
    hits = encode_pip_tile(mentions, index, CELL_DEPTH, TILE_DEPTH)
    return (
        hits.groupBy("tile", "poly_id")
        .agg(
            F.sum("n_occurrences").alias("n_mentions"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.countDistinct("entity").alias("n_entities"),
        )
        .orderBy("tile", "poly_id")
    )


def run_pages_checkpointed(
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = 64,
    resume: bool = True,
) -> dict:
    """The resumable production entry point (BASELINE.json mandate —
    the reference's single 6-hour transaction has no resume,
    src/postgiswriter.cpp:1256): run the flagship pipeline and write
    per-tile-bucket outputs + lineage via CheckpointedWriter. A killed
    run re-invoked with resume=True anti-joins completed buckets and
    only computes the remainder. Returns the writer's stats dict."""
    from .checkpoint import CheckpointedWriter

    tiles = pages_pipeline(pages)
    w = CheckpointedWriter(out_dir, n_buckets=n_buckets, bucket_key="tile")
    return w.write(tiles, resume=resume)


def pages_pipeline(
    pages: DataFrame, index: PolygonIndex | None = None
) -> DataFrame:
    """The same flagship over a Common-Crawl-style pages table
    (url, warc_ts, html, text, lang) — the bench workload.

    Regex-mines explicit coordinate mentions, encodes, PIP-joins,
    tile-aggregates. The per-row invariant: ``text`` is only read.
    """
    from ..functions.cells import cell_encode_col
    from ..operators.pip import pip_probe_arrow

    spark = pages.sparkSession
    if index is None:
        index = PolygonIndex.from_polygons_df(fixtures.polygons_df(spark), depth=6)
    mentions = mine_coordinate_mentions(pages)
    # pre-hash url AND entity JVM-side BEFORE the fused Python stage:
    # the downstream aggregate only needs them for
    # approx_count_distinct, which hashes anyway — two int64s through
    # Arrow instead of a ~50-byte url + ~15-byte entity shrink the
    # Python-stage traffic (the pipeline's dominant memory-bandwidth
    # consumer at high core counts) to 4 fixed-width columns
    mentions = mentions.select(
        F.xxhash64("url").alias("url_h"),
        F.xxhash64("entity").alias("entity_h"),
        "lon",
        "lat",
    )
    # the one Python stage does the PIP ray-cast ONLY (probe cells at
    # the index depth, computed and discarded inside the stage); the
    # tile key is encoded JVM-side afterwards — point_to_cell(lon, lat,
    # TILE_DEPTH) equals cell_parent(point_to_cell(lon, lat, 18), 8)
    # exactly by the Morton prefix property, so no depth-18 encode or
    # cell/tile int64s cross the Arrow boundary at all (VERDICT r2
    # next-round #2: Python stage = PIP only)
    hits = pip_probe_arrow(mentions, index).withColumn(
        "tile", cell_encode_col("lon", "lat", TILE_DEPTH)
    )
    # approx_count_distinct (HLL): map-side-combinable sketch state —
    # exact countDistinct over billions of hit rows would expand the
    # aggregate state to the full url set per (tile, poly) and
    # dominate the job (measured: 4x data -> >>4x time); the oracle-
    # checked documents_pipeline keeps exact distincts at small scale
    return hits.groupBy("tile", "poly_id").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.approx_count_distinct("url_h").alias("n_pages_approx"),
        F.approx_count_distinct("entity_h").alias("n_entities_approx"),
    )
