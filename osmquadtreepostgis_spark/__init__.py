"""osmquadtreepostgis_spark — a from-scratch PySpark-native spatial-join
and tiling engine with the query/data-processing capabilities of the
reference ``jharris2268/osmquadtreepostgis`` (see /root/repo/SURVEY.md),
re-targeted at Common-Crawl-style web-page tables at 10^12-doc scale.

Subpackages:
    quadtree    64-bit quadtree cell keys (numpy kernels + SQL codegen)
    geom        mercator / WKB / measures / PIP / simplify numpy kernels
    functions   Spark column + pandas-UDF surface (cells, tags, text, sketches)
    operators   routing, PIP/cover joins, kNN, dedup, pyramid
    sources     catalog, pages synthesis, sinks
    plans       end-to-end pipelines, checkpoint/lineage, specs
    streaming   structured-streaming variants
"""

__version__ = "0.1.0"
