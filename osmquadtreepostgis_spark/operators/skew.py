"""Hot-key salting (SURVEY.md §4): the reference simply eats hot-tile
skew (MakeGeometries wait ≈3,500 s on dense urban tiles,
docs/output.txt:70-74); at 1000 executors a hot tile key would pin one
reducer. Two-phase salted aggregation keeps reducers balanced while
producing exactly the unsalted result.

AQE skew-join splitting handles the JOIN side (enabled in
session.get_spark); this handles the AGGREGATION side for
sum/count-like (commutative, re-aggregable) metrics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg"]

# partial -> final re-aggregation pairs for the supported metrics
_REAGG = {
    "sum": F.sum,
    "count": F.sum,  # counts re-aggregate by summing
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salt: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """groupBy(keys).agg(...) in two phases through a salt column.

    ``aggs``: output name -> (kind, input column) with kind in
    {sum, count, min, max}. Phase 1 groups by (keys + salt) — the
    shuffle spreads each hot key over ``n_salt`` reducers; phase 2
    re-aggregates the tiny salted partials. Exactness holds because
    the metrics are commutative monoids.

    ``salt_source``: a high-cardinality column to derive the salt from
    (defaults to a uniform random-free spread via
    ``spark_partition_id + monotonically_increasing_id``, which is
    deterministic per physical plan but NOT across reruns — pass an id
    column for reproducible plans).
    """
    if salt_source is None:
        salt_source = F.spark_partition_id() + F.monotonically_increasing_id()
    salted = df.withColumn("__salt", F.pmod(F.hash(salt_source), F.lit(n_salt)))
    p1_exprs = []
    for name, (kind, col) in aggs.items():
        if kind == "count":
            p1_exprs.append(F.count(col).alias(f"__p_{name}"))
        else:
            p1_exprs.append(_REAGG[kind](col).alias(f"__p_{name}"))
    p1 = salted.groupBy(*keys, "__salt").agg(*p1_exprs)
    p2_exprs = [
        _REAGG[kind](F.col(f"__p_{name}")).alias(name)
        for name, (kind, _) in aggs.items()
    ]
    return p1.groupBy(*keys).agg(*p2_exprs)
