"""As-of (temporal) join — absent in the reference and in core Spark
(SURVEY.md §2.3 notes it as a free add); the exact union+window
method: interleave both sides ordered by (key, ts, side), carry the
left row's attributes forward with ``last_value ignore nulls``, keep
right rows. One shuffle on (key), no range explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For each right row, attach the latest left row with
    left_ts <= right_ts within the same ``key``.

    left: (key, left_ts, *value_cols); right: any columns + (key,
    right_ts). Output: right columns + value_cols (null when no left
    row precedes).
    """
    l_ = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in value_cols],
        *[
            F.lit(None).cast(f.dataType).alias(f"__r_{f.name}")
            for f in right.schema.fields
        ],
    )
    r_ = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in value_cols],
        *[F.col(f.name).alias(f"__r_{f.name}") for f in right.schema.fields],
    )
    u = l_.unionByName(r_)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "__side",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
        *[F.col(f"__r_{f.name}").alias(f.name) for f in right.schema.fields],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
