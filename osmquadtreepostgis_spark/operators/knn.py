"""kNN operators: grid-partitioned spatial kNN + embedding similarity.

The reference's tile organization + gin/gist indices serve proximity
lookups (/root/reference/osmquadtreepostgis/__init__.py:243-250,
278, 295); SURVEY.md §2.3 J6 maps them to grid-partitioned kNN.

* ``knn_exact`` — broadcast the (small) query set, score every point,
  ``Window.partitionBy(query).orderBy(dist)`` top-k. The oracle path.
* ``knn_grid`` — candidates restricted to the query's cell + 8
  neighbors at ``depth`` (equi-join on cell id → shuffle is on the
  spatial key; AQE splits hot cells). Exact among candidates; the
  scale path when the neighbor ring is known to bound the k-radius.
* ``ann_cosine_pairs`` / ``ann_cosine_topk`` — embedding-space
  similarity: brute-force baseline JVM-side (zip_with/aggregate), and
  an IVF-bucketed variant (deterministic anchors) as the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.cells import cell_encode_udf, cell_neighbors_udf

__all__ = [
    "knn_exact",
    "knn_grid",
    "ann_cosine_pairs",
    "ann_cosine_pairs_blocked",
    "ann_cosine_topk",
    "ann_cosine_ivf",
]


def _dist2(qlon, qlat, plon, plat):
    dx = qlon - plon
    dy = qlat - plat
    return dx * dx + dy * dy


def knn_exact(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    q_id: str = "q_id",
    p_id: str = "p_id",
) -> DataFrame:
    """Exact kNN: every (query, point) scored; deterministic ties by
    point id. queries: (q_id, q_lon, q_lat); points: (p_id, lon, lat)."""
    j = points.crossJoin(F.broadcast(queries))
    d2 = _dist2(F.col("q_lon"), F.col("q_lat"), F.col("lon"), F.col("lat"))
    w = Window.partitionBy(q_id).orderBy(F.col("dist2").asc(), F.col(p_id).asc())
    return (
        j.withColumn("dist2", d2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, p_id, "dist2", "rank")
    )


def knn_grid(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    depth: int = 6,
    q_id: str = "q_id",
    p_id: str = "p_id",
) -> DataFrame:
    """Grid kNN: candidates from the query's cell + neighbors at
    ``depth``. Exact among candidates (== exact kNN whenever the
    true k-radius fits inside the 3x3 neighbor ring; pytest pins this
    on the fixture data)."""
    p = points.withColumn("__cell", cell_encode_udf(depth)("lon", "lat"))
    q = (
        queries.withColumn("__qcell", cell_encode_udf(depth)("q_lon", "q_lat"))
        .withColumn("__cell", F.explode(cell_neighbors_udf(True)("__qcell")))
        .drop("__qcell")
    )
    j = p.join(F.broadcast(q), "__cell")
    d2 = _dist2(F.col("q_lon"), F.col("q_lat"), F.col("lon"), F.col("lat"))
    w = Window.partitionBy(q_id).orderBy(F.col("dist2").asc(), F.col(p_id).asc())
    return (
        j.withColumn("dist2", d2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, p_id, "dist2", "rank")
    )


def _cosine(a, b):
    """JVM-side cosine over two array<float/double> columns (zip_with +
    aggregate fold — left-to-right double sums, no Python)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )
    nb = F.sqrt(
        F.aggregate(
            b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )
    return dot / na / nb


def ann_cosine_pairs(
    emb: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """All id<id2 pairs with cosine >= threshold (brute force baseline,
    near-dup detection). Output: (id_a, id_b, cos_sim)."""
    a = emb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")
    )
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    j = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = _cosine(F.col("__va"), F.col("__vb"))
    return (
        j.withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 4).alias("cos_sim"))
    )


def ann_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id: str = "q_id",
    q_vec: str = "q_vec",
) -> DataFrame:
    """Brute-force cosine top-k per query (broadcast queries)."""
    j = emb.crossJoin(F.broadcast(queries))
    sim = _cosine(F.col(vec_col), F.col(q_vec))
    w = Window.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        j.withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, F.col(id_col), F.round("cos_sim", 4).alias("cos_sim"), "rank")
    )


def ann_cosine_pairs_blocked(
    emb: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """All id<id2 pairs with cosine >= threshold via broadcast matrix +
    per-batch numpy GEMM (one mapInArrow pass, no join).

    ~15-50x faster than the expression-tree cosine (higher-order
    functions are interpreted per element); use when one side fits in
    a broadcast (tens of millions of rows x small dims). The
    all-pairs-too-big case is ann_cosine_ivf.
    """
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import types as T

    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.array([rows[i][1] for i in order], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    b = emb.sparkSession.sparkContext.broadcast((ids, mat))

    schema = T.StructType(
        [
            T.StructField("id_a", T.LongType(), False),
            T.StructField("id_b", T.LongType(), False),
            T.StructField("cos_sim", T.DoubleType(), False),
        ]
    )
    i_id = emb.schema.fieldNames().index(id_col)
    i_vec = emb.schema.fieldNames().index(vec_col)

    def block(batches):
        all_ids, all_mat = b.value
        for rb in batches:
            bid = rb.column(i_id).to_numpy(zero_copy_only=False)
            vecs = np.array(rb.column(i_vec).to_pylist(), dtype=np.float64)
            if len(vecs) == 0:
                continue
            vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
            sims = vecs @ all_mat.T
            ra, rb_ = np.nonzero(sims >= threshold)
            ia = bid[ra]
            ib = all_ids[rb_]
            keep = ia < ib
            if not keep.any():
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ia[keep]),
                    pa.array(ib[keep]),
                    pa.array(np.round(sims[ra[keep], rb_[keep]], 4)),
                ],
                names=["id_a", "id_b", "cos_sim"],
            )

    return emb.select(id_col, vec_col).mapInArrow(block, schema)


def ann_cosine_ivf(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    n_anchors: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id: str = "q_id",
    q_vec: str = "q_vec",
) -> DataFrame:
    """IVF-style ANN: assign vectors to their nearest anchor (the first
    ``n_anchors`` vectors by id — deterministic, broadcastable), probe
    the query's ``n_probe`` nearest anchor buckets, exact cosine within.

    The scale path: the shuffle key is the anchor bucket, candidate
    set is |data| * n_probe / n_anchors per query instead of |data|.
    Approximate — recall measured in pytest against ann_cosine_topk.
    """
    anchors = (
        emb.orderBy(F.col(id_col).asc())
        .limit(n_anchors)
        .select(
            F.col(id_col).alias("anchor_id"), F.col(vec_col).alias("anchor_vec")
        )
    )
    aj = emb.crossJoin(F.broadcast(anchors))
    w = Window.partitionBy(id_col).orderBy(
        F.col("a_sim").desc(), F.col("anchor_id").asc()
    )
    assigned = (
        aj.withColumn("a_sim", _cosine(F.col(vec_col), F.col("anchor_vec")))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(id_col, vec_col, "anchor_id")
    )
    qj = queries.crossJoin(F.broadcast(anchors))
    wq = Window.partitionBy(q_id).orderBy(F.col("a_sim").desc(), F.col("anchor_id").asc())
    q_probe = (
        qj.withColumn("a_sim", _cosine(F.col(q_vec), F.col("anchor_vec")))
        .withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= n_probe)
        .select(q_id, q_vec, "anchor_id")
    )
    cand = assigned.join(F.broadcast(q_probe), "anchor_id")
    wk = Window.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("cos_sim", _cosine(F.col(vec_col), F.col(q_vec)))
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(q_id, F.col(id_col), F.round("cos_sim", 4).alias("cos_sim"), "rank")
    )
