"""Feature-hashing document embeddings (functions/embed.py)."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.functions.embed import (
    hash_embedding,
    sql_hash_embedding,
)

pytestmark = pytest.mark.usefixtures("spark")

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "spam spam spam spam eggs",
    "completely different vocabulary entirely",
    "the quick brown fox jumps over the lazy cat",
    "",
]


def _spark_vecs(spark, dim=16):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    return {
        r["doc_id"]: list(r["e"])
        for r in df.select(
            "doc_id", hash_embedding("text", dim).alias("e")
        ).collect()
    }


def test_unit_norm_and_dim(spark):
    vecs = _spark_vecs(spark)
    for i, v in vecs.items():
        assert len(v) == 16
        n = math.sqrt(sum(x * x for x in v))
        assert n == pytest.approx(1.0, abs=1e-9)  # every doc has >=1 token


def test_similar_docs_cosine_higher(spark):
    vecs = _spark_vecs(spark)

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    near = cos(vecs[0], vecs[3])   # one word differs
    far = cos(vecs[0], vecs[2])    # disjoint vocabulary
    assert near > far
    assert near > 0.7


def test_duckdb_twin_parity(spark):
    svecs = _spark_vecs(spark, dim=16)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(TEXTS)))
    for did, vec in con.execute(
        f"SELECT doc_id, {sql_hash_embedding('text', 16)} FROM t"
    ).fetchall():
        got = [round(float(x), 9) for x in vec]
        want = [round(x, 9) for x in svecs[did]]
        assert got == want, did


def test_frame_variant_bit_identical_to_column(spark):
    """hash_embeddings_frame (Arrow hot path) must equal the Column
    variant bit-for-bit — ±1 integer sums are exact in float64, so
    accumulation order cannot introduce drift."""
    from osmquadtreepostgis_spark.functions.embed import hash_embeddings_frame

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    col = {
        r["doc_id"]: list(r["e"])
        for r in docs.select(
            "doc_id", hash_embedding("text", 64).alias("e")
        ).collect()
    }
    arr = {
        r["doc_id"]: list(r["embedding"])
        for r in hash_embeddings_frame(docs, dim=64).collect()
    }
    assert col.keys() == arr.keys()
    for k in col:
        assert col[k] == arr[k], k  # exact, not approx


def test_frame_variant_null_text_matches_column(spark):
    """NULL text embeds to NULL in BOTH variants (ADVICE r3: the hot
    path used to crash on NaN from .str.split)."""
    from osmquadtreepostgis_spark.functions.embed import hash_embeddings_frame

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, ""), (4, None)],
        "doc_id bigint, text string",
    )
    col = {
        r["doc_id"]: None if r["e"] is None else list(r["e"])
        for r in docs.select(
            "doc_id", hash_embedding("text", 16).alias("e")
        ).collect()
    }
    arr = {
        r["doc_id"]: None
        if r["embedding"] is None
        else list(r["embedding"])
        for r in hash_embeddings_frame(docs, dim=16).collect()
    }
    assert col == arr
    assert col[2] is None and col[4] is None
    assert col[1] is not None and col[3] is not None


def test_hyperplane_buckets_group_similar_vectors(spark):
    """Within-bucket mean cosine exceeds the global mean cosine —
    the property that makes per-bucket caps a DIVERSITY sample —
    and the bucket ids match the DuckDB twin bit-for-bit."""
    import duckdb
    import numpy as np

    from osmquadtreepostgis_spark.functions.embed import (
        hyperplane_bucket,
        sql_hyperplane_bucket,
    )

    sf = "/root/testdata/sf0.001"
    rows = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", "embedding", hyperplane_bucket("embedding").alias("b")
    ).collect()
    got = {r["vec_id"]: r["b"] for r in rows}
    con = duckdb.connect()
    want = dict(
        con.sql(
            f"SELECT vec_id, {sql_hyperplane_bucket('embedding')} "
            f"FROM read_parquet('{sf}/embeddings.parquet')"
        ).fetchall()
    )
    assert got == want
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    S = V @ V.T
    b = np.array([r["b"] for r in rows])
    same = b[:, None] == b[None, :]
    np.fill_diagonal(same, False)
    off = ~np.eye(len(V), dtype=bool)
    within = S[same].mean()
    global_mean = S[off].mean()
    assert same.any()
    assert within > global_mean + 0.05, (within, global_mean)


def test_hyperplane_bucket_null_and_dim_guard(spark):
    """NULL embedding -> NULL bucket in BOTH engines (hash_embeddings
    emits NULL for null text; composing must not abort or silently
    collapse into bucket 0 — ADVICE r4); a non-null wrong-dim array
    raises in BOTH engines."""
    import duckdb

    from osmquadtreepostgis_spark.functions.embed import (
        hyperplane_bucket,
        sql_hyperplane_bucket,
    )

    ok = [0.5] * 64
    df = spark.createDataFrame(
        [(1, ok), (2, None)], "id long, embedding array<float>"
    )
    got = {
        r["id"]: r["b"]
        for r in df.select("id", hyperplane_bucket("embedding").alias("b")).collect()
    }
    assert got[2] is None
    assert got[1] is not None
    con = duckdb.connect()
    expr = sql_hyperplane_bucket("embedding")
    want = dict(
        con.sql(
            "SELECT id, " + expr + " FROM (VALUES "
            "(1, [" + ",".join(["0.5"] * 64) + "]), "
            "(2, NULL)) t(id, embedding)"
        ).fetchall()
    )
    assert want[2] is None
    assert want[1] == got[1]
    # wrong-dim: both engines raise, neither returns bucket 0
    bad = spark.createDataFrame([(3, [1.0, 2.0])], "id long, embedding array<float>")
    with pytest.raises(Exception, match="expected dim=64, got 2"):
        bad.select(hyperplane_bucket("embedding")).collect()
    with pytest.raises(Exception, match="expected dim=64, got 2"):
        con.sql("SELECT " + expr + " FROM (VALUES ([1.0, 2.0])) t(embedding)").fetchall()


def test_diverse_sample_degenerate_single_bucket_skew(spark):
    """Adversarial diversity-sampling input (VERDICT r4 #7): EVERY
    embedding identical -> all rows share one hyperplane bucket. The
    per-bucket cap must still return the exact top-n (== unsalted
    reference) with the degenerate bucket split across salt
    sub-groups, not one task."""
    from pyspark.sql import Window

    from osmquadtreepostgis_spark.functions.embed import hyperplane_bucket
    from osmquadtreepostgis_spark.operators.corpus import cap_per_key

    vec = [0.25] * 64
    df = spark.createDataFrame(
        [(i, vec, float((i * 13) % 101)) for i in range(1000)],
        "vec_id long, embedding array<float>, quality double",
    )
    b = df.select("vec_id", "quality", hyperplane_bucket("embedding").alias("bucket"))
    assert b.select("bucket").distinct().count() == 1
    order = [(-F.col("quality")).alias("nq"), F.col("vec_id").alias("i")]
    got = {
        r["vec_id"]: r["rank"]
        for r in cap_per_key(b, "bucket", order, n=10, salt_buckets=16).collect()
    }
    w = Window.partitionBy("bucket").orderBy(
        F.col("quality").desc(), F.col("vec_id").asc()
    )
    want = {
        r["vec_id"]: r["rank"]
        for r in b.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .collect()
    }
    assert got == want and len(got) == 10
    ordk = F.struct((-F.col("quality")).alias("nq"), F.col("vec_id").alias("i"))
    salts = b.select(F.pmod(F.xxhash64(ordk), F.lit(16)).alias("s")).distinct().count()
    assert salts >= 12, salts


def test_quantize_int8_edges_and_cross_engine(spark):
    """int8 quantization edge semantics agree across engines: NULL
    embedding -> NULL, all-zero vector -> all zeros (never inf/NaN
    from the amax division), values clamped by construction to
    [-127, 127] with at least one component hitting ±127 for any
    non-zero vector, and round-half-away ties identical in Spark and
    DuckDB (the testdata oracle never exercises these edges)."""
    import duckdb

    from osmquadtreepostgis_spark.functions.embed import (
        quantize_embedding_int8,
        sql_quantize_embedding_int8,
    )

    rows = [
        (1, [1.0, -2.0, 0.5, 4.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, None),
        # tie case: 0.5 * 127 / 127 = 0.5 exactly -> rounds away to 1
        (4, [127.0, 0.5, -0.5, -127.0]),
    ]
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    got = {
        r["id"]: r["q"]
        for r in df.select(
            "id", quantize_embedding_int8("embedding").alias("q")
        ).collect()
    }
    assert got[3] is None
    assert got[2] == [0, 0, 0, 0]
    assert max(abs(v) for v in got[1]) == 127
    assert got[4][0] == 127 and got[4][3] == -127
    assert got[4][1] == 1 and got[4][2] == -1  # half-away ties

    con = duckdb.connect()
    expr = sql_quantize_embedding_int8("embedding")
    want = dict(
        con.sql(
            "SELECT id, " + expr + " FROM (VALUES "
            "(1, [1.0, -2.0, 0.5, 4.0]::FLOAT[]), "
            "(2, [0.0, 0.0, 0.0, 0.0]::FLOAT[]), "
            "(3, NULL::FLOAT[]), "
            "(4, [127.0, 0.5, -0.5, -127.0]::FLOAT[])) t(id, embedding)"
        ).fetchall()
    )
    for k in (1, 2, 4):
        assert list(want[k]) == got[k], (k, want[k], got[k])
    assert want[3] is None
