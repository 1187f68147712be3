"""Tests for crawl-snapshot diff (operators/crawl.py) and box-kernel
raster smoothing (operators/pyramid.py smooth_raster)."""

from pyspark.sql import functions as F

from osmquadtreepostgis_spark.operators.crawl import crawl_diff
from osmquadtreepostgis_spark.operators.pyramid import smooth_raster
from osmquadtreepostgis_spark import quadtree as qt


def test_crawl_diff_all_statuses(spark):
    old = spark.createDataFrame(
        [("u1", "a"), ("u2", "b"), ("u3", "c")], "url string, fingerprint string"
    )
    new = spark.createDataFrame(
        [("u2", "b"), ("u3", "C2"), ("u4", "d")], "url string, fingerprint string"
    )
    got = {r["url"]: r["status"] for r in crawl_diff(old, new).collect()}
    assert got == {
        "u1": "removed",
        "u2": "unchanged",
        "u3": "changed",
        "u4": "added",
    }


def test_crawl_diff_carries_fingerprints(spark):
    old = spark.createDataFrame([("u", "x")], "url string, fingerprint string")
    new = spark.createDataFrame([("u", "y")], "url string, fingerprint string")
    r = crawl_diff(old, new).collect()[0]
    assert (r["old_fp"], r["new_fp"], r["status"]) == ("x", "y", "changed")


def _cell(spark, x, y, depth):
    # bigint casts are load-bearing: Spark's << on an INT literal uses
    # only the low 5 bits of the shift count (Java int-shift), so an
    # un-cast literal silently packs at the wrong bit position
    xs, ys = f"cast({x} as bigint)", f"cast({y} as bigint)"
    return spark.sql(f"SELECT {qt.sql_pack_xy(xs, ys, depth)} AS c").first()["c"]


def test_smooth_raster_interior_average(spark):
    # depth 3 -> 8x8 grid. A single cell at (3, 3) with value 9:
    # every cell of its 3x3 neighborhood is interior (area 9), so each
    # target gets v_smooth = 9/9 = 1.0
    depth = 3
    c = _cell(spark, 3, 3, depth)
    df = spark.createDataFrame([(c, 9)], "cell long, n long")
    out = smooth_raster(df, depth=depth, kernel=1).collect()
    assert len(out) == 9
    assert all(r["v_sum"] == 9 and r["k_area"] == 9 for r in out)
    assert all(abs(r["v_smooth"] - 1.0) < 1e-12 for r in out)
    assert {(r["tx"], r["ty"]) for r in out} == {
        (x, y) for x in (2, 3, 4) for y in (2, 3, 4)
    }


def test_smooth_raster_corner_clipping(spark):
    # value at the (0,0) corner: targets have clipped kernel areas —
    # corner 4, edges 6, interior 9
    depth = 3
    c = _cell(spark, 0, 0, depth)
    df = spark.createDataFrame([(c, 36)], "cell long, n long")
    out = {(r["tx"], r["ty"]): r for r in smooth_raster(df, depth=depth).collect()}
    assert set(out) == {(0, 0), (0, 1), (1, 0), (1, 1)}  # in-bounds only
    assert out[(0, 0)]["k_area"] == 4 and out[(0, 0)]["v_smooth"] == 9.0
    assert out[(0, 1)]["k_area"] == 6 and out[(0, 1)]["v_smooth"] == 6.0
    assert out[(1, 1)]["k_area"] == 9 and out[(1, 1)]["v_smooth"] == 4.0


def test_smooth_raster_matches_dense_reference(spark):
    # a deterministic sparse raster vs a numpy dense box filter
    import numpy as np

    depth, n_side = 4, 16
    cells = [(x, y, 1 + (x * 7 + y * 13) % 5) for x in range(0, 16, 3)
             for y in range(0, 16, 2)]
    rows = [(_cell(spark, x, y, depth), v) for x, y, v in cells]
    df = spark.createDataFrame(rows, "cell long, n long")
    got = {
        (r["tx"], r["ty"]): r["v_smooth"]
        for r in smooth_raster(df, depth=depth).collect()
    }
    dense = np.zeros((n_side, n_side))
    for x, y, v in cells:
        dense[x, y] = v
    for (tx, ty), vs in got.items():
        x0, x1 = max(tx - 1, 0), min(tx + 1, n_side - 1)
        y0, y1 = max(ty - 1, 0), min(ty + 1, n_side - 1)
        window = dense[x0 : x1 + 1, y0 : y1 + 1]
        assert abs(vs - window.sum() / window.size) < 1e-12, (tx, ty)
    # sparse semantics: zero-sum neighborhoods absent
    assert all(v > 0 for v in got.values())


def test_smooth_raster_cell_roundtrip(spark):
    # output cell key re-packs (tx, ty) at the same depth
    depth = 3
    c = _cell(spark, 5, 2, depth)
    df = spark.createDataFrame([(c, 1)], "cell long, n long")
    out = smooth_raster(df, depth=depth).collect()
    for r in out:
        assert r["cell"] == _cell(spark, r["tx"], r["ty"], depth)


def test_semantic_dedup_clusters_known_groups(spark):
    """SemDeDup composition: cosine pairs -> CC -> one survivor.
    Two tight direction-groups + one orthogonal singleton."""
    from osmquadtreepostgis_spark.operators.cluster import resolve_duplicates
    from osmquadtreepostgis_spark.operators import knn as KNN

    def unit(*v):
        s = sum(x * x for x in v) ** 0.5
        return [float(x / s) for x in v]

    rows = [
        (0, unit(1.0, 0.02, 0.0)),
        (1, unit(1.0, -0.02, 0.0)),
        (2, unit(0.98, 0.05, 0.0)),
        (10, unit(0.0, 1.0, 0.03)),
        (11, unit(0.0, 1.0, -0.03)),
        (20, unit(0.0, 0.0, 1.0)),  # orthogonal singleton
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = KNN.ann_cosine_pairs_grid(emb, threshold=0.9, block_rows=4)
    out = {
        r["vec_id"]: r
        for r in resolve_duplicates(
            emb.select("vec_id"), pairs, id_col="vec_id"
        ).collect()
    }
    assert {v["cluster_id"] for v in out.values()} == {0, 10, 20}
    assert out[0]["cluster_size"] == 3 and out[0]["keep"]
    assert not out[1]["keep"] and not out[2]["keep"]
    assert out[10]["keep"] and not out[11]["keep"]
    assert out[20]["cluster_size"] == 1 and out[20]["keep"]
