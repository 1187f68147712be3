"""Bipartite set-Jaccard join + incremental dedup (dedup_against)."""

import itertools

import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.operators.dedup import (
    dedup_against,
    ngram_jaccard_pairs,
    set_jaccard_join,
)

pytestmark = pytest.mark.usefixtures("spark")


def _brute(pa, pb, t):
    out = []
    for ia, sa in pa:
        for ib, sb in pb:
            A, B = set(sa), set(sb)
            if not A or not B:
                continue
            j = len(A & B) / len(A | B)
            if j >= t:
                out.append((ia, ib, round(j, 4)))
    return sorted(out)


def _sets_df(spark, rows):
    return spark.createDataFrame(
        [(i, sorted(set(s))) for i, s in rows], "id long, __sh array<string>"
    )


def test_bipartite_join_matches_brute_force(spark):
    words = [f"w{k}" for k in range(30)]
    probe = [
        (i, [words[(i * 3 + k) % 30] for k in range(8)]) for i in range(12)
    ]
    index = [
        (100 + i, [words[(i * 2 + k) % 30] for k in range(8 + i % 3)])
        for i in range(15)
    ]
    for t in (0.4, 0.6, 0.9):
        got = sorted(
            (r["id_p"], r["id_x"], r["jaccard"])
            for r in set_jaccard_join(
                _sets_df(spark, probe), _sets_df(spark, index), t
            ).collect()
        )
        want = _brute(
            [(i, set(s)) for i, s in probe],
            [(i, set(s)) for i, s in index],
            t,
        )
        assert got == want, f"threshold {t}"


def test_dedup_against_vs_self_join_cross_pairs(spark):
    """dedup_against must flag exactly the new docs that appear in a
    cross-side pair of the full self-join at the same threshold."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    seen = docs.filter(F.col("doc_id") < 250)
    new = docs.filter(F.col("doc_id") >= 250)
    out = {
        r["doc_id"]: (r["n_seen_dups"], r["keep"])
        for r in dedup_against(new, seen, threshold=0.5, n=3).collect()
    }
    # reference: cross pairs of the (oracle-checked) self-join
    cross = {}
    for r in ngram_jaccard_pairs(docs, threshold=0.5, n=3).collect():
        a, b = r["id_a"], r["id_b"]
        if a < 250 <= b:
            cross[b] = cross.get(b, 0) + 1
        elif b < 250 <= a:
            cross[a] = cross.get(a, 0) + 1
    assert len(out) == new.count()
    flagged = {d for d, (n, k) in out.items() if not k}
    assert flagged == set(cross)
    for d, n in cross.items():
        assert out[d][0] == n
    assert any(not k for _, k in out.values())  # non-vacuous fixture


def test_minhash_verified_mode_matches_exact(spark):
    """dedup_against(mode='minhash_verified', 32 hashes/16 bands)
    equals the exact bipartite join on the fixture (weakest true pair
    J=0.8889 -> LSH miss probability ~1.4e-11), and unknown modes
    raise."""
    import pytest
    from pyspark.sql import functions as F

    from osmquadtreepostgis_spark.operators.dedup import dedup_against

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = docs.filter(F.col("doc_id") >= 250)
    seen = docs.filter(F.col("doc_id") < 250)
    a = sorted(map(tuple, dedup_against(new, seen, 0.5, 3).collect()))
    b = sorted(
        map(
            tuple,
            dedup_against(
                new, seen, 0.5, 3,
                mode="minhash_verified", n_hashes=32, bands=16,
            ).collect(),
        )
    )
    assert a == b and len(a) == 250
    with pytest.raises(ValueError, match="mode"):
        dedup_against(new, seen, 0.5, 3, mode="nope")
