"""Planted-near-dup synthetic corpus (sources/corpus_synth.py): the
scale fixture behind the banded-vs-exact crossover evidence. Pins
(1) partition-invariance / determinism, (2) the planted Jaccard
geometry — light dups pair with their parent at t=0.5, heavy dups
never do, (3) exact inverted-index and threshold-derived MinHash-LSH
find the IDENTICAL pair set on this corpus (the crossover measures
the same answer computed two ways, or it measures nothing)."""

import numpy as np

from osmquadtreepostgis_spark.operators.dedup import (
    minhash_verified_pairs,
    ngram_jaccard_pairs,
)
from osmquadtreepostgis_spark.sources.corpus_synth import (
    synth_documents,
    synth_dup_truth,
)


def test_synth_documents_partition_invariant(spark):
    a = synth_documents(spark, 2_000, partitions=2).orderBy("doc_id").collect()
    b = synth_documents(spark, 2_000, partitions=7).orderBy("doc_id").collect()
    assert a == b
    assert len(a) == 2_000
    # schema matches the testdata documents table
    assert [f.name for f in synth_documents(spark, 10).schema] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]
    r = a[0]
    assert r["n_chars"] == len(r["text"])


def test_synth_documents_base_prefix_scale_invariant(spark):
    """Base docs are pure functions of their index: the same doc_id
    yields the same text at every corpus size (what lets a crossover
    sweep claim 'same workload, larger n')."""
    small = {
        r["doc_id"]: r["text"]
        for r in synth_documents(spark, 400, dup_frac=0.25).collect()
        if r["source"] == "synth_base"
    }
    big = {
        r["doc_id"]: r["text"]
        for r in synth_documents(spark, 4_000, dup_frac=0.25)
        .filter("doc_id < 300")
        .collect()
    }
    for i, t in small.items():
        if i < 300:
            assert big[i] == t


def _jaccard(a: str, b: str, n: int = 3) -> float:
    def sh(t):
        w = t.split(" ")
        return {tuple(w[i : i + n]) for i in range(len(w) - n + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_planted_jaccard_geometry(spark):
    """Light dup ≈ 0.7+ Jaccard vs parent; heavy ≈ 0.15 — the planted
    separation around t=0.5 the generator's docstring promises."""
    docs = {r["doc_id"]: r["text"] for r in synth_documents(spark, 1_000).collect()}
    truth = synth_dup_truth(1_000)
    lights = truth[truth["light"]]
    heavies = truth[~truth["light"]]
    jl = np.array(
        [_jaccard(docs[d], docs[p]) for d, p in zip(lights["dup_id"], lights["parent_id"])]
    )
    jh = np.array(
        [_jaccard(docs[d], docs[p]) for d, p in zip(heavies["dup_id"], heavies["parent_id"])]
    )
    assert jl.min() > 0.6, jl.min()
    assert jh.max() < 0.35, jh.max()


def test_exact_and_minhash_agree_on_synth_corpus(spark):
    """ngram_jaccard_pairs == minhash_verified_pairs (threshold-derived
    geometry) on the planted corpus, and both recall every light
    dup-parent pair while excluding every heavy one."""
    docs = synth_documents(spark, 1_200, partitions=4)
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, 0.5).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_verified_pairs(docs, 0.5).collect()
    }
    assert exact == lsh
    truth = synth_dup_truth(1_200)
    for _, row in truth.iterrows():
        pair = (
            min(row["dup_id"], row["parent_id"]),
            max(row["dup_id"], row["parent_id"]),
        )
        if row["light"]:
            assert pair in exact, pair
        else:
            assert pair not in exact, pair


def test_lsh_recall_tracks_band_theory(spark):
    """With a DELIBERATELY small geometry (8 hashes / 4 bands, r=2)
    per-pair recall at Jaccard J is 1-(1-J^2)^4 ≈ 0.96 at the planted
    J≈0.74 — so a few true pairs MUST be missed (geometry sensitivity
    is real) while overall recall stays near theory. The broken
    pre-r5 permutation family made agreement all-or-nothing per
    cluster, failing both sides of this envelope. Deterministic:
    fixed hash family, fixed corpus."""
    from osmquadtreepostgis_spark.operators.dedup import (
        minhash_verified_pairs,
        ngram_jaccard_pairs,
    )

    docs = synth_documents(spark, 2_000, partitions=4)
    exact = {
        (r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(docs, 0.5).collect()
    }
    small = {
        (r["id_a"], r["id_b"])
        for r in minhash_verified_pairs(
            docs, 0.5, n_hashes=8, bands=4
        ).collect()
    }
    assert small <= exact  # verification keeps precision exact
    recall = len(small) / len(exact)
    # theory at J~0.74-0.84: 0.958-0.993 per pair; envelope leaves
    # room for the planted J spread and finite-sample variation
    assert 0.85 <= recall < 1.0, (recall, len(exact), len(small))
