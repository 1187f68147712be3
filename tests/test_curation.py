"""End-to-end curation composition (plans/curation.py)."""

import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.plans.curation import curate_corpus

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def audit(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return curate_corpus(
        docs.filter(F.col("doc_id") >= 100),
        seen=docs.filter(F.col("doc_id") < 100),
    ).toPandas()


def test_one_row_per_doc_and_conjunction(audit):
    assert len(audit) == 400
    assert audit.doc_id.is_unique
    want = (
        audit.keep_quality
        & audit.keep_repetition
        & audit.keep_not_seen
        & audit.keep_canonical
    )
    assert (audit.keep == want).all()


def test_stage_monotonicity(audit):
    """A doc failing an earlier stage never passes a later one (later
    verdicts are false for docs the stage never saw)."""
    early_fail = ~(audit.keep_quality & audit.keep_repetition)
    assert not audit.loc[early_fail, "keep_not_seen"].any()
    assert not audit.loc[~audit.keep_not_seen, "keep_canonical"].any()


def test_every_stage_non_vacuous(audit):
    assert (~audit.keep_quality).sum() > 0
    assert (~audit.keep_repetition).sum() > 0
    surv1 = audit.keep_quality & audit.keep_repetition
    assert (surv1 & ~audit.keep_not_seen).sum() > 0
    assert (audit.keep_not_seen & ~audit.keep_canonical).sum() > 0
    assert audit.keep.sum() > 0


def test_curated_corpus_exports_to_jsonl(spark, tmp_path):
    """The produce-training-data path end-to-end: curate -> keep ->
    sharded gzip JSONL -> read back."""
    import glob

    from osmquadtreepostgis_spark.sources.sinks import write_jsonl_gz

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    audit = curate_corpus(
        docs.filter(F.col("doc_id") >= 100),
        seen=docs.filter(F.col("doc_id") < 100),
    )
    kept = audit.filter("keep").join(docs, "doc_id").select("doc_id", "text")
    out = str(tmp_path / "train")
    write_jsonl_gz(kept, out, num_shards=2)
    assert len(glob.glob(f"{out}/part-*.json.gz")) == 2
    back = spark.read.json(out)
    assert back.count() == kept.count() > 0


def test_minhash_verified_mode_matches_exact_on_fixture(spark, audit):
    """pair_mode='minhash_verified' (band-shuffle candidates + exact
    Jaccard verification) equals the exact mode on the fixture — LSH
    recalls every >=0.5 pair here, and verification makes precision
    exact by construction."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mh = curate_corpus(
        docs.filter(F.col("doc_id") >= 100),
        seen=docs.filter(F.col("doc_id") < 100),
        pair_mode="minhash_verified",
    ).toPandas()
    a = audit.sort_values("doc_id", ignore_index=True)
    b = mh.sort_values("doc_id", ignore_index=True)
    assert a.equals(b)


def test_unknown_pair_mode_raises(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError, match="pair_mode"):
        curate_corpus(docs, pair_mode="nope").collect()


def test_minhash_verified_pairs_subset_of_exact(spark):
    """minhash_verified_pairs returns a SUBSET of ngram_jaccard_pairs
    with identical jaccard values on the shared pairs (verification
    gives exact precision; only recall is probabilistic)."""
    from osmquadtreepostgis_spark.operators.dedup import (
        minhash_verified_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    mh = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_verified_pairs(docs, threshold=0.5).collect()
    }
    assert mh  # non-vacuous
    for k, v in mh.items():
        assert k in exact and exact[k] == v, k
