"""Tests for the round-5 corpus-mixing additions: line-level
boilerplate removal (operators/lines.py), temperature language
rebalancing, leakage-safe split assignment, and chop-concat sequence
packing (operators/corpus.py)."""

import math

import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.operators.corpus import (
    assign_splits,
    pack_chop_concat,
    rebalance_languages,
)
from osmquadtreepostgis_spark.operators.lines import strip_boilerplate_lines


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_strip_boilerplate_basic(spark):
    rows = [
        (1, "a", "unique one\nNAV BAR\nbody 1"),
        (2, "a", "NAV BAR\nbody 2"),
        (3, "a", "body 3\nNAV BAR"),
        (4, "a", "no chrome here"),
    ]
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate_lines(_docs(spark, rows), min_docs=3).collect()
    }
    assert out[1]["text"] == "unique one\nbody 1"
    assert out[1]["n_kept"] == 2 and out[1]["n_dropped"] == 1
    assert out[2]["text"] == "body 2"
    assert out[3]["text"] == "body 3"
    assert out[4]["text"] == "no chrome here" and out[4]["n_dropped"] == 0


def test_strip_boilerplate_scope_and_trim(spark):
    # same line in a DIFFERENT source does not count toward the
    # min_docs threshold; trimming normalizes the count key but the
    # kept text is byte-original
    rows = [
        (1, "a", "  padded  \nx1"),
        (2, "a", "padded\nx2"),
        (3, "b", "padded\nx3"),
        (4, "b", "other\nx4"),
    ]
    out = {
        r["doc_id"]: r["text"]
        for r in strip_boilerplate_lines(_docs(spark, rows), min_docs=2).collect()
    }
    # 'padded' appears in 2 distinct docs of source a (trimmed match)
    assert out[1] == "x1" and out[2] == "x2"
    # source b has it only once -> kept, original bytes
    assert out[3] == "padded\nx3"


def test_strip_boilerplate_all_boiler_and_blanks(spark):
    rows = [
        (1, "a", "same"),
        (2, "a", "same"),
        (3, "a", "same"),
        (4, "a", "keep\n\nme"),  # blank line preserved
        (5, "a", "keep\n\nme2"),
    ]
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate_lines(_docs(spark, rows), min_docs=3).collect()
    }
    assert out[1]["text"] == "" and out[1]["n_kept"] == 0
    assert len(out) == 5  # row count invariant
    assert out[4]["text"] == "keep\n\nme"  # blanks never boilerplate


def test_rebalance_languages_boosts_tail(spark):
    # 9000 head docs, 1000 tail docs; alpha=0.5 should keep the tail
    # at ~3x the head's rate (sqrt reweighting: 3000:1000 vs 9000:1000)
    rows = [(i, "head" if i < 9000 else "tail") for i in range(10_000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = rebalance_languages(df, alpha=0.5, target_rate=0.5).collect()
    n_head = sum(1 for r in kept if r["lang"] == "head")
    n_tail = sum(1 for r in kept if r["lang"] == "tail")
    # expected: Z = sqrt(9000)+sqrt(1000); q_head = sqrt(9000)/Z.
    # the tail's unclamped rate is 1.25 -> min(1, .) keeps ALL of it
    z = math.sqrt(9000) + math.sqrt(1000)
    exp_head = math.sqrt(9000) / z * 0.5 * 10_000
    assert abs(n_head - exp_head) < 4 * math.sqrt(exp_head)
    assert n_tail == 1000
    # tail keep RATE ~2.4x head keep rate (clamp caps the 3x sqrt boost)
    assert (n_tail / 1000) > 2.0 * (n_head / 9000)
    # deterministic across invocations
    again = rebalance_languages(df, alpha=0.5, target_rate=0.5).collect()
    assert sorted(r["doc_id"] for r in kept) == sorted(r["doc_id"] for r in again)


def test_rebalance_alpha_one_is_uniform(spark):
    # alpha=1 reduces to a plain target_rate coin for every language
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    thr = (
        rebalance_languages(df, alpha=1.0, target_rate=0.25)
        .select("lang", "keep_ppb")
        .distinct()
        .collect()
    )
    assert {r["keep_ppb"] for r in thr} == {250_000_000}


def test_assign_splits_coassigns_duplicates(spark):
    rows = [(i, "a", f"text {i % 10}") for i in range(200)]
    out = assign_splits(_docs(spark, rows)).collect()
    assert len(out) == 200
    by_text = {}
    texts = {i: f"text {i % 10}" for i in range(200)}
    for r in out:
        by_text.setdefault(texts[r["doc_id"]], set()).add(r["split"])
    # byte-identical docs always share one split: no test-set leakage
    assert all(len(s) == 1 for s in by_text.values())
    assert {r["split"] for r in out} <= {"train", "val", "test"}
    with pytest.raises(ValueError):
        assign_splits(_docs(spark, rows), train_mille=900, val_mille=800)


def test_assign_splits_fractions(spark):
    rows = [(i, "a", f"doc body number {i}") for i in range(3000)]
    out = assign_splits(_docs(spark, rows)).collect()
    frac = {
        s: sum(1 for r in out if r["split"] == s) / 3000
        for s in ("train", "val", "test")
    }
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02


def test_pack_chop_concat_matches_pandas_reference(spark):
    rows = [(i, 1 + (i * 37) % 700) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["shard"], r["pack_id"], r["pack_offset"])
        for r in pack_chop_concat(df, context_len=512, n_shards=8).collect()
    }
    # pandas reference: per shard, cumsum-before in id order
    shards = {}
    for i, n in rows:
        shards.setdefault(got[i][0], []).append((i, n))
    for sh, docs in shards.items():
        cum = 0
        for i, n in sorted(docs):
            assert got[i] == (sh, sh * (1 << 40) + cum // 512, cum % 512)
            cum += n
    # zero padding waste: offsets are the exact running token stream
    assert len(got) == 500


def test_pack_chop_concat_long_doc_spans_windows(spark):
    # a doc longer than the context simply spans windows — its
    # SUCCESSOR starts at the correct post-chop offset
    df = spark.createDataFrame(
        [(1, 100), (2, 2000), (3, 50)], "doc_id long, n_tokens long"
    )
    out = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_chop_concat(df, context_len=512, n_shards=1).collect()
    }
    assert out[1] == (0, 0)
    assert out[2] == (0, 100)
    # doc 3 starts at stream offset 2100 -> pack 4, offset 2100-4*512=52
    assert out[3] == (2100 // 512, 2100 % 512)


def test_strip_boilerplate_identity_when_threshold_unreachable(spark):
    """Invariant: with min_docs > corpus size nothing is boilerplate,
    so reassembly must return every document byte-identically —
    including messy whitespace, empty lines, and trailing newlines."""
    texts = [
        "plain",
        "two\nlines",
        "trailing newline\n",
        "\nleading blank",
        "a\n\n\nb",
        "  spaces  \n\tand tabs\t",
        "",
        "dup\ndup\ndup",  # intra-doc repeats don't cross the doc count
    ]
    rows = [(i, "s", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate_lines(df, min_docs=len(texts) + 1).collect()
    }
    for i, t in enumerate(texts):
        assert out[i]["text"] == t, (i, repr(t), repr(out[i]["text"]))
        assert out[i]["n_dropped"] == 0


def test_pack_chop_concat_conservation(spark):
    """Invariants: every offset < context_len; per shard the token
    stream is gapless (cumsum reconstruction equals per-doc offsets);
    pack ids within a shard are a contiguous range from shard<<40."""
    rows = [(i, 1 + (i * 131) % 1000) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    ctx = 300
    out = pack_chop_concat(df, context_len=ctx, n_shards=4).collect()
    assert all(0 <= r["pack_offset"] < ctx for r in out)
    toks = dict(rows)
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    total_packs = 0
    for sh, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rs:
            assert r["pack_id"] == (sh << 40) + cum // ctx
            assert r["pack_offset"] == cum % ctx
            cum += toks[r["doc_id"]]
        n_packs = (cum + ctx - 1) // ctx
        pack_ids = {r["pack_id"] - (sh << 40) for r in rs}
        # every pack id is in range; first pack present
        assert max(pack_ids) <= n_packs - 1 and 0 in pack_ids
        total_packs += n_packs
    assert len(out) == 400
