"""Streaming operators: windowed agg == batch twin; stateful
sessionization == batch sessionization."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.streaming.stream import (
    run_stream_to_completion,
    stream_events_windowed,
    stream_sessionize_stateful,
)

SF = "/root/testdata/sf0.001"


def _batch_sessions(spark):
    from pyspark.sql import Window

    e = spark.read.parquet(f"{SF}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        e.withColumn("s", new_s)
        .groupBy("user_id")
        .agg(F.sum("s").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


def test_stream_window_equals_batch(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    got = run_stream_to_completion(
        stream_events_windowed(spark, SF), "t_stream_w"
    ).toPandas()
    e = spark.read.parquet(f"{SF}/events.parquet")
    want = (
        e.groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.unix_timestamp("w.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .toPandas()
    )
    g = got.sort_values(["win_start", "event_type"], ignore_index=True)
    w = want.sort_values(["win_start", "event_type"], ignore_index=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_stateful_sessionize_equals_batch(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    got = run_stream_to_completion(
        stream_sessionize_stateful(spark, SF), "t_sess"
    ).toPandas()
    # update-mode memory sink keeps the latest row per key
    got = (
        got.sort_values("n_events")
        .groupby("user_id", as_index=False)
        .last()
        .sort_values("user_id", ignore_index=True)
    )
    want = _batch_sessions(spark).toPandas().sort_values("user_id", ignore_index=True)
    pd.testing.assert_frame_equal(
        got[["user_id", "n_sessions", "n_events"]],
        want[["user_id", "n_sessions", "n_events"]],
        check_dtype=False,
    )


def test_stream_pages_flagship_equals_batch_and_resumes(spark, tmp_path):
    """The streaming flagship over 3 page files equals the batch
    flagship on the same pages, and a re-run over the same input
    (fresh call, same checkpoint) appends NOTHING new (exactly-once
    per batch = streaming resume)."""
    import glob

    from pyspark.sql import functions as F

    from osmquadtreepostgis_spark.plans.pipeline import pages_pipeline
    from osmquadtreepostgis_spark.sources.pages import pages
    from osmquadtreepostgis_spark.streaming.stream import stream_pages_flagship

    src_dir = str(tmp_path / "pages_in")
    # three files -> three micro-batches at maxFilesPerTrigger=1
    pages(spark, 30_000, partitions=3).write.parquet(src_dir)
    assert len(glob.glob(src_dir + "/part-*.parquet")) == 3

    out = str(tmp_path / "stream_out")
    got = stream_pages_flagship(spark, src_dir, out)
    want = (
        pages_pipeline(spark.read.parquet(src_dir))
        .select("tile", "poly_id", "n_mentions")
    )
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w and len(g) > 0
    n_batches = (
        spark.read.parquet(out + "/partials").select("batch_id").distinct().count()
    )
    assert n_batches == 3

    # resume: same source + checkpoint -> no new partials, same rollup
    got2 = stream_pages_flagship(spark, src_dir, out)
    assert sorted(map(tuple, got2.collect())) == g
    n_files = len(glob.glob(out + "/partials/batch_id=*/part-*.parquet"))
    assert n_files > 0
    got3 = stream_pages_flagship(spark, src_dir, out)
    assert len(glob.glob(out + "/partials/batch_id=*/part-*.parquet")) == n_files

    # crash-replay idempotency (ADVICE r2 #1): drop the LAST batch's
    # checkpoint commit record — the data was written but the commit
    # wasn't, exactly the at-least-once window. The restarted stream
    # REPLAYS that batch; dynamic partition overwrite must rewrite its
    # batch_id partition, not append a second copy of the partials.
    import os

    cdir = out + "/_stream_checkpoint/commits"
    commits = sorted(f for f in os.listdir(cdir) if not f.startswith("."))
    os.remove(cdir + "/" + commits[-1])
    crc = cdir + "/." + commits[-1] + ".crc"
    if os.path.exists(crc):  # local-fs CRC sidecar; a real crash leaves neither
        os.remove(crc)
    got4 = stream_pages_flagship(spark, src_dir, out)
    assert sorted(map(tuple, got4.collect())) == g


def test_stream_curate_equals_batch_composition(spark):
    """stream_curate (stateless rules + stateful exact dedup) over
    bounded input equals the same composition run as one batch query —
    order-independent state makes the answer schedule-invariant."""
    from pyspark.sql import functions as F

    from osmquadtreepostgis_spark.functions.repetition import (
        dup_ngram_frac,
        top_ngram_frac,
    )
    from osmquadtreepostgis_spark.functions.text import fingerprint128
    from osmquadtreepostgis_spark.streaming.stream import (
        run_stream_to_completion,
        stream_curate,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: r["n_dupes"]
        for r in run_stream_to_completion(
            stream_curate(spark, sf), name="t_stream_curate"
        ).collect()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    nw = F.size(toks).cast("long")
    tc = F.length(F.regexp_replace("text", " ", ""))
    sym = F.length(F.regexp_replace("text", r"[A-Za-z0-9 ]", ""))
    keep = (
        (nw >= 20)
        & (tc / F.greatest(nw, F.lit(1)) <= 12.0)
        & (tc / F.greatest(nw, F.lit(1)) >= 2.0)
        & (sym / F.greatest(tc, F.lit(1)) <= 0.3)
        & (top_ngram_frac("text", 2) <= 0.13)
        & (dup_ngram_frac("text", 2) <= 0.065)
    )
    lo, hi = fingerprint128("text")
    want = {
        r["doc_id"]: r["n_dupes"]
        for r in docs.filter(keep)
        .groupBy(lo.alias("l"), hi.alias("h"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            (F.count(F.lit(1)) - 1).alias("n_dupes"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_read_rollup_as_of_snapshots(spark, tmp_path):
    """Time-travel over the batch_id-partitioned partials: as-of the
    last batch == current rollup; as-of earlier batches is exactly the
    rollup of those batches' partials; counts grow monotonically; the
    batch_id predicate PRUNES later batches' files from the scan."""
    import glob

    from pyspark.sql import functions as F

    from osmquadtreepostgis_spark.sources.pages import pages
    from osmquadtreepostgis_spark.streaming.stream import (
        read_rollup_as_of,
        stream_pages_flagship,
    )

    src_dir = str(tmp_path / "p_in")
    pages(spark, 30_000, partitions=3).write.parquet(src_dir)
    out = str(tmp_path / "p_out")
    full = stream_pages_flagship(spark, src_dir, out)
    n_batches = (
        spark.read.parquet(out + "/partials").select("batch_id").distinct().count()
    )
    assert n_batches == 3
    cur = sorted(map(tuple, full.collect()))
    asof_last = sorted(map(tuple, read_rollup_as_of(spark, out, n_batches - 1).collect()))
    assert asof_last == cur
    # exactness vs the partials themselves + monotone growth
    prev_total = 0
    for b in range(n_batches):
        want = sorted(
            map(
                tuple,
                spark.read.parquet(out + "/partials")
                .filter(F.col("batch_id") <= b)
                .groupBy("tile", "poly_id")
                .agg(F.sum("n_mentions").cast("long").alias("n_mentions"))
                .collect(),
            )
        )
        got_df = read_rollup_as_of(spark, out, b)
        got = sorted(map(tuple, got_df.collect()))
        assert got == want
        total = sum(r[2] for r in got)
        assert total >= prev_total
        prev_total = total
    # partition pruning: as-of batch 0 must read fewer files than all
    def files_read(d):
        qe = d._jdf.queryExecution()
        p = qe.executedPlan()
        p.execute().count()
        return p.collectLeaves().head().metrics().apply("numFiles").value()

    n0 = files_read(spark.read.parquet(out + "/partials").filter(F.col("batch_id") <= 0))
    nall = files_read(spark.read.parquet(out + "/partials"))
    assert n0 < nall, (n0, nall)


def test_stream_kill_mid_batch_then_restart_is_exactly_once(spark, tmp_path):
    """Chaos test (VERDICT r4 #4): the query is KILLED from inside the
    batch function after the partials write but before the checkpoint
    commit — the real crash window, not a post-hoc commit-file edit.
    The restarted stream must replay that batch, dynamic-partition-
    OVERWRITE its partials (not append a second copy), finish the
    remaining batches, and produce exactly the batch flagship's
    rollup."""
    import glob

    from osmquadtreepostgis_spark.plans.pipeline import pages_pipeline
    from osmquadtreepostgis_spark.sources.pages import pages
    from osmquadtreepostgis_spark.streaming.stream import stream_pages_flagship

    src_dir = str(tmp_path / "pages_in")
    pages(spark, 30_000, partitions=3).write.parquet(src_dir)
    out = str(tmp_path / "stream_out")

    killed = []

    def bomb(batch_id: int) -> None:
        if batch_id == 1 and not killed:
            killed.append(batch_id)
            raise RuntimeError("chaos: killed after write, before commit")

    with pytest.raises(Exception, match="chaos"):
        stream_pages_flagship(spark, src_dir, out, on_batch_complete=bomb)
    assert killed == [1]
    # the crash left batch 1's data on disk with NO commit record
    import os

    written = {
        int(p.split("batch_id=")[1])
        for p in glob.glob(out + "/partials/batch_id=*")
    }
    assert 1 in written
    commits = {
        int(f)
        for f in os.listdir(out + "/_stream_checkpoint/commits")
        if not f.startswith(".")
    }
    assert 1 not in commits and 0 in commits

    got = stream_pages_flagship(spark, src_dir, out)
    want = pages_pipeline(spark.read.parquet(src_dir)).select(
        "tile", "poly_id", "n_mentions"
    )
    g = sorted(map(tuple, got.collect()))
    assert g == sorted(map(tuple, want.collect())) and len(g) > 0
    n_batches = (
        spark.read.parquet(out + "/partials").select("batch_id").distinct().count()
    )
    assert n_batches == 3


def test_stream_url_gate_equals_batch(spark):
    """Stream-static join gate over the bounded file stream equals the
    batch blocklist audit rolled up per domain (schedule-invariant
    aggregates)."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F
    from osmquadtreepostgis_spark.operators.blocklist import audit_blocklist

    sf = "/root/testdata/sf0.001"
    got = sorted(
        map(tuple, e.queries()["stream_url_gate"](spark, sf).collect())
    )
    d = (
        e._docs(spark, sf)
        .select("doc_id")
        .withColumn("url", e._blocklist_url())
    )
    rules = (
        spark.range(37)
        .filter(F.col("id") % 4 == 0)
        .select(
            F.concat(
                F.lit("example"), F.col("id").cast("string"), F.lit(".org")
            ).alias("domain")
        )
    )
    batch = (
        audit_blocklist(d, rules, e._BL_PATH_KEYWORDS, url_col="url")
        .withColumn("blocked", ~F.col("kept"))
        .groupBy("domain")
        .agg(
            F.sum(F.col("blocked").cast("long")).alias("n_blocked"),
            F.sum((~F.col("blocked")).cast("long")).alias("n_kept"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )
    want = sorted(map(tuple, batch.collect()))
    assert got == want
