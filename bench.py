"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric (BASELINE.json north rule): pages/sec end-to-end
through mine -> cell encode -> PIP join -> tile aggregate over a
synthesized Common-Crawl-style pages table sized to the scale factor.
Per-operator timings for the sf-dir tables ride along in "queries".
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from osmquadtreepostgis_spark.plans.pipeline import pages_pipeline
    from osmquadtreepostgis_spark.session import get_spark
    from osmquadtreepostgis_spark.sources.pages import stage_pages_parquet

    spark = get_spark(
        "bench",
        cores=cpus,
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # --- headline: pages/sec end-to-end ------------------------------------
    # stage the input table first (the "Iceberg pages table" the north
    # rule reads from); the timed section is mine+encode+PIP+tile only
    # large enough that the timed section is throughput- (not fixed-
    # cost-) bound at 32 threads: ~2M pages at the driver's sf0.1
    n_pages = max(int(20_000_000 * sf), 10_000)
    pages_path = f"/tmp/oqps_bench_pages_{n_pages}"
    timed(
        "pages_stage",
        lambda: stage_pages_parquet(spark, n_pages, pages_path, partitions=cpus * 4),
    )
    pages_df = spark.read.parquet(pages_path)
    # warm python workers/codegen (a long-lived cluster pays this once)
    pages_pipeline(pages_df.limit(20_000)).count()
    # suite-embedded measurement: min of 3 at unconfined local[32].
    # This number is NOISE-DOMINATED on this host (documented 2-3x
    # per-core loss past ~8-16 active threads plus 1.5x run-to-run
    # jitter — BENCH/BASELINE.md; it is what regressed 1.23M->832k
    # between r2 and r3 with a strictly better plan), so it is the
    # FOOTNOTE; the artifact-of-record headline is the confined run
    # below.
    runs = []
    n_tiles = 0
    for _ in range(3):
        t0 = time.perf_counter()
        n_tiles = pages_pipeline(pages_df).count()
        runs.append(time.perf_counter() - t0)
    timings["pages_pipeline"] = round(min(runs), 3)
    pages_per_sec_unconfined = round(n_pages / min(runs), 1)

    # --- headline: taskset-confined 8-core min-of-5 ------------------------
    # Methodology (BENCH/BASELINE.md "Headline methodology"): the whole
    # process tree (JVM + python workers) pinned to 8 cores — below
    # this host's >8-thread frequency/bandwidth cliff — min of 5 runs
    # (bounds suite wall time when host stalls hit; the max-of-two-
    # settings headline absorbs a bad confined draw),
    # separate process so JVM state can't leak. Reuses the audited
    # scaling.py worker (same warmup, same job). Falls back to the
    # unconfined number if taskset is unavailable.
    headline_cores = int(os.environ.get("SPARK_GRAFT_HEADLINE_CORES", "8"))
    pages_per_sec = pages_per_sec_unconfined
    headline_confined = None
    t0 = time.perf_counter()
    try:
        import subprocess

        repo = os.path.dirname(os.path.abspath(__file__))
        env = dict(
            os.environ,
            SCALING_RUNS=os.environ.get("SPARK_GRAFT_HEADLINE_RUNS", "5"),
        )
        out = subprocess.run(
            [
                "taskset", "-c", f"0-{headline_cores - 1}",
                sys.executable, os.path.join(repo, "BENCH", "scaling.py"),
                "--worker", str(headline_cores), pages_path, str(n_pages),
            ],
            capture_output=True, text=True, check=True, cwd=repo, env=env,
        )
        line = [
            l for l in out.stdout.strip().splitlines() if l.startswith("{")
        ][-1]
        headline_confined = json.loads(line)
        # Headline = the confined-8 min-of-N, full stop (VERDICT r4
        # #8: one pinned protocol, promoted from the r4 max-of-two).
        # The unconfined local[32] reading stays recorded as the
        # footnote field below; it is the fallback headline ONLY when
        # taskset is unavailable and no confined reading exists.
        pages_per_sec = headline_confined["pages_per_sec"]
    except Exception:
        pass  # no taskset / child failure -> unconfined fallback stands
    timings["pages_confined8_min5"] = round(time.perf_counter() - t0, 3)

    # --- per-operator timings over the sf-dir tables -----------------------
    qs = entrymod.queries()
    for name in [
        "flagship_tiles",
        "mine_entities",
        "cell_encode",
        "tile_agg",
        "pip_points_in_boxes",
        "pip_shuffle_cover",
        "knn_exact",
        "knn_grid",
        "spatial_cluster",
        "hilbert_encode",
        "pyramid_counts",
        "raster_vectorize",
        "routing_extended",
        "style_spec_routing",
        "sql_surface_cells",
        "tag_pivot_residual",
        "zorder_minzoom",
        "union_roads",
        "semi_anti_join",
        "asof_events_orders",
        "pricing_summary",
        "revenue_by_nation",
        "top_orders_window",
        "events_sessionize",
        "events_window_agg",
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_clusters",
        "dedup_incremental",
        "dedup_incremental_minhash",
        "dedup_incremental_bloom",
        "robots_gate",
        "weighted_sample",
        "search_boolean",
        "line_dedup",
        "lang_rebalance",
        "split_assign",
        "sequence_pack",
        "crawl_diff",
        "raster_smooth",
        "semantic_dedup",
        "decontaminate",
        "dedup_url",
        "embed_quantize",
        "tfidf_keywords",
        "collocations",
        "multipolygon_chain",
        "synth_dedup_pairs",
        "curate_corpus",
        "curate_corpus_minhash",
        "corpus_stats",
        "hash_embeddings",
        "text_near_dup",
        "image_near_dup",
        "dedup_minhash_lsh",
        "dedup_spans",
        "cdc_dedup",
        "dedup_simhash",
        "embed_cosine_pairs",
        "embed_topk",
        "embed_topk_ivf",
        "diverse_sample",
        "knn_label_eval",
        "fuzzy_name_lookup",
        "fuzzy_name_pairs",
        "html_extract",
        "repetition_signals",
        "url_normalize",
        "domain_stats",
        "domain_cap",
        "text_analysis",
        "quality_filter",
        "pii_scrub",
        "sample_stratified",
        "multimodal_meta",
        "multimodal_frames",
        "overlay_pairs",
        "way_assembly",
        "parent_tags",
        "lowzoom_counts",
        "json_props",
        "geom_measures",
        "multipolygon_parts",
        "rollup_pricing",
        "salted_tile_agg",
        "stream_dedup_exact",
        "stream_curate",
        "stream_events_window",
        "stream_stateful_sessionize",
        "tile_clip",
        "geohash_encode",
        "passage_dedup",
        "url_blocklist",
        "linkrank",
        "anchor_extract",
        "anchor_linkrank",
        "lm_surprisal",
        "stream_url_gate",
        "recrawl_latest",
    ]:
        timed(name, lambda n=name: qs[n](spark, sf_dir).count())

    # VERDICT r4 #6: domain_stats re-run with a FULL-SIZE (~10k-rule)
    # synthetic public-suffix list — must land within noise of the
    # default-rule domain_stats entry above, proving the broadcast
    # rule join stays cheap at real-PSL size.
    def _domain_stats_psl10k() -> int:
        from pyspark.sql import functions as F

        from osmquadtreepostgis_spark.functions.urls import (
            psl_frame,
            synthetic_psl_rules,
            url_host,
            with_registered_domain,
        )

        d = entrymod._docs(spark, sf_dir)
        pages = d.select("doc_id", entrymod._psl_fixture_url().alias("url"))
        out = with_registered_domain(
            pages, "url", psl=psl_frame(spark, synthetic_psl_rules())
        )
        return (
            out.select(url_host("url").alias("host"), "registered_domain")
            .groupBy(F.col("registered_domain").alias("domain"))
            .agg(
                F.count(F.lit(1)).alias("n_pages"),
                F.countDistinct("host").alias("n_hosts"),
            )
            .count()
        )

    timed("domain_stats_psl10k", _domain_stats_psl10k)

    total = round(sum(timings.values()), 3)

    # --- host self-calibration --------------------------------------------
    # The SAME kernels as BENCH/scaling.py (_burn / _stream), run once
    # single-process, so every per-round JSON carries the host's current
    # per-core compute speed and memory-stream speed. Cross-round wall
    # comparisons must be normalized by these: a round measured on a
    # degraded/noisy host (e.g. r4->r5: compute kernel 1.33 s -> ~2 s,
    # -48 % per-core) would otherwise read as a code regression.
    def _calib_compute() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            x = 0
            for i in range(8_000_000):
                x += i * i
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    def _calib_stream() -> float:
        import numpy as np

        a = np.random.default_rng(0).integers(
            0, 255, 200_000_000, dtype=np.uint8
        )
        t0 = time.perf_counter()
        s = 0
        for _ in range(6):
            b = a.copy()
            s += int(b[::4096].sum())
        assert s >= 0
        return round(time.perf_counter() - t0, 3)

    host_calibration = {
        "compute_kernel_sec_1core_min3": _calib_compute(),
        "stream_kernel_sec_1core": _calib_stream(),
    }

    print(
        json.dumps(
            {
                "metric": "bench suite wall time (headline: pages/sec end-to-end"
                " mine+encode+PIP+tile over synthetic pages)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "n_pages": n_pages,
                "n_tiles": int(n_tiles),
                # artifact of record: taskset-confined 8-core min-of-5
                # (the single pinned protocol — BENCH/BASELINE.md
                # "Headline methodology"); unconfined32 only if no
                # taskset
                "pages_per_sec": pages_per_sec,
                "headline_confined": headline_confined,
                # footnote: unconfined local[32] min-of-3 (host-noise-
                # dominated past ~8 threads on this box)
                "pages_per_sec_unconfined32": pages_per_sec_unconfined,
                # normalize cross-round walls by these (see comment above)
                "host_calibration": host_calibration,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
