"""Banded-MinHash vs exact inverted-index dedup CROSSOVER sweep
(VERDICT r4 #2): the same planted near-dup workload at growing corpus
size, both pair machineries, wall-clock + shuffle-write bytes per
run, under the pinned confined-8 protocol (taskset 0-7, separate
process per scale so JVM state can't leak).

The 100 TB design claim this backs with data: the exact prefix-
filtered inverted index pays an explode O(corpus x prefix) and a
pair equi-join whose cost grows superlinearly with corpus size, while
the LSH path pays one signature aggregate O(corpus) plus a band join
bounded by bucket occupancy — so band-mode advantage must GROW with
scale. Both modes must return the IDENTICAL pair count (threshold-
derived geometry, miss < 1e-6) or the comparison is void.

Usage:
    python BENCH/crossover.py                       # full sweep
    python BENCH/crossover.py --worker N PATH       # (internal)

Env: CROSSOVER_SCALES (default "20000,60000,180000"),
CROSSOVER_CORES (default 8), CROSSOVER_CURATE=0 to skip the composed
curate_corpus runs and sweep only the pair stage.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = [
    int(s) for s in os.environ.get("CROSSOVER_SCALES", "20000,60000,180000").split(",")
]
CORES = int(os.environ.get("CROSSOVER_CORES", "8"))
RUN_CURATE = os.environ.get("CROSSOVER_CURATE", "1") != "0"
RUN_EXACT = os.environ.get("CROSSOVER_EXACT", "1") != "0"
THRESHOLD = 0.5


def _shuffle_write_bytes(spark) -> int:
    """Total shuffle-write bytes of all completed stages so far, via
    the local UI REST API (diffed around each timed section)."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            stages = json.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def worker(n_docs: int, path: str) -> None:
    sys.path.insert(0, REPO)
    from osmquadtreepostgis_spark.operators.dedup import (
        minhash_verified_pairs,
        ngram_jaccard_pairs,
    )
    from osmquadtreepostgis_spark.plans.curation import curate_corpus
    from osmquadtreepostgis_spark.session import get_spark

    spark = get_spark(
        f"crossover_{n_docs}",
        cores=CORES,
        shuffle_partitions=CORES * 4,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # the UI is off in the canonical session config; the
            # sweep needs its REST API for per-section shuffle bytes
            "spark.ui.enabled": "true",
        },
    )
    docs = spark.read.parquet(path)
    # warmup: codegen + a tiny run of both shapes (a long-lived
    # cluster pays this once); excluded from measurements
    small = docs.limit(2_000).cache()
    ngram_jaccard_pairs(small, THRESHOLD).count()
    minhash_verified_pairs(small, THRESHOLD).count()
    small.unpersist()

    out: dict[str, object] = {"n_docs": n_docs, "cores": CORES}

    def timed(name: str, fn):
        s0 = _shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        res = fn()
        out[f"{name}_sec"] = round(time.perf_counter() - t0, 2)
        s1 = _shuffle_write_bytes(spark)
        out[f"{name}_shuffle_mb"] = (
            round((s1 - s0) / 1e6, 1) if s0 >= 0 and s1 >= 0 else None
        )
        return res

    if RUN_EXACT:
        out["pairs_exact"] = timed(
            "pairs_exact", lambda: ngram_jaccard_pairs(docs, THRESHOLD).count()
        )
    out["pairs_minhash"] = timed(
        "pairs_minhash", lambda: minhash_verified_pairs(docs, THRESHOLD).count()
    )
    if RUN_EXACT:
        out["pair_counts_equal"] = out["pairs_exact"] == out["pairs_minhash"]
    else:
        out["note"] = (
            "CROSSOVER_EXACT=0: band-path runtime point only (the exact "
            "baseline is quadratic-prohibitive at this scale; equality was "
            "verified at every scale it completed)"
        )
    if RUN_CURATE:
        out["curate_exact"] = timed(
            "curate_exact",
            lambda: curate_corpus(docs, pair_mode="exact").count(),
        )
        out["curate_minhash"] = timed(
            "curate_minhash",
            lambda: curate_corpus(docs, pair_mode="minhash_verified").count(),
        )
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    sys.path.insert(0, REPO)
    from osmquadtreepostgis_spark.session import get_spark
    from osmquadtreepostgis_spark.sources.corpus_synth import stage_synth_documents

    results = []
    for n in SCALES:
        path = f"/tmp/oqps_crossover_{n}"
        if not os.path.exists(path + "/_SUCCESS"):
            spark = get_spark(
                "crossover_stage",
                cores=16,
                extra_conf={"spark.ui.showConsoleProgress": "false"},
            )
            stage_synth_documents(spark, n, path, partitions=64)
            spark.stop()
        cmd = [
            "taskset", "-c", f"0-{CORES - 1}",
            sys.executable, os.path.abspath(__file__), "--worker", str(n), path,
        ]
        print(f"# scale {n} confined-{CORES} ...", file=sys.stderr)
        proc = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO, env=os.environ
        )
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        if not line:
            print(proc.stdout, proc.stderr, file=sys.stderr)
            raise SystemExit(f"worker failed at scale {n}")
        results.append(json.loads(line[-1]))
        print(json.dumps(results[-1]))
    out_name = os.environ.get("CROSSOVER_OUT", "crossover_results.json")
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
    else:
        main()
