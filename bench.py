"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Results are forced with a noop-format write (full computation, no collect
bottleneck on the driver)."""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES = [
    # flagship retention pipeline (reference parity)
    "retention_phase1",
    "retention_phase1_selfjoin",
    "retention_collapsed",
    "retention_phase2",
    "retention_base",
    "pack_history_stats",
    "households_without_retention",
    # beyond-reference: time-series operators
    "sessionize_events",
    "asof_purchase_view",
    # beyond-reference: training-data pipeline
    "dedup_minhash_lsh",
    "dedup_simhash",
    "doc_fingerprint",
    "knn_bruteforce",
    "media_frames",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from es_household_retention_spark_job_spark.session import get_spark

    spark = get_spark(app_name="bench", cpus=cpus, shuffle_partitions=2 * cpus)

    from es_household_retention_spark_job_spark.entry_queries import (
        EXTRA_QUERIES,
        QUERIES,
    )

    # BENCH_QUERIES is frozen for round-over-round comparability; some
    # entries live in the extra (non-driver-slot) registry
    all_queries = {**QUERIES, **EXTRA_QUERIES}
    names = [n for n in BENCH_QUERIES if n in all_queries]

    timings: dict[str, float] = {}
    for name in names:
        # measure steady-state throughput: the first (untimed) run pays
        # one-time whole-stage-codegen (Janino) compilation and Python-
        # worker startup; of the three timed runs we keep the MINIMUM — all
        # are full executions, and the min is the sustained cost with
        # transient machine noise (page-cache evictions, competing
        # processes, cgroup CPU contention) removed, so round-over-round
        # totals compare cleanly across differently-loaded machines
        force(all_queries[name](spark, sf_dir))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            force(all_queries[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
