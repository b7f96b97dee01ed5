"""Flagship-retention per-stage rehearsal at an arbitrary scale factor —
the sf10 answer to SCALING.md's "retention's largest ladder is sf1":
times each registered retention stage (forced with a noop write, warm
pass then timed pass — the repo-wide gen_scaling protocol) so a
super-linear step is attributable to a STAGE, not just a total. Pair
with tools/incremental_rehearsal.py (backfill vs CDC totals + state
equality) and tools/gen_sf1_skew.py (mega-household injection) at the
same sf_dir.

Usage: python tools/flagship_rehearsal.py [sf_dir ...]
Prints markdown rows for SCALING.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

STAGES = [
    "retention_phase1",
    "retention_collapsed",
    "retention_phase2",
    "retention_base",
    "pack_history_stats",
    "households_without_retention",
]

SFS = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10skew"]


def main() -> None:
    from es_household_retention_spark_job_spark.entry_queries import (
        EXTRA_QUERIES,
        QUERIES,
    )
    from es_household_retention_spark_job_spark.session import get_spark

    spark = get_spark(
        app_name="flagship-rehearsal", cpus=32, shuffle_partitions=64
    )
    all_q = {**QUERIES, **EXTRA_QUERIES}

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, float]] = {}
    for sf_dir in SFS:
        cells = {}
        for name in STAGES:
            fn = all_q[name]
            force(fn(spark, sf_dir))  # warm
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            cells[name] = time.perf_counter() - t0
        results[sf_dir] = cells

    print("| stage | " + " | ".join(SFS) + " |")
    print("|---|" + "---|" * len(SFS))
    for name in STAGES:
        print(
            f"| {name} | "
            + " | ".join(f"{results[d][name]:.2f}s" for d in SFS)
            + " |"
        )


if __name__ == "__main__":
    main()
