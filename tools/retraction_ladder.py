"""Retraction-cost ladder: the histogram fold's reason to exist, measured.

min/max folds are O(changes) on APPLY but a retraction that hits a stored
extremum forces a suspect-group source recompute — O(suspect groups'
source rows), growing with the table. The round-11 histogram fold has no
such fallback: a retraction decrements its bucket, so EVERY fold is
O(changes) regardless of what got deleted.

Protocol per table size N (v = id, unique; group = id % 1000, so each
group's stored minimum is the row with id == g):

  * bootstrap TWO aggregates of the same keyed source: one min/max+sum,
    one histogram (64 buckets over [0, N))
  * ONE delete batch that removes the stored MINIMUM of 500 groups — the
    adversarial shape: every deleted value marks its group suspect for
    min/max, while the histogram just decrements 500 buckets
  * timed: fold_aggregate on each; correctness cross-checked against a
    source recompute after folding

The PRIMARY metric is source rows re-read: on local[32] warm NVMe the
suspect recompute of even 30M rows sits below the ~1s host-noise floor,
so wall columns are published but the durable claim is the counted one —
the min/max retract fold issues a pinned-version SOURCE read covering
every suspect group's rows (N/2 here; multi-TB at the 100 TB scale this
engine targets), the control and histogram folds issue none, ever.

Usage: python tools/retraction_ladder.py [sizes_csv=1500000,15000000]
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from es_household_retention_spark_job_spark.session import get_spark  # noqa: E402
from es_household_retention_spark_job_spark.sinks.incremental_agg import (  # noqa: E402
    fold_aggregate,
    read_aggregate,
    read_percentiles,
)
from es_household_retention_spark_job_spark.sinks.upsert import (  # noqa: E402
    delete_keys,
    read_keyed_table,
    write_keyed_table,
)

N_GROUPS = 1000
N_SUSPECT = 500


def one_size(spark, n: int) -> dict:
    # count pinned-version source reads per fold (the suspect-recompute
    # signature: fold_aggregate only ever reads the source with version=)
    from es_household_retention_spark_job_spark.sinks import incremental_agg as IA

    reads = {"n": 0}
    real_read = IA.read_keyed_table

    def counting_read(spark_, path_, version=None, **kw):
        if version is not None:
            reads["n"] += 1
        return real_read(spark_, path_, version=version, **kw)

    IA.read_keyed_table = counting_read

    def drain():
        out = reads["n"]
        reads["n"] = 0
        return out

    work = Path(tempfile.mkdtemp(prefix="retract_ladder_"))
    try:
        src = str(work / "src")
        agg_mm = str(work / "agg_mm")
        agg_h = str(work / "agg_h")
        hi = ((n + 63) // 64) * 64
        base = spark.range(n).select(
            F.concat(F.lit("k"), F.col("id")).alias("k"),
            (F.col("id") % N_GROUPS).alias("g"),
            F.col("id").alias("v"),
        )
        write_keyed_table(base, src, key="k", n_buckets=64)
        t0 = time.monotonic()
        fold_aggregate(
            spark, src, agg_mm, "g", n_buckets=8,
            min_cols=("v",), max_cols=("v",),
        )
        boot_mm = time.monotonic() - t0
        t0 = time.monotonic()
        fold_aggregate(
            spark, src, agg_h, "g", n_buckets=8,
            hist_cols={"v": (0, hi, 64)},
        )
        boot_h = time.monotonic() - t0
        drain()  # bootstraps legitimately read the pinned source once
        # CONTROL batch first: delete 500 mid-range rows (id = g + 500k,
        # never a group extremum) — the min/max fold takes its pure
        # O(changes) path; the later extremum batch's extra wall over
        # this one IS the suspect-recompute term, isolated
        delete_keys(
            spark,
            src,
            spark.createDataFrame(
                [(f"k{g + 500 * N_GROUPS}",) for g in range(N_SUSPECT)],
                "k string",
            ),
        )
        t0 = time.monotonic()
        fold_aggregate(
            spark, src, agg_mm, "g", n_buckets=8,
            min_cols=("v",), max_cols=("v",),
        )
        fold_mm_ctl = time.monotonic() - t0
        mm_ctl_reads = drain()
        t0 = time.monotonic()
        fold_aggregate(
            spark, src, agg_h, "g", n_buckets=8,
            hist_cols={"v": (0, hi, 64)},
        )
        fold_h_ctl = time.monotonic() - t0
        h_ctl_reads = drain()
        # delete each of the first N_SUSPECT groups' stored minimum
        # (id == g): all of them retract an extremum
        delete_keys(
            spark,
            src,
            spark.createDataFrame(
                [(f"k{g}",) for g in range(N_SUSPECT)], "k string"
            ),
        )
        t0 = time.monotonic()
        fold_aggregate(
            spark, src, agg_mm, "g", n_buckets=8,
            min_cols=("v",), max_cols=("v",),
        )
        fold_mm = time.monotonic() - t0
        mm_reads = drain()
        t0 = time.monotonic()
        fold_aggregate(
            spark, src, agg_h, "g", n_buckets=8,
            hist_cols={"v": (0, hi, 64)},
        )
        fold_h = time.monotonic() - t0
        h_reads = drain()
        IA.read_keyed_table = real_read
        # correctness: folded min/max == recompute; folded p50 lower bound
        # brackets the true median for every touched group
        truth = {
            r["g"]: (r["mn"], r["mx"])
            for r in read_keyed_table(spark, src)
            .groupBy("g")
            .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
            .collect()
        }
        got = {
            r["g"]: (r["min_v"], r["max_v"])
            for r in read_aggregate(spark, agg_mm).collect()
        }
        assert got == truth, "min/max fold diverged from recompute"
        width = hi // 64
        p50 = {
            r["g"]: r["p50_v"]
            for r in read_percentiles(spark, agg_h, {"v": [(1, 2)]}).collect()
        }
        # the exact ceil(cnt/2)-th order statistic — the value the
        # histogram definition brackets (Spark's percentile() would
        # interpolate between order stats and land outside the bucket)
        med = {
            r["g"]: r["m"]
            for r in read_keyed_table(spark, src)
            .groupBy("g")
            .agg(F.sort_array(F.collect_list("v")).alias("vs"))
            .select(
                "g",
                F.element_at(
                    "vs", ((F.size("vs") + 1) / 2).cast("int")
                ).alias("m"),
            )
            .collect()
        }
        for g, lb in p50.items():
            assert lb <= med[g] < lb + width, (g, lb, med[g])
        return {
            "n_rows": n,
            "bootstrap_minmax_sec": round(boot_mm, 2),
            "bootstrap_hist_sec": round(boot_h, 2),
            "fold_minmax_control_sec": round(fold_mm_ctl, 2),
            "fold_hist_control_sec": round(fold_h_ctl, 2),
            "fold_minmax_retract_sec": round(fold_mm, 2),
            "fold_hist_retract_sec": round(fold_h, 2),
            "minmax_control_source_reads": mm_ctl_reads,
            "minmax_retract_source_reads": mm_reads,
            "hist_control_source_reads": h_ctl_reads,
            "hist_retract_source_reads": h_reads,
            "suspect_source_rows": n // 2,
            "suspect_groups": N_SUSPECT,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    sizes = [
        int(s)
        for s in (sys.argv[1] if len(sys.argv) > 1 else "1500000,15000000").split(",")
    ]
    spark = get_spark(app_name="retraction-ladder")
    out = [one_size(spark, n) for n in sizes]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
