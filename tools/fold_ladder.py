"""Scale ladder for the incremental-aggregate fold: fold cost must track
the CHANGE BATCH, not the table. Protocol per table size N:

  * keyed source table of N rows (64 buckets), 1000 groups
  * bootstrap the count+sum aggregate (timed: the one full scan the
    incremental path ever pays)
  * one CDC upsert of ~10k hash-scattered keys, EVERY delta row moving
    group (the worst retract/apply shape: two group rows touched per key)
  * timed: ``fold_aggregate`` (change-feed read + fold + agg upsert)
  * timed: the non-incremental alternative — full groupBy recompute of the
    source written to a fresh aggregate table

Expected: recompute grows ~linearly with N; the fold stays flat (its
inputs are the changed buckets' delta window + |groups| point lookups).

Usage: python tools/fold_ladder.py [sizes_csv=1500000,15000000] [out.json]
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
)
from es_household_retention_spark_job_spark.sinks.upsert import (  # noqa: E402
    read_keyed_table,
    upsert_parquet,
    write_keyed_table,
)

N_GROUPS = 1000
N_DELTA = 10_000


def one_size(spark, n: int) -> dict:
    work = Path(tempfile.mkdtemp(prefix="fold_ladder_"))
    try:
        src = str(work / "src")
        agg = str(work / "agg")
        agg_full = str(work / "agg_full")
        base = spark.range(n).select(
            F.concat(F.lit("k"), F.col("id")).alias("k"),
            (F.col("id") % N_GROUPS).alias("g"),
            (F.col("id") % 97).alias("v"),
        )
        write_keyed_table(base, src, key="k", n_buckets=64)

        t0 = time.time()
        fold_aggregate(spark, src, agg, "g", ("v",), n_buckets=8)
        boot = time.time() - t0

        step = max(n // N_DELTA, 1)
        delta = read_keyed_table(spark, src).where(
            F.abs(F.xxhash64("k", F.lit(7))) % step == 0
        )
        delta = delta.select(
            "k",
            ((F.col("g") + 1) % N_GROUPS).alias("g"),  # every row moves group
            (F.col("v") + 1).alias("v"),
        )
        n_delta = delta.count()  # plan cost outside the timed regions
        upsert_parquet(spark, src, delta, key="k", n_buckets=64)

        t0 = time.time()
        fold_aggregate(spark, src, agg, "g", ("v",), n_buckets=8)
        fold = time.time() - t0

        t0 = time.time()
        recomputed = (
            read_keyed_table(spark, src)
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v"))
        )
        write_keyed_table(recomputed, agg_full, key="g", n_buckets=8)
        recompute = time.time() - t0

        folded = {
            r["g"]: (r["cnt"], r["sum_v"])
            for r in read_aggregate(spark, agg).collect()
        }
        full = {
            r["g"]: (r["cnt"], r["sum_v"])
            for r in read_keyed_table(spark, agg_full).collect()
        }
        return {
            "rows": n,
            "delta_rows": n_delta,
            "bootstrap_sec": round(boot, 2),
            "fold_sec": round(fold, 2),
            "recompute_sec": round(recompute, 2),
            "state_equal": folded == full,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    sizes = [
        int(s)
        for s in (sys.argv[1] if len(sys.argv) > 1 else "1500000,15000000").split(",")
    ]
    spark = get_spark(app_name="fold-ladder", cpus=32, shuffle_partitions=64)
    out = [one_size(spark, n) for n in sizes]
    print(json.dumps(out))
    if len(sys.argv) > 2:
        Path(sys.argv[2]).write_text(json.dumps(out))


if __name__ == "__main__":
    main()
