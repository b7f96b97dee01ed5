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
    import os

    work = Path(tempfile.mkdtemp(prefix="fold_ladder_"))
    try:
        src0 = str(work / "src0")
        agg0 = str(work / "agg0")
        base = spark.range(n).select(
            F.concat(F.lit("k"), F.col("id")).alias("k"),
            (F.col("id") % N_GROUPS).alias("g"),
            (F.col("id") % 97).alias("v"),
        )
        write_keyed_table(base, src0, key="k", n_buckets=64)

        t0 = time.time()
        fold_aggregate(spark, src0, agg0, "g", ("v",), n_buckets=8)
        boot = time.time() - t0

        step = max(n // N_DELTA, 1)
        delta = read_keyed_table(spark, src0).where(
            F.abs(F.xxhash64("k", F.lit(7))) % step == 0
        )
        delta = delta.select(
            "k",
            ((F.col("g") + 1) % N_GROUPS).alias("g"),  # every row moves group
            (F.col("v") + 1).alias("v"),
        )
        n_delta = delta.count()  # plan cost outside the timed regions

        out = {"rows": n, "delta_rows": n_delta, "bootstrap_sec": round(boot, 2)}
        states = {}
        # round 10: capture is write-mode-independent, so BOTH modes get a
        # capture-tier fold column; the cdc=off twin measures (a) the
        # write-time capture cost itself (upsert A/B) and (b) the
        # state-diff fallback tier the feed pays without sidecars
        for mode in ("cow", "mor"):
            for cdc in ("on", "off"):
                src = str(work / f"src_{mode}_{cdc}")
                agg = str(work / f"agg_{mode}_{cdc}")
                shutil.copytree(src0, src)
                # the agg's fold cursor names the source by ABSOLUTE PATH;
                # a copied aggregate would refuse the copied source, so
                # re-bootstrap instead (same v0 state, not timed)
                fold_aggregate(spark, src, agg, "g", ("v",), n_buckets=8)
                os.environ["SPARK_GRAFT_SINK_WRITE_MODE"] = mode
                os.environ["SPARK_GRAFT_SINK_CDC"] = cdc
                t0 = time.time()
                upsert_parquet(spark, src, delta, key="k", n_buckets=64)
                up = time.time() - t0
                os.environ.pop("SPARK_GRAFT_SINK_WRITE_MODE", None)
                os.environ.pop("SPARK_GRAFT_SINK_CDC", None)
                t0 = time.time()
                fold_aggregate(spark, src, agg, "g", ("v",), n_buckets=8)
                fold = time.time() - t0
                suffix = "" if cdc == "on" else "_nocapture"
                out[f"upsert_{mode}{suffix}_sec"] = round(up, 2)
                out[f"fold_{mode}{suffix}_sec"] = round(fold, 2)
                states[(mode, cdc)] = {
                    r["g"]: (r["cnt"], r["sum_v"])
                    for r in read_aggregate(spark, agg).collect()
                }

        # round 11: the PARTIAL-column arm — same delta keys, but the
        # upsert carries only (k, v): under MoR this appends a
        # partial-column delta (no base read, no capture sidecar), so
        # ``upsert_mor_partial_sec`` is the verdict-#1 ladder column
        # (publish cost flat in store size for a 1-column update) and
        # ``fold_mor_partial_sec`` prices the feed's partial-aware append
        # fast path — the read-time half of the trade. g is untouched, so
        # this arm verifies against its own recompute.
        src = str(work / "src_mor_partial")
        agg = str(work / "agg_mor_partial")
        shutil.copytree(src0, src)
        fold_aggregate(spark, src, agg, "g", ("v",), n_buckets=8)
        os.environ["SPARK_GRAFT_SINK_WRITE_MODE"] = "mor"
        t0 = time.time()
        upsert_parquet(spark, src, delta.select("k", "v"), key="k", n_buckets=64)
        out["upsert_mor_partial_sec"] = round(time.time() - t0, 2)
        os.environ.pop("SPARK_GRAFT_SINK_WRITE_MODE", None)
        t0 = time.time()
        fold_aggregate(spark, src, agg, "g", ("v",), n_buckets=8)
        out["fold_mor_partial_sec"] = round(time.time() - t0, 2)
        got_p = {
            r["g"]: (r["cnt"], r["sum_v"])
            for r in read_aggregate(spark, agg).collect()
        }
        want_p = {
            r["g"]: (r["cnt"], r["sum_v"])
            for r in read_keyed_table(spark, src)
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v"))
            .collect()
        }
        out["partial_state_equal"] = got_p == want_p

        agg_full = str(work / "agg_full")
        t0 = time.time()
        recomputed = (
            read_keyed_table(spark, str(work / "src_cow_on"))
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v"))
        )
        write_keyed_table(recomputed, agg_full, key="g", n_buckets=8)
        out["recompute_sec"] = round(time.time() - t0, 2)
        full = {
            r["g"]: (r["cnt"], r["sum_v"])
            for r in read_keyed_table(spark, agg_full).collect()
        }
        out["state_equal"] = all(st == full for st in states.values())
        return out
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
