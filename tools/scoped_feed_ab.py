"""Column-scoped feed A/B (round 11): measure what `read_changes(columns=)`
buys on a WIDE source — the regime the fold ladder's narrow (k, g, v)
source cannot show. Source rows carry a ~128-byte pad column (the stand-in
for a retention store's nested history, which dominates row bytes); one
partial-column MoR publish updates `v` for ~10k scattered keys; the feed
over that window is read twice:

* unscoped — full Delta-CDF rows: the inherent preimage scan reads every
  column, pad included;
* scoped to (g, v) — what `fold_aggregate` requests automatically: the
  projection reaches the parquet scans, so the same preimage scan reads
  only the three narrow columns.

Prints one JSON line with both times, the byte evidence (ReadSchema of
each plan must exclude/include `pad`), and a row-count equality check
(the scoped feed reports the same changed keys — the window's only
changes are in `v`). Usage:

    python tools/scoped_feed_ab.py [rows=20000000]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from es_household_retention_spark_job_spark import plans as P  # noqa: E402
from es_household_retention_spark_job_spark.session import get_spark  # noqa: E402
from es_household_retention_spark_job_spark.sinks.upsert import (  # noqa: E402
    current_version,
    read_changes,
    upsert_parquet,
    write_keyed_table,
)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark(app_name="scoped-feed-ab", cpus=32, shuffle_partitions=64)
    work = Path(tempfile.mkdtemp(prefix="scoped_feed_"))
    try:
        src = str(work / "src")
        base = spark.range(n).select(
            F.concat(F.lit("k"), F.col("id")).alias("k"),
            (F.col("id") % 1000).alias("g"),
            (F.col("id") % 97).alias("v"),
            F.sha2(F.col("id").cast("string"), 512).alias("pad"),
        )
        write_keyed_table(base, src, key="k", n_buckets=64)
        v0 = current_version(src)
        step = max(n // 10_000, 1)
        delta = (
            spark.range(0, n, step)
            .select(
                F.concat(F.lit("k"), F.col("id")).alias("k"),
                (F.col("id") % 97 + 1).alias("v"),
            )
        )
        os.environ["SPARK_GRAFT_SINK_WRITE_MODE"] = "mor"
        upsert_parquet(spark, src, delta, key="k", n_buckets=64)
        os.environ.pop("SPARK_GRAFT_SINK_WRITE_MODE", None)

        unscoped = read_changes(spark, src, v0)
        scoped = read_changes(spark, src, v0, columns=["g", "v"])
        # plan evidence first (no execution): the pad column must be gone
        # from every scan of the scoped plan and present in the unscoped
        pad_pruned = "pad" not in P.read_schema(scoped)
        pad_read = "pad" in P.read_schema(unscoped)

        def timed(df):
            force(df)  # warm (page cache, codegen)
            t0 = time.perf_counter()
            force(df)
            return round(time.perf_counter() - t0, 2)

        t_un = timed(unscoped)
        t_sc = timed(scoped)

        # COLD arm (r12): drop the page cache before each run so the read
        # pays for its bytes — the regime where the pruned pad column
        # must show up as wall clock, not just ReadSchema
        from _cold import drop_page_cache

        def timed_cold(df):
            if not drop_page_cache():
                return None
            t0 = time.perf_counter()
            force(df)
            return round(time.perf_counter() - t0, 2)

        t_un_cold = timed_cold(unscoped)
        t_sc_cold = timed_cold(scoped)
        keys_un = unscoped.select("k").distinct().count()
        keys_sc = scoped.select("k").distinct().count()
        print(
            json.dumps(
                {
                    "rows": n,
                    "delta_rows": delta.count(),
                    "unscoped_sec": t_un,
                    "scoped_sec": t_sc,
                    "speedup": round(t_un / t_sc, 2) if t_sc else None,
                    "unscoped_cold_sec": t_un_cold,
                    "scoped_cold_sec": t_sc_cold,
                    "cold_speedup": (
                        round(t_un_cold / t_sc_cold, 2)
                        if t_un_cold and t_sc_cold
                        else None
                    ),
                    "cold_arm_available": t_un_cold is not None,
                    "pad_pruned_in_scoped_plan": pad_pruned,
                    "pad_read_in_unscoped_plan": pad_read,
                    "changed_keys_equal": keys_un == keys_sc,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
