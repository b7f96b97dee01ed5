"""Streaming retention end-to-end rehearsal (round 11, r10 verdict #6):
encounter micro-batches drive the FLAGSHIP maintenance loop
(``streaming.retention_stream.incremental_retention_pipeline`` →
``pipeline.run_incremental``: feed → blast radius → staged phases → ONE
person-store publish per batch, cursor committed atomically with the
histories).

Protocol (per batch, N batches over the last N×batch_days of encounters):

1. drop the batch's encounter file into the stream input dir; run the
   file-source stream (availableNow, maxFilesPerTrigger=1, persistent
   checkpoint) — exactly one micro-batch epoch per rehearsal step, the
   SAME checkpoint across steps (genuine epoch continuity + replay guard);
2. record the wall time and the person-store version delta (must be ≤1 —
   one publish per batch);
3. rebuild an independent batch-boundary BACKFILL over base ∪ batches≤i
   and compare order-insensitive state checksums: ``state_equal`` must be
   true after EVERY batch, not just the last.

After the last batch the stream re-runs on the same checkpoint with no
new files: the person-store version must not move (replay/no-op proof;
the app-meta epoch guard itself is pinned in tests/test_streaming.py).

Usage: python tools/streaming_retention_rehearsal.py [sf_dir=/tmp/sf1]
       [n_batches=4] [batch_days=3] [mode=mor]
One JSON line per batch + one summary line (feeds SCALING.md round 11).
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

from es_household_retention_spark_job_spark.clock import TESTDATA_AS_OF  # noqa: E402
from es_household_retention_spark_job_spark.pipeline import run_retention  # noqa: E402
from es_household_retention_spark_job_spark.session import get_spark  # noqa: E402
from es_household_retention_spark_job_spark.sinks.upsert import (  # noqa: E402
    current_version,
    read_keyed_table,
    write_keyed_table,
)
from es_household_retention_spark_job_spark.sources.tpch import (  # noqa: E402
    retention_inputs,
)
from es_household_retention_spark_job_spark.streaming.retention_stream import (  # noqa: E402
    incremental_retention_pipeline,
)

CLIENT = "HOUSEHOLD"
DAY_MS = 86_400_000


def checksum(spark, person_path: str) -> int:
    df = read_keyed_table(spark, person_path)
    return (
        df.select(
            F.xxhash64(
                F.col("person_id"),
                F.to_json(F.col("household_retention_history")),
            ).alias("h")
        )
        .agg(F.expr("bit_xor(h)"))
        .first()[0]
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    batch_days = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    mode = sys.argv[4] if len(sys.argv) > 4 else "mor"
    spark = get_spark(
        app_name="stream-retention-rehearsal", cpus=32, shuffle_partitions=64
    )
    person, encounter = retention_inputs(spark, sf_dir)
    htype = person.schema["household_retention_history"].dataType
    person = person.withColumn(
        "household_retention_history", F.lit(None).cast(htype)
    )
    as_of_ms = int(TESTDATA_AS_OF.timestamp() * 1000)
    cutoff0 = as_of_ms - n_batches * batch_days * DAY_MS
    work = Path(tempfile.mkdtemp(prefix="stream_retention_"))
    try:
        enc_store = str(work / "encounters")
        stream_in = str(work / "stream_in")
        ckpt = str(work / "ckpt")
        os.makedirs(stream_in, exist_ok=True)
        base = encounter.where(F.col("admit_date") < cutoff0)
        base.write.mode("overwrite").parquet(enc_store)

        p_stream = str(work / "person_stream")
        write_keyed_table(person, p_stream, key="person_id", n_buckets=64)
        # the base backfill is the one-shot bulk load: always CoW (the
        # incremental_rehearsal protocol) — MoR applies to the per-batch
        # MAINTENANCE publishes only
        t0 = time.time()
        run_retention(spark, p_stream, enc_store, CLIENT, TESTDATA_AS_OF)
        t_backfill0 = round(time.time() - t0, 2)
        # env drives the per-batch maintenance mode (run_incremental's
        # precedence: arg > env > its r12 "mor" default) — the CoW arm
        # must pin cow explicitly now that the flagship defaults to MoR
        os.environ["SPARK_GRAFT_SINK_WRITE_MODE"] = mode
        print(
            json.dumps(
                {
                    "ladder": "streaming_retention",
                    "sf_dir": sf_dir,
                    "mode": mode,
                    "n_batches": n_batches,
                    "batch_days": batch_days,
                    "base_backfill_sec": t_backfill0,
                }
            ),
            flush=True,
        )

        enc_schema = encounter.schema
        all_equal = True
        for i in range(n_batches):
            lo = cutoff0 + i * batch_days * DAY_MS
            hi = cutoff0 + (i + 1) * batch_days * DAY_MS
            batch = encounter.where(
                (F.col("admit_date") >= lo) & (F.col("admit_date") < hi)
            )
            n_batch = batch.count()
            batch.coalesce(1).write.mode("overwrite").parquet(
                str(work / f"batch_{i}")
            )
            for f in os.listdir(str(work / f"batch_{i}")):
                if f.endswith(".parquet"):
                    shutil.copy(
                        str(work / f"batch_{i}" / f),
                        os.path.join(stream_in, f"batch-{i:04d}.parquet"),
                    )
            v_before = current_version(p_stream)
            t0 = time.time()
            q = incremental_retention_pipeline(
                spark,
                spark.readStream.schema(enc_schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(stream_in),
                p_stream,
                enc_store,
                ckpt,
                CLIENT,
                TESTDATA_AS_OF,
            )
            q.awaitTermination()
            t_inc = round(time.time() - t0, 2)
            v_after = current_version(p_stream)
            # in-loop maintenance, the production posture
            # (keyed_table_sink's auto_compact): fold exactly the bucket
            # set the manifest cost policy selects, timed separately so
            # the per-batch maintenance cost stays visible
            from es_household_retention_spark_job_spark.sinks.upsert import (
                choose_compaction,
                compact_keyed_table,
            )

            t0 = time.time()
            chosen = choose_compaction(p_stream)
            n_comp = (
                compact_keyed_table(spark, p_stream, buckets=chosen)
                if chosen
                else 0
            )
            t_comp = round(time.time() - t0, 2)

            # independent batch-boundary backfill over base ∪ batches≤i
            p_ref = str(work / "person_ref")
            shutil.rmtree(p_ref, ignore_errors=True)
            enc_ref = str(work / "enc_ref")
            spark.read.parquet(enc_store).write.mode("overwrite").parquet(
                enc_ref
            )
            prev = os.environ.pop("SPARK_GRAFT_SINK_WRITE_MODE", None)
            write_keyed_table(person, p_ref, key="person_id", n_buckets=64)
            run_retention(spark, p_ref, enc_ref, CLIENT, TESTDATA_AS_OF)
            if prev is not None:
                os.environ["SPARK_GRAFT_SINK_WRITE_MODE"] = prev
            equal = checksum(spark, p_stream) == checksum(spark, p_ref)
            all_equal = all_equal and equal
            print(
                json.dumps(
                    {
                        "batch": i,
                        "batch_encounters": n_batch,
                        "incremental_sec": t_inc,
                        "compact_sec": t_comp,
                        "buckets_compacted": n_comp,
                        "publishes": v_after - v_before,
                        "state_equal": equal,
                    }
                ),
                flush=True,
            )

        # replay/no-op: same checkpoint, no new files → no publish
        v_before = current_version(p_stream)
        q = incremental_retention_pipeline(
            spark,
            spark.readStream.schema(enc_schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_in),
            p_stream,
            enc_store,
            ckpt,
            CLIENT,
            TESTDATA_AS_OF,
        )
        q.awaitTermination()
        print(
            json.dumps(
                {
                    "replay_noop": current_version(p_stream) == v_before,
                    "all_state_equal": all_equal,
                }
            ),
            flush=True,
        )
    finally:
        os.environ.pop("SPARK_GRAFT_SINK_WRITE_MODE", None)
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
