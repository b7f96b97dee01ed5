"""Streaming micro-benchmark: per-micro-batch latency of the stateful
incremental-retention path at bench scale.

Called by the repo-root ``bench.py`` (results land in ``BENCH_LOCAL.json``
under ``"streaming"``), never by the driver's correctness gate — streaming
latency is a telemetry number, not an oracle-checkable result.

Method: the sf-dir encounters are re-serialized to NDJSON shards (written
DISTRIBUTED via ``to_json`` — no driver collect), then streamed with
``maxFilesPerTrigger=1`` through ``incremental_retention`` (file source →
stream-static person join → ``applyInPandasWithState`` admit-set
accumulation → ``foreachBatch`` range recompute + keyed upsert). The
reported p50/p95 are ``triggerExecution`` durations from the query's own
progress telemetry — the same signal a production monitor alerts on."""

from __future__ import annotations

import shutil
import statistics
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_SHARDS = 4


def _ndjson_shards(df: DataFrame, out_dir: str) -> None:
    """Distributed NDJSON serialization; N_SHARDS files → N micro-batches."""
    (
        df.repartition(N_SHARDS)
        .select(F.to_json(F.struct("*")).alias("value"))
        .write.mode("overwrite")
        .text(out_dir)
    )


def _drain(query, timeout_s: int = 600) -> bool:
    """Wait for the availableNow query; on timeout STOP it (so the work dir
    can be removed safely) and report the truncation."""
    query.awaitTermination(timeout_s)
    if query.isActive:
        query.stop()
        query.awaitTermination(60)
        return False
    return True


def _latency_stats(query, complete: bool = True) -> dict:
    batches = [p for p in query.recentProgress if p["numInputRows"] > 0]
    lat_s = sorted(
        p["durationMs"]["triggerExecution"] / 1000.0 for p in batches
    )
    if not lat_s:
        return {"err": "no non-empty micro-batches"}
    import math

    # nearest-rank p95: ceil(0.95 n) — for small n this is the max, never a
    # lower quantile masquerading as the tail
    p95_idx = min(len(lat_s) - 1, math.ceil(0.95 * len(lat_s)) - 1)
    out = {
        "n_microbatches": len(lat_s),
        "input_rows": int(sum(p["numInputRows"] for p in batches)),
        "p50_sec": round(statistics.median(lat_s), 3),
        "p95_sec": round(lat_s[p95_idx], 3),
        "max_sec": round(lat_s[-1], 3),
        "total_sec": round(sum(lat_s), 3),
    }
    if not complete:
        out["err"] = "timed out before draining all micro-batches"
    return out


def streaming_bench(spark: SparkSession, sf_dir: str) -> dict:
    from ..clock import TESTDATA_AS_OF
    from ..operators import retention as R
    from ..sources.tpch import load_table, retention_inputs
    from . import doc_stream, ingest, retention_stream

    person, encounter = retention_inputs(spark, sf_dir)
    persons_e = R.eligible_persons(person, "HOUSEHOLD")
    out: dict[str, dict] = {}

    work = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        # drop the derivation-internal raw-timestamp column (tpch.RAW_ADMIT_TS)
        # so the streamed NDJSON bytes stay the 4-column encounter shape
        from ..sources.tpch import RAW_ADMIT_TS

        _ndjson_shards(encounter.drop(RAW_ADMIT_TS), f"{work}/enc_ndjson")
        q = retention_stream.incremental_retention(
            spark,
            ingest.stream_encounters(
                spark, f"{work}/enc_ndjson", max_files_per_trigger=1
            ),
            persons_e,
            target_path=f"{work}/hh_ranges",
            checkpoint_dir=f"{work}/ckpt",
            client_code="HOUSEHOLD",
            as_of=TESTDATA_AS_OF,
        )
        out["incremental_retention"] = _latency_stats(q, complete=_drain(q))

        _ndjson_shards(load_table(spark, sf_dir, "documents"), f"{work}/docs_ndjson")
        q2 = doc_stream.corpus_append(
            doc_stream.curate(
                doc_stream.stream_documents(
                    spark, f"{work}/docs_ndjson", max_files_per_trigger=1
                )
            ),
            f"{work}/corpus",
            f"{work}/doc_ckpt",
        )
        out["doc_curation"] = _latency_stats(q2, complete=_drain(q2))
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)
