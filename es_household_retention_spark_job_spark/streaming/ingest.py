"""Streaming NDJSON ingestion (the streaming twin of ``sources.json_docs``):
file-source → explicit-schema ``from_json`` → typed columns → parquet
append.

Scale posture: the file source lists + processes new files incrementally
(``maxFilesPerTrigger`` bounds a micro-batch); the write is an append with
exactly-once semantics via the checkpoint — the streaming analog of the
reference's batched ES bulk writes (HRP:49-52). No state is kept here; pure
ingestion is stateless and scales with input splits."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import ENCOUNTER

EVENT = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def stream_ndjson(
    spark: SparkSession,
    in_dir: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Typed streaming read of an NDJSON directory (one doc per line)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(in_dir)
    return raw.select(F.from_json(F.col("value"), schema).alias("d")).select("d.*")


def stream_encounters(spark: SparkSession, in_dir: str, **kw) -> DataFrame:
    return stream_ndjson(spark, in_dir, ENCOUNTER, **kw)


def stream_events(spark: SparkSession, in_dir: str, **kw) -> DataFrame:
    return stream_ndjson(spark, in_dir, EVENT, **kw)


def append_parquet(
    stream: DataFrame, out_dir: str, checkpoint_dir: str, available_now: bool = True
):
    """Exactly-once parquet append; ``available_now`` drains the backlog and
    stops (test/batch-catchup mode — production drops the trigger)."""
    writer = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def apply_keyed_batch(
    batch_df: DataFrame,
    epoch_id: int,
    path: str,
    key: str,
    n_buckets: int | None = None,
    stream_id: str | None = None,
) -> bool:
    """One micro-batch upserted into a KEYED table (sinks.upsert layout)
    with exactly-once replay protection: the epoch id rides the upsert's
    commit app-metadata, so "did this batch already apply?" is answered by
    the table itself — there is no side ledger to drift from the data.

    foreachBatch is at-least-once (a crash between the upsert and the
    checkpoint commit replays the epoch); on replay the recorded epoch is
    already >= this one, so skip. Epochs are stream-scoped exactly like the
    index-maintenance sinks (streaming/doc_stream.py::_epoch_is_replay):
    the recorded epoch counts only if it was recorded by THIS stream
    identity — epoch counters from different checkpoints are incomparable,
    and an anonymous caller never inherits an identified stream's counter.
    The same-stream apply is additionally guarded by ``app_meta_expect``
    on the recorded epoch: two workers racing the same epoch cannot both
    commit even when their rows land in disjoint buckets.

    Unlike ``streaming/retention_stream.py`` (whose per-household upserts
    are idempotent recomputes, so replays are harmless), this sink is for
    batches that are NOT naturally idempotent — e.g. counters or deltas —
    and for keeping a downstream ``read_changes`` feed free of phantom
    versions. Returns True if the batch applied."""
    import os as _os

    from ..sinks.upsert import DEFAULT_BUCKETS, table_app_meta, upsert_parquet

    n_buckets = DEFAULT_BUCKETS if n_buckets is None else n_buckets
    meta = table_app_meta(path) if _os.path.exists(path) else {}
    last, last_stream = meta.get("stream_epoch"), meta.get("epoch_stream")
    same_stream = last is not None and last_stream == stream_id
    if same_stream and epoch_id <= last:
        return False  # replayed epoch: already folded into the table
    if batch_df.isEmpty():
        return False
    upsert_parquet(
        batch_df.sparkSession,
        path,
        batch_df,
        key=key,
        n_buckets=n_buckets,
        app_meta={"stream_epoch": epoch_id, "epoch_stream": stream_id},
        app_meta_expect={"stream_epoch": last} if same_stream else None,
    )
    return True


def keyed_table_sink(
    stream: DataFrame,
    path: str,
    key: str,
    checkpoint_dir: str,
    n_buckets: int | None = None,
    available_now: bool = True,
    auto_compact: bool = False,
):
    """Streaming upsert into a keyed table: micro-batches merge by key with
    exactly-once epochs (``apply_keyed_batch``; the checkpoint directory is
    the stream identity). The table stays a first-class sink table
    throughout — versioned, time-travelable, a ``read_changes`` source for
    downstream incremental aggregates (``sinks.incremental_agg``).

    ``auto_compact`` folds maintenance into the loop: after each applied
    batch, compact when the manifest-only policy says the table needs it
    (``sinks.upsert.needs_compaction`` — under MoR writes this bounds the
    readers' reconciliation tax; compaction is safe against concurrent
    writers via per-bucket optimistic concurrency, and a replayed epoch
    never re-compacts because the apply is skipped first)."""

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        applied = apply_keyed_batch(
            batch_df,
            epoch_id,
            path,
            key,
            n_buckets=n_buckets,
            stream_id=checkpoint_dir,
        )
        if applied and auto_compact:
            from ..sinks.upsert import compact_keyed_table, needs_compaction

            if needs_compaction(path):
                compact_keyed_table(batch_df.sparkSession, path)

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
