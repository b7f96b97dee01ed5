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
