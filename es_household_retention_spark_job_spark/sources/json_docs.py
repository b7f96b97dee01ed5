"""S3 — raw-JSON ingestion path (SURVEY §2.1).

The reference reads whole ES documents as JSON strings and lets Spark infer
the schema (``sqlContext.read.json`` HRP:406,471,739). The engine ingests
JSON with EXPLICIT schemas via ``from_json`` (inference stays available as an
opt-in for exploration). This is how ES-document-shaped exports (one JSON doc
per line) enter the parquet world."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import ENCOUNTER, PERSON


def parse_json_column(df: DataFrame, col: str, schema: T.StructType | str) -> DataFrame:
    """Parse a JSON-string column into a struct column ``parsed`` (explicit
    schema: malformed rows yield null fields, never job failure)."""
    return df.withColumn("parsed", F.from_json(F.col(col), schema))


def read_person_json(spark: SparkSession, path_or_df) -> DataFrame:
    """NDJSON person documents -> PERSON-schema DataFrame."""
    raw = (
        spark.read.text(path_or_df)
        if isinstance(path_or_df, str)
        else path_or_df
    )
    return raw.select(F.from_json(F.col("value"), PERSON).alias("p")).select("p.*")


def read_encounter_json(spark: SparkSession, path_or_df) -> DataFrame:
    raw = (
        spark.read.text(path_or_df)
        if isinstance(path_or_df, str)
        else path_or_df
    )
    return raw.select(F.from_json(F.col("value"), ENCOUNTER).alias("e")).select("e.*")
