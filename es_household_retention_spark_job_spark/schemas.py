"""Explicit schemas (SURVEY §1.4). The reference infers schemas from JSON at
read time (HRP:406,471,739); the engine is parquet-first with fixed
``StructType`` contracts, keeping inference only for the raw-JSON ingest path
(``sources.json_docs``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# HRP:264-276 — nested history entry written back to the person document.
DATE_RANGE = T.StructType(
    [
        T.StructField("gte", T.LongType()),  # epoch ms
        T.StructField("lte", T.LongType()),
    ]
)
DATE_RANGE_ALT = T.StructType(
    [
        T.StructField("gte", T.StringType()),  # 'yyyy-MM-dd'
        T.StructField("lte", T.StringType()),  # 'yyyy-MM-dd HH:mm:ss'
    ]
)
HISTORY_ENTRY = T.StructType(
    [
        T.StructField("date_range", DATE_RANGE),
        T.StructField("date_range_alt", DATE_RANGE_ALT),
        T.StructField("retained", T.BooleanType()),
    ]
)

# HRP:474-476,742-744 person surface; household embedded object HRP:476.
PERSON = T.StructType(
    [
        T.StructField("person_id", T.StringType(), nullable=False),
        T.StructField("client_code", T.StringType()),
        T.StructField(
            "household",
            T.StructType([T.StructField("household_id", T.StringType())]),
        ),
        T.StructField("household_retention_history", T.ArrayType(HISTORY_ENTRY)),
    ]
)

# HRP:412-418 encounter surface (ES child doc; parent id -> person_id FK).
ENCOUNTER = T.StructType(
    [
        T.StructField("encounter_id", T.StringType(), nullable=False),
        T.StructField("person_id", T.StringType()),
        T.StructField("client_code", T.StringType()),
        T.StructField("admit_date", T.LongType()),  # epoch ms (HRP:413)
    ]
)

# HRP:602-618 / HRP:769-779 — final per-person output row.
RETENTION_FINAL = T.StructType(
    [
        T.StructField("person_id", T.StringType()),
        T.StructField("household", T.StringType()),
        T.StructField("start_date", T.StringType()),  # 'yyyy-MM-dd'
        T.StructField("end_date", T.StringType()),  # 'yyyy-MM-dd HH:mm:ss'
        T.StructField("start_date_epoch", T.LongType()),
        T.StructField("end_date_epoch", T.LongType()),
        T.StructField("retained", T.BooleanType()),
    ]
)
