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

class SchemaContractError(TypeError):
    """A DataFrame does not conform to its declared StructType contract."""


def validate(df, schema: T.StructType, allow_extra: bool = False) -> None:
    """Assert ``df`` conforms to ``schema`` (names + types, order-insensitive).

    The engine's stance (SURVEY §1.3): explicit contracts at every pipeline
    boundary instead of the reference's read-time inference — a column
    drifting to a different type fails HERE with a readable diff, not three
    stages later inside an epoch subtraction. Nullability is advisory in
    Spark and therefore not enforced."""
    got = {f.name: f.dataType for f in df.schema.fields}
    want = {f.name: f.dataType for f in schema.fields}
    problems = []
    for name, dt in want.items():
        if name not in got:
            problems.append(f"missing column {name!r} ({dt.simpleString()})")
        elif got[name] != dt:
            problems.append(
                f"column {name!r}: expected {dt.simpleString()}, "
                f"got {got[name].simpleString()}"
            )
    if not allow_extra:
        problems += [f"unexpected column {n!r}" for n in got if n not in want]
    if problems:
        raise SchemaContractError(
            "schema contract violation:\n  " + "\n  ".join(problems)
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
