"""Readers for the driver-generated TPC-H-ish parquet tables, plus the
deterministic derivation of the retention-domain ``person``/``encounter``
tables from ``customer``/``orders`` (FIXTURES.md "existing driver TESTDATA"
section).

The derivation is mirrored 1:1 by DuckDB SQL in ``oracle.py`` — any change
here must change there too. It intentionally produces the awkward shapes the
reference reads from Elasticsearch (HRP:474-476,412-418):

- ``household`` is an embedded struct (nullable struct AND nullable inner id),
- ``household_retention_history`` is a nested array<struct> that is NULL for
  unprocessed persons and populated for already-processed ones (P8 semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Derivation knobs — keep in sync with oracle.py.
HOUSEHOLD_DIV = 3  # avg persons per household
NULL_HOUSEHOLD_MOD = 17  # c_custkey % 17 == 0 -> no household (P5 exclusion)
PROCESSED_MOD = 13  # c_custkey % 13 == 0 -> already has history (P8 exclusion)
DEFAULT_CLIENT_CODE = "HOUSEHOLD"  # one c_mktsegment value plays client_code


#: SQL confs every query needs regardless of who built the SparkSession.
#: The external driver runs ``queries()`` in its OWN session (default
#: configs), so relying on session.py being the builder is not enough:
#: * UTC session timezone — every date_trunc/cast/format/epoch expression
#:   must resolve identically to the DuckDB oracle (naive-UTC semantics);
#: * nanosAsLong — events.parquet is INT64 TIMESTAMP(NANOS), illegal for
#:   Spark's reader otherwise (PARQUET_TYPE_ILLEGAL);
#: * NTZ inference off — parquet TIMESTAMP loads as an instant, keeping
#:   epoch math valid (and unix_millis-class functions applicable).
#: All three are runtime-settable SQL confs (not static Spark confs).
_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def ensure_session_confs(spark: SparkSession) -> None:
    """Make the arriving session safe for this engine's queries (see
    ``_RUNTIME_CONFS``). Idempotent; called on every table load so the
    driver's default-config session behaves like ``session.get_spark()``'s.
    Failures to set are swallowed — downstream expressions are additionally
    written type-robustly (see ``derive_encounter``, events branch below)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


#: analyzed-DataFrame cache keyed by (applicationId, sf_dir, table): the
#: testdata paths are immutable, so the relation (file listing + footer
#: schema + the events normalization below) can be built once per session
#: instead of paying ~0.1s of metadata py4j/listing per query build. A
#: DataFrame is an immutable logical plan — reuse is free and re-executes
#: fully each action. Keyed by applicationId (not id(spark)) so a stopped
#: and recreated session never sees stale relations.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # events.ts is TIMESTAMP(NANOS); with nanosAsLong it arrives as a
            # nano epoch long — truncate to micros exactly like DuckDB's
            # reader. integer `div`, NOT `/`: float division of nano-epoch
            # longs loses the last microsecond digit (double spacing is 0.25
            # at ~1.7e15)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # reader version that CAN parse nanos natively but inferred NTZ:
            # reinterpret as a UTC instant (session tz forced UTC above)
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def derive_person(customer: DataFrame) -> DataFrame:
    """customer -> person (ES person-doc shape, HRP:474-476).

    person_id = 'P'||c_custkey; client_code = c_mktsegment;
    household_id = 'H'||floor(c_custkey/3) (NULL every 17th);
    history = populated dummy entry every 13th person ("already processed"),
    else NULL ("unprocessed").
    """
    household_id = F.when(
        F.col("c_custkey") % NULL_HOUSEHOLD_MOD == 0, F.lit(None).cast("string")
    ).otherwise(
        F.concat(
            F.lit("H"),
            F.floor(F.col("c_custkey") / HOUSEHOLD_DIV).cast("long").cast("string"),
        )
    )
    processed_entry = F.struct(
        F.struct(F.lit(0).cast("long").alias("gte"), F.lit(0).cast("long").alias("lte")).alias(
            "date_range"
        ),
        F.struct(
            F.lit("1970-01-01").alias("gte"), F.lit("1970-01-01 00:00:00").alias("lte")
        ).alias("date_range_alt"),
        F.lit(False).alias("retained"),
    )
    return customer.select(
        F.concat(F.lit("P"), F.col("c_custkey").cast("string")).alias("person_id"),
        F.col("c_mktsegment").alias("client_code"),
        F.struct(household_id.alias("household_id")).alias("household"),
        F.when(F.col("c_custkey") % PROCESSED_MOD == 0, F.array(processed_entry))
        .otherwise(F.lit(None))
        .cast("array<struct<date_range:struct<gte:long,lte:long>,"
              "date_range_alt:struct<gte:string,lte:string>,retained:boolean>>")
        .alias("household_retention_history"),
    )


#: Internal raw-source column the encounter derivation carries alongside the
#: derived ``admit_date``: the UNTRANSFORMED o_orderdate. Every admit-window
#: filter (operators.retention.admit_window) re-expresses its epoch-ms range
#: on this plain column too, because the parquet reader can only push plain
#: attribute comparisons — the derived ``unix_date(cast(..)) * 86400000``
#: form never reaches PushedFilters (optimization guide §6), which at scale
#: means scanning the whole fact table instead of the window's row groups.
#: The column never reaches any query output (all consumers project
#: explicitly) and production parquet encounter tables don't carry it — for
#: them ``admit_date`` is a plain stored column and pushes down directly.
RAW_ADMIT_TS = "_admit_src_ts"


def derive_encounter(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """orders -> encounter (ES child-doc shape, HRP:412-418).

    encounter_id = 'E'||o_orderkey; person_id = 'P'||o_custkey;
    client_code inherited from the parent customer's segment;
    admit_date = epoch-millis of o_orderdate (UTC session).
    """
    seg = customer.select("c_custkey", "c_mktsegment")
    # epoch-ms via unix_date: o_orderdate is date-valued, and this derivation
    # is valid for DATE, TIMESTAMP *and* TIMESTAMP_NTZ inputs — unlike
    # unix_millis, which raises on NTZ (the driver's default session infers
    # NTZ from parquet). Matches the oracle's epoch_ms(o_orderdate) exactly.
    admit_ms = F.unix_date(F.col("o_orderdate").cast("date")).cast("long") * F.lit(
        86400000
    )
    return (
        orders.join(seg, orders.o_custkey == seg.c_custkey, "inner")
        .select(
            F.concat(F.lit("E"), F.col("o_orderkey").cast("string")).alias("encounter_id"),
            F.concat(F.lit("P"), F.col("o_custkey").cast("string")).alias("person_id"),
            F.col("c_mktsegment").alias("client_code"),
            admit_ms.alias("admit_date"),
            F.col("o_orderdate").alias(RAW_ADMIT_TS),
        )
    )


def retention_inputs(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(person, encounter) derived from the sf dir."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return derive_person(customer), derive_encounter(orders, customer)
