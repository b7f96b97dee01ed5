"""Simulates the driver's verify: runs every ``queries()`` entry at the test
scale factor and hash-compares against its ``oracle_sql()`` entry, plus the
``entry()`` smoke check. Keeping this green means CORRECTNESS_r{N}.json will
be green."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from es_household_retention_spark_job_spark.entry_queries import (
    EXTRA_ORACLE_SQL,
    EXTRA_QUERIES,
)

from .conftest import SF_DIR, assert_matches_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

#: the external driver correctness-checks only the first N registry entries
DRIVER_QUERY_BUDGET = 50


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert len(df.schema.fields) == 7
    assert df.count() > 0


def test_registry_fits_driver_budget():
    """Every declared query must actually get a CORRECTNESS row — anything
    past the driver's budget is silently unchecked (round-1 lesson) — and
    the registry must FILL the budget: a demotion without a matching
    promotion would silently waste a hash-checked gate slot (round-11
    tightening; slot swaps are deliberate, both sides at once)."""
    assert len(QUERIES) == DRIVER_QUERY_BUDGET, (
        len(QUERIES),
        sorted(QUERIES)[DRIVER_QUERY_BUDGET:],
    )
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_registry_outputs_are_atomic(spark, name):
    """The driver canonicalizes results with ``pandas.sort_values``, which
    raises ``TypeError: unhashable type`` on list/dict cells — so every
    driver-registry query must emit only atomic top-level columns (round-2
    lesson: array_battery / value_percentiles err'd at the gate). Array ops
    are welcome INSIDE a query; the output schema must be flat scalars."""
    from pyspark.sql import types as T

    df = QUERIES[name](spark, SF_DIR)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name} emits non-atomic top-level columns {bad}; the external "
        f"driver's pandas canonicalizer cannot hash these — flatten them "
        f"(to_json / element-wise scalars), as pack_history_stats does"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    if name in ORACLES:
        assert_matches_oracle(df, duck, ORACLES[name])
    else:
        # rows-only check, mirroring the driver's weaker path
        assert df.count() >= 0 and len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(EXTRA_QUERIES))
def test_extra_query_matches_oracle(spark, duck, name):
    """Queries kept OUT of the driver registry (strategy demos, redundant
    shapes) stay oracle-verified here."""
    df = EXTRA_QUERIES[name](spark, SF_DIR)
    if name in EXTRA_ORACLE_SQL:
        assert_matches_oracle(df, duck, EXTRA_ORACLE_SQL[name])
    else:
        assert df.count() >= 0 and len(df.schema.fields) > 0


#: what the external driver's DEFAULT-config session looks like where it
#: differs from session.get_spark() — the round-1 gate ran here and 24/50
#: queries died on conf-dependent expressions
HOSTILE_CONFS = {
    "spark.sql.session.timeZone": "America/New_York",
    "spark.sql.legacy.parquet.nanosAsLong": "false",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
}

HOSTILE_SAMPLE = [
    "retention_phase1",        # epoch math over o_orderdate (NTZ victim)
    "retention_collapsed",     # date_format/unix_millis (timezone victim)
    "window_battery_events",   # events.parquet TIMESTAMP(NANOS) (reader victim)
    "sink_partial_delta",      # masked per-column MoR fold (r12 gate row)
    "month_grid",              # no table read — covered by the entry wrapper
    "media_features",          # Arrow mapInPandas round-trip + nullable Int64
    "embedding_quantize",      # staged-projection double math, float[] reader
    "dedup_minhash_lsh",       # xxhash64 band keys + exact-Jaccard verify
]


@pytest.mark.parametrize("name", HOSTILE_SAMPLE)
def test_query_survives_hostile_session_confs(spark, duck, name):
    """Every queries() entry must normalize the session itself
    (sources.tpch.ensure_session_confs): flip the confs to the driver's
    defaults first and the oracle hash-match must still hold."""
    from es_household_retention_spark_job_spark.sources import tpch

    saved = {k: spark.conf.get(k, None) for k in HOSTILE_CONFS}
    try:
        for k, v in HOSTILE_CONFS.items():
            spark.conf.set(k, v)
        # drop cached relations so the parquet READ path (schema inference
        # under NTZ/nanos confs) genuinely re-runs under the hostile confs
        tpch._TABLE_CACHE.clear()
        df = QUERIES[name](spark, SF_DIR)
        assert_matches_oracle(df, duck, ORACLES[name])
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
