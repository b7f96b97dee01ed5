"""FIXTURES.md edge-case households: explicit expected islands + full-fidelity
oracle over Spark-written NESTED parquet (the P8 three-valued predicate is
evaluated by both engines on the real array<struct> column)."""

from __future__ import annotations

import duckdb
import pytest

from es_household_retention_spark_job_spark import oracle
from es_household_retention_spark_job_spark.operators import retention as R
from es_household_retention_spark_job_spark.sources.fixtures import (
    EXPECTED_ISLANDS,
    FIXTURE_AS_OF,
    FIXTURE_CLIENT,
    fixture_frames,
    write_fixture_store,
)

from .conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("fixture_store")
    p_path, e_path = write_fixture_store(spark, str(base))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW person AS SELECT * FROM read_parquet('{p_path}/*.parquet')")
    con.execute(
        f"CREATE VIEW encounter AS SELECT * FROM read_parquet('{e_path}/*.parquet')"
    )
    yield spark.read.parquet(p_path), spark.read.parquet(e_path), con
    con.close()


def collapsed_df(spark, person, encounter):
    persons = R.eligible_persons(person, FIXTURE_CLIENT)
    encounters = R.eligible_encounters(encounter, FIXTURE_CLIENT, FIXTURE_AS_OF)
    admits = R.person_encounter_admits(persons, encounters)
    base = R.retention_base(
        persons, R.retained_months(admits), R.month_grid(spark, FIXTURE_AS_OF)
    )
    return R.collapse_retention(base, FIXTURE_AS_OF)


def test_expected_islands(spark, store):
    person, encounter, _ = store
    rows = collapsed_df(spark, person, encounter).collect()
    got: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["household"], r["start_date"])):
        got.setdefault(r["household"], []).append((r["start_date"], r["retained"]))
    assert got == EXPECTED_ISLANDS


def test_island_end_dates(spark, store):
    person, encounter, _ = store
    rows = {
        (r["household"], r["start_date"]): r
        for r in collapsed_df(spark, person, encounter).collect()
    }
    # terminal island ends at last second of the grid's max month
    assert rows[("HH_CURMONTH", "2026-08-01")]["end_date"] == "2026-08-31 23:59:59"
    # replicated reference quirk (HRP:580,586): state change AT max month
    # stretches the preceding island's end through the max month (overlap)
    assert rows[("HH_CURMONTH", "2022-08-01")]["end_date"] == "2026-08-31 23:59:59"
    # mid-chain island ends at last second of its final month (HRP:571-573)
    assert rows[("HH_RUN", "2024-02-01")]["end_date"] == "2024-06-30 23:59:59"
    r = rows[("HH_RUN", "2024-02-01")]
    assert r["start_date_epoch"] == 1706745600000  # 2024-02-01 UTC
    assert r["end_date_epoch"] == 1719791999000  # 2024-06-30 23:59:59 UTC


def test_phase1_matches_nested_oracle(spark, store):
    person, encounter, con = store
    out = R.phase1(person, encounter, FIXTURE_CLIENT, FIXTURE_AS_OF, cache=False)
    prelude = oracle.fixture_cte(FIXTURE_CLIENT, FIXTURE_AS_OF)
    assert_matches_oracle(
        out, con, oracle.phase1_sql(FIXTURE_CLIENT, FIXTURE_AS_OF, prelude), min_rows=10
    )


def test_collapse_matches_reference_literal_sql(spark, store):
    """Faithfulness anchor: the island-id rewrite vs the reference's LITERAL
    4-window/3-join SQL (HRP:557-590) run in DuckDB on the same base."""
    person, encounter, con = store
    out = collapsed_df(spark, person, encounter)
    prelude = oracle.fixture_cte(FIXTURE_CLIENT, FIXTURE_AS_OF)
    assert_matches_oracle(
        out,
        con,
        oracle.reference_collapse_sql(FIXTURE_CLIENT, FIXTURE_AS_OF, prelude),
        min_rows=10,
    )


def test_multiperson_household_inherits_identical_ranges(spark, store):
    person, encounter, _ = store
    out = R.phase1(person, encounter, FIXTURE_CLIENT, FIXTURE_AS_OF, cache=False)
    by_person = {
        pid: sorted(
            (r["start_date"], r["end_date"], r["retained"])
            for r in out.collect()
            if r["person_id"] == pid
        )
        for pid in ("P_M1", "P_M2", "P_M3")
    }
    assert by_person["P_M1"] == by_person["P_M2"] == by_person["P_M3"]
    assert len(by_person["P_M1"]) == 3


def test_exclusions(spark, store):
    person, encounter, _ = store
    out = R.phase1(person, encounter, FIXTURE_CLIENT, FIXTURE_AS_OF, cache=False)
    ids = {r["person_id"] for r in out.select("person_id").distinct().collect()}
    assert "P_X1" not in ids  # processed (P8)
    assert "P_N1" not in ids  # null household (P5)
    assert "P_O1" not in ids  # other client (P4)
    assert {"P_Y1", "P_Z1"} <= ids  # null-retained / empty array are unprocessed
