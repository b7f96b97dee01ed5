"""EP1/EP2 flagship parity vs the DuckDB oracle at sf0.001.

The oracle encodes the reference's band SELF-JOIN (HRP:529-533); the engine's
default is the single-window rewrite — matching outputs prove the rewrite.
"""

from __future__ import annotations

import pytest

from es_household_retention_spark_job_spark import oracle
from es_household_retention_spark_job_spark.clock import TESTDATA_AS_OF
from es_household_retention_spark_job_spark.operators import retention as R
from es_household_retention_spark_job_spark.sources.tpch import retention_inputs

from .conftest import SF_DIR, assert_matches_oracle

CLIENT = "HOUSEHOLD"


@pytest.fixture(scope="module")
def inputs(spark):
    person, encounter = retention_inputs(spark, SF_DIR)
    return person.cache(), encounter.cache()


@pytest.mark.parametrize("strategy", ["window", "selfjoin"])
def test_phase1_matches_oracle(spark, duck, inputs, strategy):
    person, encounter = inputs
    out = R.phase1(person, encounter, CLIENT, TESTDATA_AS_OF, strategy=strategy, cache=False)
    assert_matches_oracle(out, duck, oracle.phase1_sql(CLIENT, TESTDATA_AS_OF), min_rows=10)


def test_phase1_has_retained_islands(spark, inputs):
    person, encounter = inputs
    out = R.phase1(person, encounter, CLIENT, TESTDATA_AS_OF, cache=False)
    kinds = {r["retained"] for r in out.select("retained").distinct().collect()}
    assert kinds == {True, False}, f"degenerate result: {kinds}"


def test_collapsed_matches_oracle(spark, duck, inputs):
    person, encounter = inputs
    persons = R.eligible_persons(person, CLIENT)
    encounters = R.eligible_encounters(encounter, CLIENT, TESTDATA_AS_OF)
    admits = R.person_encounter_admits(persons, encounters)
    retained = R.retained_months(admits)
    base = R.retention_base(persons, retained, R.month_grid(spark, TESTDATA_AS_OF))
    collapsed = R.collapse_retention(base, TESTDATA_AS_OF)
    assert_matches_oracle(
        collapsed, duck, oracle.collapsed_sql(CLIENT, TESTDATA_AS_OF), min_rows=5
    )


def test_phase2_matches_oracle(spark, duck, inputs):
    person, encounter = inputs
    persons = R.eligible_persons(person, CLIENT)
    # Population a legitimate phase-2 run stamps: unprocessed persons with no
    # qualifying encounter (the invariant-satisfying remainder).
    lo, hi = (
        R.epoch_ms(R.add_years(TESTDATA_AS_OF, -R.HAS_CHILD_YEARS)),
        R.epoch_ms(TESTDATA_AS_OF),
    )
    import pyspark.sql.functions as F

    qualifying = encounter.where(
        (F.col("client_code") == CLIENT) & F.col("admit_date").between(lo, hi)
    ).select("person_id")
    remainder = persons.join(qualifying, "person_id", "left_anti")
    out = R.phase2(remainder, TESTDATA_AS_OF)
    assert_matches_oracle(out, duck, oracle.phase2_sql(CLIENT, TESTDATA_AS_OF))


def test_phase2_invariant_raises_when_phase1_incomplete(spark, inputs):
    person, encounter = inputs
    with pytest.raises(R.HouseholdRetentionNotReadyError):
        R.check_phase2_invariant(person, encounter, CLIENT, TESTDATA_AS_OF)
