"""Equivalence proof on the TPC-H-derived data too: island-id collapse ==
the reference's literal 4-window/3-join SQL (both run in DuckDB), and the
Spark collapse matches both."""

from __future__ import annotations

from es_household_retention_spark_job_spark import oracle
from es_household_retention_spark_job_spark.clock import TESTDATA_AS_OF

from .conftest import canon_frame

CLIENT = "HOUSEHOLD"


def test_reference_sql_equals_island_id_sql(duck):
    ref = duck.execute(oracle.reference_collapse_sql(CLIENT, TESTDATA_AS_OF)).df()
    isl = duck.execute(oracle.collapsed_sql(CLIENT, TESTDATA_AS_OF)).df()
    assert len(ref) > 100
    assert canon_frame(ref) == canon_frame(isl)
