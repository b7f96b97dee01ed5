"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship retention query (EP1, HRP:305-648) on
sf0.001. ``queries()``/``oracle_sql()`` expose each implemented operator from
SURVEY §2 with a DuckDB-equivalent oracle; keys without an oracle entry are
non-SQL-expressible ops checked rows-only.

All retention queries use the pinned ``as_of = 2001-08-01`` (clock.py) so the
ES date-math semantics (``now-4y``/``now-5y``) are deterministic over the
driver-generated testdata (orders span 1995-01-01..2001-08-01).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from es_household_retention_spark_job_spark import oracle
from es_household_retention_spark_job_spark.clock import TESTDATA_AS_OF
from es_household_retention_spark_job_spark.entry_queries import (
    ORACLE_SQL,
    QUERIES,
)
from es_household_retention_spark_job_spark.operators import retention as R
from es_household_retention_spark_job_spark.sources.tpch import (
    ensure_session_confs,
    retention_inputs,
)

CLIENT = "HOUSEHOLD"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full phase-1 household retention at sf0.001."""
    ensure_session_confs(spark)
    person, encounter = retention_inputs(spark, "/root/testdata/sf0.001")
    return R.phase1(person, encounter, CLIENT, TESTDATA_AS_OF)


def _session_proof(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """The driver runs these callables in its OWN SparkSession (default
    configs). Every query already normalizes the session via ``load_table``;
    this wrapper covers the ones that never read a table (e.g. month_grid)
    and keeps the contract independent of each query's internals."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_session_confs(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _session_proof(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
