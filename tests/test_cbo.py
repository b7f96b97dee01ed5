"""CBO catalog-statistics evidence (operators/cbo.py).

Asserts the three facts that make stats-driven planning real, not claimed:
ANALYZE populates table + column stats the optimizer can read back; the
optimized plan carries a cardinality estimate only when CBO is on; and a
deliberately badly-ordered 5-way join is re-ordered away from its syntactic
shape (selective dimension chain before the fact-fact join) without
changing its result."""

from __future__ import annotations

import pytest

from es_household_retention_spark_job_spark.operators import cbo

from .conftest import SF_DIR, canon_frame

DB = "cbo_test"


@pytest.fixture(scope="module")
def stats_db(spark):
    cbo.register_stats_tables(spark, SF_DIR, db=DB)
    yield DB
    spark.sql(f"DROP DATABASE IF EXISTS {DB} CASCADE")


def test_analyze_populates_table_stats(spark, stats_db):
    for t in ("region", "nation", "customer", "orders", "lineitem"):
        got = cbo.table_stats(spark, f"{DB}.{t}")
        truth = spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
        assert got["row_count"] == truth
        assert got["size_bytes"] > 0


def test_analyze_populates_column_stats(spark, stats_db):
    st = cbo.column_stats(spark, f"{DB}.nation", "n_nationkey")
    assert st["distinct_count"] == "25"
    assert st["min"] == "0" and st["max"] == "24"
    assert st["num_nulls"] == "0"


def test_cbo_carries_cardinality_estimate(spark, stats_db):
    q = lambda: cbo.regional_revenue_badly_ordered(spark, db=DB)  # noqa: E731
    with cbo.cbo_session(spark, enabled=False):
        off = cbo.plan_stats(q())
    with cbo.cbo_session(spark, enabled=True):
        on = cbo.plan_stats(q())
    # without stats-based costing there is no row estimate and the size
    # estimate is a multiplied-out upper bound; with CBO the estimate is
    # the true output magnitude (≤ 5 regions)
    assert off["row_count"] is None
    assert on["row_count"] is not None and 1 <= on["row_count"] <= 5
    assert on["size_bytes"] < off["size_bytes"]


def test_cbo_reorders_bad_join_order(spark, stats_db):
    q = lambda: cbo.regional_revenue_badly_ordered(spark, db=DB)  # noqa: E731
    with cbo.cbo_session(spark, enabled=False):
        off = cbo.join_order(q())
    with cbo.cbo_session(spark, enabled=True):
        on = cbo.join_order(q())
    # syntactic order survives without CBO: facts first
    assert off[:2] == ["lineitem", "orders"]
    # with stats the selective dimension chain joins before the big fact:
    # lineitem moves after region/nation in the join tree
    assert on != off
    assert on.index("lineitem") > on.index("region")
    assert on.index("lineitem") > on.index("nation")


def test_cbo_does_not_change_results(spark, stats_db):
    q = lambda: cbo.regional_revenue_badly_ordered(spark, db=DB)  # noqa: E731
    with cbo.cbo_session(spark, enabled=False):
        off = canon_frame(q().toPandas())
    with cbo.cbo_session(spark, enabled=True):
        on = canon_frame(q().toPandas())
    assert off == on and len(on) > 0
