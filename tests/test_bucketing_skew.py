"""Scale-lever tests: bucketed co-located joins plan with zero exchanges;
salted joins return exactly the plain-join result under skew."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from es_household_retention_spark_job_spark import plans as P
from es_household_retention_spark_job_spark.operators.skew import salted_join
from es_household_retention_spark_job_spark.sources.bucketed import (
    cobucket_join,
    write_bucketed,
)
from es_household_retention_spark_job_spark.sources.tpch import load_table

from .conftest import SF_DIR


def test_cobucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse.dir is static per-JVM; tables land in ./spark-warehouse
    # (gitignored) and are dropped below
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"), "orders_b", "custkey"
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"), "customer_b", "custkey"
    )
    joined = cobucket_join(spark, "orders_b", "customer_b", "custkey")
    # co-located: the join itself introduces no shuffle
    assert P.count_shuffles(joined) == 0
    plain = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    )
    assert joined.count() == plain.count()
    spark.sql("DROP TABLE orders_b")
    spark.sql("DROP TABLE customer_b")


def test_salted_join_matches_plain_join(spark):
    events = load_table(spark, SF_DIR, "events")  # user_id join, skewable
    dim = (
        events.select("user_id").distinct().withColumn(
            "user_tag", F.concat(F.lit("u"), F.col("user_id"))
        )
    )
    plain = events.join(dim, "user_id").select("event_id", "user_tag")
    salted = salted_join(
        events, dim, on=["user_id"], salt_from="event_id", n_salt=8
    ).select("event_id", "user_tag")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_approx_distinct_within_tolerance(spark):
    orders = load_table(spark, SF_DIR, "orders")
    approx = orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("a")
    ).first()[0]
    exact = orders.select("o_custkey").distinct().count()
    assert abs(approx - exact) <= 0.05 * exact


def test_salted_left_join_preserves_unmatched(spark):
    events = load_table(spark, SF_DIR, "events").limit(1000)
    dim = (
        events.select("user_id")
        .distinct()
        .where(F.col("user_id") % 2 == 0)
        .withColumn("user_tag", F.concat(F.lit("u"), F.col("user_id")))
    )
    plain = events.join(dim, "user_id", "left").select("event_id", "user_tag")
    salted = salted_join(
        events, dim, on=["user_id"], salt_from="event_id", n_salt=4, how="left"
    ).select("event_id", "user_tag")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_rejects_small_side_outer(spark):
    """right/full outer would emit each unmatched replicated small-side row
    n_salt times — the helper must refuse instead of silently duplicating."""
    events = load_table(spark, SF_DIR, "events")
    dim = events.select("user_id").distinct()
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(events, dim, on=["user_id"], salt_from="event_id", how="full_outer")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(events, dim, on=["user_id"], salt_from="event_id", how="right")
