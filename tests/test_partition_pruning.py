"""Partition pruning (SURVEY §4): person/encounter-shaped tables partitioned
by ``client_code`` prune non-matching partitions at planning time — the
universal `term client_code` filter (P4) then costs zero I/O for other
clients' data. At 100 TB with hundreds of clients this is the difference
between scanning 100 TB and scanning one client's slice."""

from __future__ import annotations

from pyspark.sql import functions as F

from es_household_retention_spark_job_spark import plans as P
from es_household_retention_spark_job_spark.sources.tpch import load_table

from .conftest import SF_DIR


def test_client_code_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "person_part")
    customer = load_table(spark, SF_DIR, "customer")
    person = customer.select(
        F.concat(F.lit("P"), F.col("c_custkey")).alias("person_id"),
        F.col("c_mktsegment").alias("client_code"),
        F.col("c_name").alias("name"),
    )
    person.write.partitionBy("client_code").mode("overwrite").parquet(path)

    scan = spark.read.parquet(path).where(F.col("client_code") == "HOUSEHOLD")
    plan = P.explain_str(scan)
    # the predicate became a partition filter, not a data filter
    assert "PartitionFilters" in plan and "client_code" in plan.split(
        "PartitionFilters"
    )[1].splitlines()[0], plan

    n_clients = person.select("client_code").distinct().count()
    total = person.count()
    got = scan.count()
    assert 0 < got < total
    # sanity: pruned read returns exactly the partition's rows
    expected = person.where(F.col("client_code") == "HOUSEHOLD").count()
    assert got == expected and n_clients > 1
