"""End-to-end CLI test: ``python -m es_household_retention_spark_job_spark`` driven purely by
environment variables (the reference's deployment mode, HRP:72-81), run as a
subprocess because main() owns and stops its SparkSession. Marked slow —
boots a second JVM."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from es_household_retention_spark_job_spark.sinks.upsert import (
    read_keyed_table,
    write_keyed_table,
)
from es_household_retention_spark_job_spark.sources.fixtures import (
    FIXTURE_AS_OF,
    FIXTURE_CLIENT,
    fixture_frames,
)


def test_cli_env_driven_two_phase_run(spark, tmp_path):
    person, encounter = fixture_frames(spark)
    src = tmp_path / "store"
    src.mkdir()
    write_keyed_table(person, str(src / "person"), key="person_id", n_buckets=4)
    encounter.write.mode("overwrite").parquet(str(src / "encounter"))

    env = os.environ | {
        "CLIENT_CODE": FIXTURE_CLIENT,
        "SOURCE_PATH": str(src),
        "TABLE_PREFIX": "",
        "RETENTION_AS_OF": FIXTURE_AS_OF.strftime("%Y-%m-%d"),
        "SPARK_GRAFT_CPUS": "2",
        "LOG_LEVEL": "WARN",
    }
    proc = subprocess.run(
        [sys.executable, "-m", "es_household_retention_spark_job_spark"],
        env=env,
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    from es_household_retention_spark_job_spark.operators.retention import is_unprocessed

    spark.catalog.refreshByPath(str(src / "person"))
    out = read_keyed_table(spark, str(src / "person"))
    scoped = out.where(
        (F.col("client_code") == FIXTURE_CLIENT)
        & F.col("household.household_id").isNotNull()
    )
    # the two-phase run leaves no eligible person behind (P8 + C3 invariant)
    remaining = scoped.where(
        is_unprocessed(F.col("household_retention_history"))
    ).count()
    assert remaining == 0
    before_eligible = person.where(
        (F.col("client_code") == FIXTURE_CLIENT)
        & F.col("household.household_id").isNotNull()
        & is_unprocessed(F.col("household_retention_history"))
    ).count()
    stamped = scoped.where(
        F.size(
            F.filter(
                F.col("household_retention_history"),
                lambda e: e["retained"].isNotNull(),
            )
        )
        > 0
    ).count()
    assert stamped >= before_eligible > 0
