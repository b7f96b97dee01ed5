"""Shared pytest fixtures: one SparkSession per run, a DuckDB connection with
the testdata parquet registered as views (mirroring the driver's harness), and
an exact-equality compare helper that canonicalizes like the driver's
order-insensitive value-hash (sort columns by name, sort rows, exact values —
floats included, which keeps us honest about FP-sensitive query design)."""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb
import numpy as np
import pandas as pd
import pytest

from es_household_retention_spark_job_spark.session import get_spark
from es_household_retention_spark_job_spark.sources.tpch import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="engine-tests", cpus=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def canon_val(v):
    if v is None:
        return None
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return int(v)
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(canon_val(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon_val(x)) for k, x in v.items()))
    if pd.isna(v):
        return None
    return v


def canon_frame(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = [
        tuple(canon_val(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows


def assert_matches_oracle(spark_df, duck_con, sql: str, min_rows: int = 0):
    """Canonicalized exact comparison of a Spark DataFrame vs a DuckDB query."""
    got = spark_df.toPandas()
    want = duck_con.execute(sql).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"column mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    g, w = canon_frame(got), canon_frame(want)
    assert len(g) == len(w), f"row count: spark={len(g)} oracle={len(w)}"
    assert len(g) >= min_rows, f"suspiciously few rows: {len(g)} < {min_rows}"
    mism = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
    assert not mism, (
        f"{len(mism)} mismatched rows (of {len(g)}); first 3: {mism[:3]}\n"
        f"columns: {sorted(got.columns)}"
    )
