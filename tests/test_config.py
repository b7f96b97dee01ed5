"""C1 — config precedence (HRP:70-87 semantics): exactly-4 argv wins over
env; env wins over defaults; LOG_LEVEL/RETENTION_AS_OF always env-sourced."""

from __future__ import annotations

from es_household_retention_spark_job_spark.config import EngineConfig, load_config


def test_argv_wins_over_env(monkeypatch):
    monkeypatch.setenv("CLIENT_CODE", "ENVCODE")
    monkeypatch.setenv("SPARK_PROCESS_BATCH_SIZE", "77")
    cfg = load_config(["ARGCODE", "/data", "pfx", "123"])
    assert cfg.client_code == "ARGCODE"
    assert cfg.source_path == "/data"
    assert cfg.table_prefix == "pfx"
    assert cfg.batch_size == 123


def test_env_fallback(monkeypatch):
    monkeypatch.setenv("CLIENT_CODE", "ENVCODE")
    monkeypatch.setenv("SOURCE_PATH", "/envdata")
    monkeypatch.setenv("SPARK_PROCESS_BATCH_SIZE", "77")
    cfg = load_config(None)
    assert cfg.client_code == "ENVCODE"
    assert cfg.source_path == "/envdata"
    assert cfg.batch_size == 77


def test_defaults_when_nothing_set(monkeypatch):
    for var in (
        "CLIENT_CODE",
        "SOURCE_PATH",
        "TABLE_PREFIX",
        "SPARK_PROCESS_BATCH_SIZE",
        "LOG_LEVEL",
        "RETENTION_AS_OF",
    ):
        monkeypatch.delenv(var, raising=False)
    cfg = load_config(None)
    d = EngineConfig()
    assert (cfg.client_code, cfg.source_path, cfg.batch_size) == (
        d.client_code,
        d.source_path,
        d.batch_size,
    )
    assert cfg.as_of is None


def test_schema_contract_catches_drift(spark):
    from pyspark.sql import types as T

    from es_household_retention_spark_job_spark.schemas import (
        SchemaContractError,
        validate,
    )

    want = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    ok = spark.createDataFrame([("a", 1)], "k string, v long")
    validate(ok, want)
    drifted = spark.createDataFrame([("a", 1)], "k string, v int")
    import pytest as _pytest

    with _pytest.raises(SchemaContractError, match="expected bigint, got int"):
        validate(drifted, want)
    extra = spark.createDataFrame([("a", 1, 2)], "k string, v long, z long")
    with _pytest.raises(SchemaContractError, match="unexpected column 'z'"):
        validate(extra, want)
    validate(extra, want, allow_extra=True)


def test_wrong_arity_argv_falls_back_to_env(monkeypatch):
    """The reference requires EXACTLY 4 positionals (HRP:70-71); any other
    arity falls through to env/defaults."""
    monkeypatch.setenv("CLIENT_CODE", "ENVCODE")
    cfg = load_config(["ONLYONE"])
    assert cfg.client_code == "ENVCODE"
