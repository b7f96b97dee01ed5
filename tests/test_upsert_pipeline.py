"""S7 upsert sink + two-phase pipeline orchestration: partial-update
semantics, insert path, phase-1 -> phase-2 flow, invariant, idempotence."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from es_household_retention_spark_job_spark.operators.retention import (
    HouseholdRetentionNotReadyError,
)
from es_household_retention_spark_job_spark.pipeline import (
    run_phase1,
    run_phase2,
    run_retention,
)
from es_household_retention_spark_job_spark.schemas import ENCOUNTER
from es_household_retention_spark_job_spark.sinks.upsert import (
    compact_keyed_table,
    read_keyed_table,
    upsert_parquet,
    write_keyed_table,
)
from es_household_retention_spark_job_spark.sources.fixtures import (
    FIXTURE_AS_OF,
    FIXTURE_CLIENT,
    fixture_frames,
)


def test_upsert_partial_update_and_insert(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "z")], "k string, v int, w string"
    )
    write_keyed_table(base, path, key="k", n_buckets=4)

    updates = spark.createDataFrame([("b", 20), ("d", 40)], "k string, v int")
    upsert_parquet(spark, path, updates, key="k", n_buckets=4)

    got = {r["k"]: (r["v"], r["w"]) for r in read_keyed_table(spark, path).collect()}
    assert got == {
        "a": (1, "x"),  # untouched
        "b": (20, "y"),  # v replaced, w preserved (partial update)
        "c": (3, "z"),  # untouched
        "d": (40, None),  # inserted, missing column null
    }


def test_compaction_single_file_per_bucket_same_data(spark, tmp_path):
    import os

    from es_household_retention_spark_job_spark.sinks.upsert import _with_bucket

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(f"k{i}", i) for i in range(40)], "k string, v int"
    )
    write_keyed_table(base, path, key="k", n_buckets=4)
    # fragment the buckets the way a large multi-task merge write would:
    # append more rows as separate files into the same bucket dirs
    extra = spark.createDataFrame(
        [(f"k{i}", i) for i in range(40, 80)], "k string, v int"
    )
    _with_bucket(extra, "k", 4).write.mode("append").partitionBy("_bucket").parquet(
        path
    )
    spark.catalog.refreshByPath(path)
    before = {r["k"]: r["v"] for r in read_keyed_table(spark, path).collect()}
    assert len(before) == 80

    n = compact_keyed_table(spark, path)
    assert n > 0
    for d in os.listdir(path):
        if d.startswith("_bucket="):
            files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
            assert len(files) == 1, (d, files)
    after = {r["k"]: r["v"] for r in read_keyed_table(spark, path).collect()}
    assert after == before
    assert compact_keyed_table(spark, path) == 0  # idempotent


def test_crash_leftover_aside_dir_is_invisible_to_reads(spark, tmp_path):
    """A crash between rename-aside and cleanup leaves `.old__bucket=N`
    dirs; they must be hidden from Spark's partition discovery (dot
    prefix), not parsed as bogus partitions."""
    import os
    import shutil

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    write_keyed_table(base, path, key="k", n_buckets=2)
    # simulate the crash leftover: a stale full copy of bucket 0
    src = os.path.join(path, "_bucket=0")
    shutil.copytree(src, os.path.join(path, ".old___bucket=0"))
    spark.catalog.refreshByPath(path)
    got = {r["k"]: r["v"] for r in read_keyed_table(spark, path).collect()}
    assert got == {"a": 1, "b": 2}  # no duplicated/bogus partition rows


def test_upsert_creates_table_when_missing(spark, tmp_path):
    path = str(tmp_path / "fresh")
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    upsert_parquet(spark, path, df, key="k", n_buckets=2)
    assert read_keyed_table(spark, path).count() == 1


@pytest.fixture()
def keyed_store(spark, tmp_path):
    person, encounter = fixture_frames(spark)
    p_path, e_path = str(tmp_path / "person"), str(tmp_path / "encounter")
    write_keyed_table(person, p_path, key="person_id", n_buckets=4)
    encounter.write.mode("overwrite").parquet(e_path)
    return p_path, e_path


def test_two_phase_run_and_idempotence(spark, keyed_store):
    p_path, e_path = keyed_store

    # phase 2 before phase 1: invariant must throw (C3)
    with pytest.raises(HouseholdRetentionNotReadyError):
        run_phase2(spark, p_path, e_path, FIXTURE_CLIENT, FIXTURE_AS_OF)

    stats = run_retention(spark, p_path, e_path, FIXTURE_CLIENT, FIXTURE_AS_OF)
    assert stats["phase1_persons"] == 13  # all eligible DEMO persons
    assert stats["phase2_persons"] == 0  # phase 1 processed everyone

    person = read_keyed_table(spark, p_path)
    hist = person.where(F.col("household_retention_history").isNotNull()).select(
        "person_id", F.size("household_retention_history").alias("n")
    )
    by_id = {r["person_id"]: r["n"] for r in hist.collect()}
    assert by_id["P_R1"] == 3  # false/true/false islands
    assert by_id["P_S1"] == 1
    assert by_id["P_M3"] == 3  # inherited from household

    # untouched rows: processed person keeps its original single entry
    assert by_id["P_X1"] == 1

    # re-run: both phases skip (P8 now fails for everyone) — idempotent
    stats2 = run_retention(spark, p_path, e_path, FIXTURE_CLIENT, FIXTURE_AS_OF)
    assert stats2 == {"phase1_persons": 0, "phase2_persons": 0}


def test_phase2_stamps_encounterless_store(spark, tmp_path):
    """A store where no eligible person has encounters: phase 2 may run
    directly (invariant holds) and stamps everyone (HRP:762-784)."""
    person = spark.createDataFrame(
        [
            ("q1", FIXTURE_CLIENT, {"household_id": "HQ1"}, None),
            ("q2", FIXTURE_CLIENT, {"household_id": "HQ1"}, None),
            ("q3", FIXTURE_CLIENT, {"household_id": "HQ2"}, None),
        ],
        schema="person_id string, client_code string, "
        "household struct<household_id:string>, "
        "household_retention_history array<struct<"
        "date_range:struct<gte:long,lte:long>,"
        "date_range_alt:struct<gte:string,lte:string>,retained:boolean>>",
    )
    encounter = spark.createDataFrame([], schema=ENCOUNTER)
    p_path, e_path = str(tmp_path / "p2person"), str(tmp_path / "p2encounter")
    write_keyed_table(person, p_path, key="person_id", n_buckets=2)
    encounter.write.mode("overwrite").parquet(e_path)

    n = run_phase2(spark, p_path, e_path, FIXTURE_CLIENT, FIXTURE_AS_OF)
    assert n == 3
    got = read_keyed_table(spark, p_path)
    entries = got.select(
        "person_id", F.explode("household_retention_history").alias("e")
    ).select("person_id", "e.date_range_alt.gte", "e.date_range_alt.lte", "e.retained")
    rows = {r["person_id"]: (r["gte"], r["lte"], r["retained"]) for r in entries.collect()}
    assert rows["q1"] == ("2022-08-01", "2036-08-01 00:00:00", False)
    assert rows == {k: rows["q1"] for k in ("q1", "q2", "q3")}


def test_upsert_schema_evolution_visible_across_buckets(spark, tmp_path):
    """An update that introduces a NEW column rewrites only its own buckets;
    the pinned sidecar schema must still expose the column (as null) for
    rows in untouched buckets, through reads AND compaction."""
    path = str(tmp_path / "evo")
    base = spark.createDataFrame([(f"k{i}", i) for i in range(20)], "k string, v int")
    write_keyed_table(base, path, key="k", n_buckets=4)

    up = spark.createDataFrame([("k3", 99, "hello")], "k string, v int, extra string")
    upsert_parquet(spark, path, up, key="k")

    got = read_keyed_table(spark, path)
    assert "extra" in got.columns
    rows = {r["k"]: (r["v"], r["extra"]) for r in got.collect()}
    assert len(rows) == 20
    assert rows["k3"] == (99, "hello")
    assert all(v[1] is None for k, v in rows.items() if k != "k3")

    # a second, column-stable upsert into a DIFFERENT bucket set must not
    # lose the evolved column for the merge (pinned-schema target read)
    up2 = spark.createDataFrame([("k0", -1)], "k string, v int")
    upsert_parquet(spark, path, up2, key="k")
    rows2 = {r["k"]: (r["v"], r["extra"]) for r in read_keyed_table(spark, path).collect()}
    assert rows2["k0"] == (-1, None)
    assert rows2["k3"] == (99, "hello")

    # compaction keeps the evolved schema too
    compact_keyed_table(spark, path)
    rows3 = {r["k"]: (r["v"], r["extra"]) for r in read_keyed_table(spark, path).collect()}
    assert rows3 == rows2


def test_upsert_type_conflict_rejected(spark, tmp_path):
    path = str(tmp_path / "conflict")
    base = spark.createDataFrame([("a", 1)], "k string, v int")
    write_keyed_table(base, path, key="k", n_buckets=2)
    bad = spark.createDataFrame([("a", "not-an-int")], "k string, v string")
    with pytest.raises(ValueError, match="conflicts with stored type"):
        upsert_parquet(spark, path, bad, key="k")
