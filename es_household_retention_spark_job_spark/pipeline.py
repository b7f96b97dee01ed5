"""Two-phase retention orchestration (HRP:126-127 ``main`` flow) over a
keyed parquet person store.

Phase 1 (HRP:305-648): guard count (C2) -> flagship pipeline -> pack nested
history (A5) -> upsert into the person table (S7).
Phase 2 (HRP:650-809): invariant throw if phase 1 incomplete (C3) -> guard
count -> constant not-retained stamp -> pack -> upsert.

Because the upsert writes ``household_retention_history``, re-running either
phase is a no-op: processed persons now fail the P8 "unprocessed" predicate
(idempotence, tested in tests/test_upsert_pipeline.py).
"""

from __future__ import annotations

import logging
from datetime import datetime

from pyspark.sql import SparkSession

from .operators import retention as R
from .schemas import ENCOUNTER, PERSON, validate
from .sinks.upsert import read_keyed_table, upsert_parquet

log = logging.getLogger("retention.pipeline")


def _load_inputs(spark: SparkSession, person_path: str, encounter_path: str):
    """Read + contract-check both inputs at the pipeline boundary (SURVEY
    §1.3: explicit schemas, fail fast on drift instead of mid-pipeline)."""
    person = read_keyed_table(spark, person_path)
    encounter = spark.read.parquet(encounter_path)
    validate(person, PERSON, allow_extra=True)
    validate(encounter, ENCOUNTER, allow_extra=True)
    return person, encounter


def run_phase1(
    spark: SparkSession,
    person_path: str,
    encounter_path: str,
    client_code: str,
    as_of: datetime,
    strategy: str = "window",
) -> int:
    """Returns the number of persons processed (0 = skipped, C2)."""
    person, encounter = _load_inputs(spark, person_path, encounter_path)

    persons = R.eligible_persons(person, client_code)
    n = persons.count()  # S6 guard (HRP:627-628)
    log.info("phase1: %d persons without retention", n)
    if n == 0:
        log.info("phase1: nothing to process — skipping (HRP:643-645)")
        return 0

    final = R.phase1(person, encounter, client_code, as_of, strategy=strategy)
    packed = R.pack_history(final)
    upsert_parquet(spark, person_path, packed, key="person_id")
    log.info("phase1: wrote retention history for %d persons", n)
    return n


def run_phase2(
    spark: SparkSession,
    person_path: str,
    encounter_path: str,
    client_code: str,
    as_of: datetime,
) -> int:
    """Returns the number of persons stamped not-retained (0 = skipped).
    Raises HouseholdRetentionNotReadyError if phase 1 is incomplete (C3)."""
    person, encounter = _load_inputs(spark, person_path, encounter_path)

    R.check_phase2_invariant(person, encounter, client_code, as_of)

    persons = R.eligible_persons(person, client_code)
    n = persons.count()
    log.info("phase2: %d persons still without retention", n)
    if n == 0:
        log.info("phase2: nothing to process — skipping (HRP:802-804)")
        return 0

    stamped = R.phase2(persons, as_of)
    packed = R.pack_history(stamped)
    upsert_parquet(spark, person_path, packed, key="person_id")
    log.info("phase2: stamped %d persons not-retained", n)
    return n


def run_retention(
    spark: SparkSession,
    person_path: str,
    encounter_path: str,
    client_code: str,
    as_of: datetime,
) -> dict[str, int]:
    n1 = run_phase1(spark, person_path, encounter_path, client_code, as_of)
    n2 = run_phase2(spark, person_path, encounter_path, client_code, as_of)
    return {"phase1_persons": n1, "phase2_persons": n2}
