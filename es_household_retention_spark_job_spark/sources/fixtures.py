"""Hand-built edge-case households (FIXTURES.md) with a pinned
``as_of = 2026-08-01`` — every temporal boundary the reference's semantics
turn on: the date-truncated 365-day look-back (HRP:513,531-532), strict
same-timestamp inequality (HRP:531), grid-edge months, the max-month
terminal island (HRP:580,586), and the P8 three-valued nested predicate.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from ..schemas import ENCOUNTER, PERSON

FIXTURE_AS_OF = datetime(2026, 8, 1, tzinfo=timezone.utc)
FIXTURE_CLIENT = "DEMO"


def _ms(y: int, m: int, d: int, h: int = 0, mi: int = 0, s: int = 0) -> int:
    return int(datetime(y, m, d, h, mi, s, tzinfo=timezone.utc).timestamp() * 1000)


def _person(pid: str, hh: str | None, history=None, client: str = FIXTURE_CLIENT):
    return (pid, client, {"household_id": hh}, history)


PROCESSED_HISTORY = [
    {
        "date_range": {"gte": 0, "lte": 1},
        "date_range_alt": {"gte": "1970-01-01", "lte": "1970-01-01 00:00:00"},
        "retained": False,
    }
]
NULL_RETAINED_HISTORY = [
    {
        "date_range": {"gte": 0, "lte": 1},
        "date_range_alt": {"gte": "1970-01-01", "lte": "1970-01-01 00:00:00"},
        "retained": None,  # still "unprocessed" per nested-exists semantics
    }
]

PERSONS = [
    _person("P_S1", "HH_SINGLE"),
    _person("P_R1", "HH_RUN"),
    _person("P_G1", "HH_GAP"),
    _person("P_B1", "HH_B365"),
    _person("P_B2", "HH_B366"),
    _person("P_D1", "HH_SAMEDAY"),
    _person("P_M1", "HH_MULTI"),
    _person("P_M2", "HH_MULTI"),
    _person("P_M3", "HH_MULTI"),  # no own encounters; inherits household ranges
    _person("P_E1", "HH_EDGE"),
    _person("P_C1", "HH_CURMONTH"),
    _person("P_X1", "HH_DONE", history=PROCESSED_HISTORY),  # P8: excluded
    _person("P_N1", None),  # P5: excluded (null household)
    _person("P_Y1", "HH_NULLRET", history=NULL_RETAINED_HISTORY),  # unprocessed
    _person("P_Z1", "HH_EMPTYARR", history=[]),  # unprocessed
    _person("P_O1", "HH_OTHERCLIENT", client="OTHER"),  # P4: excluded
]

ENCOUNTERS = [
    # HH_SINGLE — one encounter: never retained
    ("E_S1", "P_S1", FIXTURE_CLIENT, _ms(2025, 3, 15, 10)),
    # out-of-scan (older than now-5y = 2021-08-01): dropped by P6
    ("E_S2", "P_S1", FIXTURE_CLIENT, _ms(2021, 1, 1, 10)),
    # client mismatch: dropped by P4
    ("E_S3", "P_S1", "OTHER", _ms(2025, 4, 15, 10)),
    # HH_RUN — monthly 2024-01..06: retained 2024-02..06
    *[
        (f"E_R{m}", "P_R1", FIXTURE_CLIENT, _ms(2024, m, 10, 9))
        for m in range(1, 7)
    ],
    # HH_GAP — 2023-01/02 then 2025-01/02: retained 2023-02 and 2025-02 only
    ("E_G1", "P_G1", FIXTURE_CLIENT, _ms(2023, 1, 5, 9)),
    ("E_G2", "P_G1", FIXTURE_CLIENT, _ms(2023, 2, 5, 9)),
    ("E_G3", "P_G1", FIXTURE_CLIENT, _ms(2025, 1, 5, 9)),
    ("E_G4", "P_G1", FIXTURE_CLIENT, _ms(2025, 2, 5, 9)),
    # HH_B365 — 365d + 1h apart; date-truncated threshold ⇒ RETAINED
    # (cur 2025-01-09 09:00, minus1 = date(cur)-365 = 2024-01-10 00:00,
    #  prev 2024-01-10 08:00 >= threshold — the HRP:513 quirk)
    ("E_B1a", "P_B1", FIXTURE_CLIENT, _ms(2024, 1, 10, 8)),
    ("E_B1b", "P_B1", FIXTURE_CLIENT, _ms(2025, 1, 9, 9)),
    # HH_B366 — 366d apart ⇒ NOT retained (prev < date(cur)-365 = 2024-01-11)
    ("E_B2a", "P_B2", FIXTURE_CLIENT, _ms(2024, 1, 10, 8)),
    ("E_B2b", "P_B2", FIXTURE_CLIENT, _ms(2025, 1, 10, 9)),
    # HH_SAMEDAY — identical timestamps dedup to one (strict >, HRP:531);
    # two different days in 2024-07 ⇒ 2024-07 retained, 2024-05 not
    ("E_D1", "P_D1", FIXTURE_CLIENT, _ms(2024, 5, 5, 10)),
    ("E_D2", "P_D1", FIXTURE_CLIENT, _ms(2024, 5, 5, 10)),
    ("E_D3", "P_D1", FIXTURE_CLIENT, _ms(2024, 7, 1, 9)),
    ("E_D4", "P_D1", FIXTURE_CLIENT, _ms(2024, 7, 20, 9)),
    # HH_MULTI — encounters split across persons; household-level retention
    ("E_M1", "P_M1", FIXTURE_CLIENT, _ms(2024, 3, 10, 9)),
    ("E_M2", "P_M2", FIXTURE_CLIENT, _ms(2024, 4, 12, 9)),
    # HH_EDGE — pre-grid encounter (in 5y scan) makes first grid month retained
    ("E_E1", "P_E1", FIXTURE_CLIENT, _ms(2022, 7, 15, 9)),
    ("E_E2", "P_E1", FIXTURE_CLIENT, _ms(2022, 8, 20, 9)),
    # HH_CURMONTH — encounter exactly at as_of (lte inclusive) with prior
    ("E_C1", "P_C1", FIXTURE_CLIENT, _ms(2026, 7, 10, 9)),
    ("E_C2", "P_C1", FIXTURE_CLIENT, _ms(2026, 8, 1, 0)),
    # HH_DONE — encounter exists but person already processed
    ("E_X1", "P_X1", FIXTURE_CLIENT, _ms(2025, 1, 1, 9)),
    # orphan encounter (no person row): dropped by the inner join
    ("E_GHOST", "P_GHOST", FIXTURE_CLIENT, _ms(2025, 1, 1, 9)),
]

# Expected collapsed islands per household: (start_date, retained) in order.
EXPECTED_ISLANDS = {
    "HH_SINGLE": [("2022-08-01", False)],
    "HH_RUN": [("2022-08-01", False), ("2024-02-01", True), ("2024-07-01", False)],
    "HH_GAP": [
        ("2022-08-01", False),
        ("2023-02-01", True),
        ("2023-03-01", False),
        ("2025-02-01", True),
        ("2025-03-01", False),
    ],
    "HH_B365": [("2022-08-01", False), ("2025-01-01", True), ("2025-02-01", False)],
    "HH_B366": [("2022-08-01", False)],
    "HH_SAMEDAY": [("2022-08-01", False), ("2024-07-01", True), ("2024-08-01", False)],
    "HH_MULTI": [("2022-08-01", False), ("2024-04-01", True), ("2024-05-01", False)],
    "HH_EDGE": [("2022-08-01", True), ("2022-09-01", False)],
    "HH_CURMONTH": [("2022-08-01", False), ("2026-08-01", True)],
    "HH_NULLRET": [("2022-08-01", False)],
    "HH_EMPTYARR": [("2022-08-01", False)],
}


def fixture_frames(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    person = spark.createDataFrame(PERSONS, schema=PERSON)
    encounter = spark.createDataFrame(ENCOUNTERS, schema=ENCOUNTER)
    return person, encounter


def write_fixture_store(spark: SparkSession, base_dir: str) -> tuple[str, str]:
    """Plain-parquet fixture store (oracle-readable)."""
    person, encounter = fixture_frames(spark)
    p_path, e_path = f"{base_dir}/person.parquet", f"{base_dir}/encounter.parquet"
    person.write.mode("overwrite").parquet(p_path)
    encounter.write.mode("overwrite").parquet(e_path)
    return p_path, e_path
