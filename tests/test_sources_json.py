"""S3 ingestion readers: NDJSON person/encounter documents → typed frames
with the full nested history schema preserved."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from es_household_retention_spark_job_spark.sources.json_docs import (
    read_encounter_json,
    read_person_json,
)


def test_person_ndjson_roundtrip_with_nested_history(spark, tmp_path):
    docs = [
        {
            "person_id": "P1",
            "client_code": "DEMO",
            "household": {"household_id": "H1"},
            "household_retention_history": [
                {
                    "date_range": {"gte": 1000, "lte": 2000},
                    "date_range_alt": {
                        "gte": "2025-01-01",
                        "lte": "2025-02-28 23:59:59",
                    },
                    "retained": True,
                }
            ],
        },
        {"person_id": "P2", "client_code": "DEMO", "household": None},
    ]
    p = tmp_path / "person.json"
    p.write_text("\n".join(json.dumps(d) for d in docs) + "\n")
    got = read_person_json(spark, str(p))
    rows = {r.person_id: r for r in got.collect()}
    assert rows["P1"].household.household_id == "H1"
    h = rows["P1"].household_retention_history[0]
    assert (h.date_range.gte, h.date_range.lte, h.retained) == (1000, 2000, True)
    assert rows["P2"].household is None
    assert rows["P2"].household_retention_history is None


def test_encounter_ndjson_roundtrip(spark, tmp_path):
    docs = [
        {
            "encounter_id": "E1",
            "person_id": "P1",
            "client_code": "DEMO",
            "admit_date": 1740000000000,
        }
    ]
    p = tmp_path / "encounter.json"
    p.write_text("\n".join(json.dumps(d) for d in docs) + "\n")
    got = read_encounter_json(spark, str(p))
    r = got.first()
    assert (r.encounter_id, r.person_id, r.admit_date) == ("E1", "P1", 1740000000000)
    assert dict(got.dtypes)["admit_date"] == "bigint"
