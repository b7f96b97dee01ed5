"""Round-5 skew stress (SCALING.md): run the skew-exposed operators on the
sf1 rehearsal corpus and on the deliberately-skewed variant
(tools/gen_sf1_skew.py), recording wall time and the heaviest stage's
task-duration spread (max vs p50 task, from the UI REST API) — the
evidence that the skew-safe dedup, AQE skew handling, and the df-capped /
banded dedup paths hold their wall-time shape under a x1000 hot key.

Usage: python tools/skew_stress.py [base=/tmp/sf1] [skew=/tmp/sf1skew]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

BASE = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
SKEW = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1skew"
UI = "http://localhost:4040"


def _get(path: str):
    with urllib.request.urlopen(f"{UI}{path}", timeout=10) as r:
        return json.loads(r.read())


def app_id() -> str:
    return _get("/api/v1/applications")[0]["id"]


def stage_keys(app: str) -> set[tuple[int, int]]:
    return {
        (s["stageId"], s["attemptId"])
        for s in _get(f"/api/v1/applications/{app}/stages?status=complete")
    }


def heaviest_stage_spread(app: str, new_keys: set[tuple[int, int]]) -> dict:
    """(max task, p50 task) of the stage with the largest max task time."""
    worst = {"stage": None, "n_tasks": 0, "task_p50_s": 0.0, "task_max_s": 0.0}
    for sid, att in new_keys:
        try:
            q = _get(
                f"/api/v1/applications/{app}/stages/{sid}/{att}/taskSummary"
                "?quantiles=0.5,1.0"
            )
        except Exception:
            continue
        p50, mx = (d / 1000.0 for d in q["duration"])
        if mx > worst["task_max_s"]:
            st = _get(f"/api/v1/applications/{app}/stages/{sid}/{att}?details=false")
            n = st[0]["numTasks"] if isinstance(st, list) else st["numTasks"]
            worst = {
                "stage": sid,
                "n_tasks": n,
                "task_p50_s": round(p50, 2),
                "task_max_s": round(mx, 2),
            }
    return worst


def main() -> None:
    from es_household_retention_spark_job_spark.session import get_spark
    from es_household_retention_spark_job_spark.entry_queries import (
        EXTRA_QUERIES,
        QUERIES,
    )
    from es_household_retention_spark_job_spark.clock import TESTDATA_AS_OF
    from es_household_retention_spark_job_spark.operators import retention as R
    from es_household_retention_spark_job_spark.sources.tpch import retention_inputs

    spark = get_spark(
        app_name="skew-stress",
        cpus=32,
        shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "true"},
    )
    app = app_id()
    reg = {**QUERIES, **EXTRA_QUERIES}

    def phase1_unsafe(spark, sf_dir):
        person, encounter = retention_inputs(spark, sf_dir)
        return R.phase1(
            person, encounter, "HOUSEHOLD", TESTDATA_AS_OF, skew_safe=False
        )

    runners = {
        "retention_phase1": reg["retention_phase1"],
        "retention_phase1_unsafe": phase1_unsafe,
        "dedup_minhash_lsh": reg["dedup_minhash_lsh"],
        "dedup_ngram_jaccard": reg["dedup_ngram_jaccard"],
        "dedup_clusters": reg["dedup_clusters"],
        "embedding_neardup": reg["embedding_neardup"],
        # per-key-window operators vs the mega-user stressor: plain shows
        # the serial-task exposure, chunked the skew-safe rewrite
        "sessionize_events": reg["sessionize_events"],
        "sessionize_events_chunked": reg["sessionize_events_chunked"],
        "asof_purchase_view": reg["asof_purchase_view"],
        "asof_purchase_view_chunked": reg["asof_purchase_view_chunked"],
    }

    results: dict[str, dict] = {}
    for sf_name, sf_dir in (("base", BASE), ("skew", SKEW)):
        for name, fn in runners.items():
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warm
            before = stage_keys(app)
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            wall = time.perf_counter() - t0
            spread = heaviest_stage_spread(app, stage_keys(app) - before)
            results.setdefault(name, {})[sf_name] = {
                "wall_s": round(wall, 2),
                "rows": n,
                **spread,
            }
            print(f"{sf_name}/{name}: {results[name][sf_name]}", flush=True)

    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
