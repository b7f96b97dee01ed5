"""Regenerate PLANS.md — formatted physical plans of the headline queries
at sf0.001 (plan shape is scale-invariant)."""

import io
import sys

sys.path.insert(0, "/root/repo")

#: extra-registry queries whose plans are worth pinning next to the 50
#: driver queries (skew-safe rewrites + the iterative/funnel shapes)
EXTRA_PLANS = [
    "asof_purchase_view_chunked",
    "sessionize_events_auto",
    "asof_purchase_view_auto",
    "funnel_view_click_purchase",
    "cube_revenue",
    "bm25_search",
    "hybrid_mlt_search",
    "hybrid_mlt_search_ann",
    "bm25_search_indexed",
    "knn_ivf_indexed",
    "chunk_documents",
    "ngram_lm_score",
    "neardup_probe_indexed",
    # demoted to extras in round 10 (driver slots freed for the sink
    # surface) but their plan pins stay:
    "retained_months_band",
    "sessionize_events_chunked",
    "cohort_retention_matrix",
    "stratified_sample",
    # round-10 additions (the two folds were PROMOTED to driver slots in
    # round 11 and print with the registry; the cow twin stays an extra)
    "sink_change_feed_cow",
    # demoted to extras in round 11 (slots freed for the fold rows) —
    # plan pins stay:
    "session_window_events",
    "null_semantics_battery",
    # round-12: sink_partial_delta and knn_pq_indexed PROMOTED to driver
    # slots (print with the registry); the demoted twins keep their pins:
    "pivot_event_counts",
    "resample_hourly_gapfill",
    # round-11 additions: the PQ tier and the new fold read surfaces
    "knn_ivfpq",
    "sink_fold_percentile",
    "sink_fold_topk",
    # round-12b: the filtered-search family and the maintained clusters
    "knn_filtered",
    "knn_ivf_filtered",
    "knn_filtered_lang",
    "dedup_clusters_incremental",
    # round-13: knn_filtered_auto PROMOTED to a driver slot (prints with
    # the registry); knn_pq_indexed returned to extras — its pin stays:
    "knn_pq_indexed",
]

HEADER = """# PLANS — physical plans, auto-generated (tools/gen_plans.py)

All 50 driver-registry queries plus selected extras (the skew-safe chunked
rewrites, funnel, CUBE) at sf0.001 inputs — plan shape is scale-invariant.
(pagerank_customer_part is omitted: its eager per-round checkpoints make
the final recorded plan a trivial RDD scan.)
What to look for, per SURVEY §4: `PushedFilters` /
`ReadSchema` on every scan, `BroadcastHashJoin`/`BroadcastNestedLoopJoin`
for dimension/grid sides, few `Exchange hashpartitioning` nodes (phase1 has
exactly 3 — skew-safe compound-key pre-dedup, the household exchange that
keys the whole downstream chain, and the persons-distinct), and no
`CartesianProduct`.
"""


def _normalize(plan: str) -> str:
    """Strip run-volatile tokens so a regeneration diffs clean except for
    GENUINE plan changes: plan ids renumber per session, JVM identity
    hashes (`[B@3b217868`, `UnsafeArrayData@…`) and the per-run /tmp
    fixture paths differ every run — with them pinned, a real regression
    (a new Exchange) drowns in ~1750 lines of churn (review finding)."""
    import re

    plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
    plan = re.sub(r"@[0-9a-f]{6,}", "@ID", plan)
    plan = re.sub(r"/tmp/spark_graft_\w+", "/tmp/FIXTURE", plan)
    plan = re.sub(r"/tmp/[0-9a-zA-Z_\-]*ann[0-9a-zA-Z_\-]*", "/tmp/FIXTURE", plan)
    return plan


def main() -> None:
    from es_household_retention_spark_job_spark.session import get_spark
    from es_household_retention_spark_job_spark.entry_queries import (
        EXTRA_QUERIES,
        QUERIES,
    )
    from es_household_retention_spark_job_spark import plans as P

    REG = {**QUERIES, **EXTRA_QUERIES}
    # a name promoted into the driver registry must LEAVE this list, or
    # its section would print twice and ship unnoticed (review finding)
    dup = set(EXTRA_PLANS) & set(QUERIES)
    assert not dup, f"EXTRA_PLANS ∩ driver QUERIES: {sorted(dup)}"
    spark = get_spark(app_name="plans", cpus=8, shuffle_partitions=16)
    out = [HEADER]
    for name in [*QUERIES, *EXTRA_PLANS]:
        df = REG[name](spark, "/root/testdata/sf0.001")
        n_shuffles = P.count_shuffles(df)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = _normalize(df._jdf.queryExecution().explainString(mode).rstrip())
        out.append(f"\n## {name}\n\nshuffles: {n_shuffles}\n\n```text\n{plan}\n```\n")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
