"""Physical-plan assertions (SURVEY §4): the properties that keep these
queries viable at 100 TB — pushdown, pruning, broadcast strategy, no
cartesian blowups, whole-stage codegen — asserted per headline query so a
plan regression fails CI."""

from __future__ import annotations

import pytest

from es_household_retention_spark_job_spark import plans as P
from es_household_retention_spark_job_spark.entry_queries import (
    EXTRA_QUERIES,
    QUERIES,
)

from .conftest import SF_DIR


def q(spark, name):
    fn = QUERIES.get(name) or EXTRA_QUERIES[name]  # plan pins cover both gates
    return fn(spark, SF_DIR)


def test_scan_pushdown_filters_and_pruning(spark):
    df = q(spark, "scan_pushdown_lineitem")
    # range + equality predicates reach the parquet scan
    P.assert_filter_pushed(df, "l_quantity")
    P.assert_filter_pushed(df, "l_returnflag")
    P.assert_filter_pushed(df, "l_shipdate")
    # projection pruning: untouched wide columns never leave the scan
    P.assert_column_pruned(df, "l_comment")
    P.assert_wholestage_codegen(df)


def test_star_join_broadcasts_dimensions(spark):
    df = q(spark, "multiway_join_revenue")
    P.assert_broadcast_join(df, at_least=2)  # nation and region
    P.assert_no_cartesian(df)


def test_retention_phase1_plan_shape(spark):
    df = q(spark, "retention_phase1")
    # month grid (49 rows) must broadcast, never shuffle the household side
    P.assert_broadcast_join(df, at_least=1)
    P.assert_no_cartesian(df)
    # three exchanges, each earning its keep: the skew-safe compound-key
    # pre-dedup (spreads a mega-household's raw volume), the household_id
    # exchange that keys the whole downstream chain (lag window, month
    # dedup, set-agg, grid join, rank window — none re-exchange), and the
    # persons-distinct. A fourth shuffle = a regression.
    assert P.count_shuffles(df) == 3
    # client_code filter is pushed into both person and encounter scans
    P.assert_filter_pushed(df, "c_mktsegment")
    # codegen check needs a non-adaptive plan (AQE defers codegen decisions)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        P.assert_wholestage_codegen(q(spark, "retention_phase1"))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_topk_uses_take_ordered(spark):
    plan = P.explain_str(q(spark, "topk_orders"))
    assert "TakeOrderedAndProject" in plan, plan  # no global sort at scale


def test_window_battery_single_shuffle(spark):
    # same partition key for every window spec → exactly one exchange
    assert P.count_shuffles(q(spark, "window_battery_events")) == 1


def test_knn_bruteforce_broadcasts_queries(spark):
    df = q(spark, "knn_bruteforce")
    plan = P.explain_str(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    # corpus side must NOT be exchanged before the join (map-side scoring)
    before_join = plan.split("Join")[0]
    assert "Exchange hashpartitioning" not in before_join, plan


def test_minhash_no_explode_before_banding(spark):
    """Signatures are computed with array expressions, not explode+groupBy:
    the only wide ops are the band self-join and the verification joins."""
    df = q(spark, "dedup_minhash_lsh")
    P.assert_no_cartesian(df)


@pytest.mark.parametrize(
    "name",
    [
        "retention_phase2",
        "sessionize_events",
        "asof_purchase_view",
        "dedup_exact",
        # the registered near-dup is the LSH-bucketed path: a crossJoin here
        # means the quadratic variant leaked back into the driver registry
        "embedding_neardup",
    ],
)
def test_no_cartesian_anywhere(spark, name):
    P.assert_no_cartesian(q(spark, name))


def test_doc_repetition_no_shuffle(spark):
    """The repetition profile is a pure per-row scan — a shuffle here means
    the mode computation regressed to explode+groupBy."""
    from es_household_retention_spark_job_spark.entry_queries import EXTRA_QUERIES

    assert P.count_shuffles(EXTRA_QUERIES["doc_repetition"](spark, SF_DIR)) == 0


def test_decontamination_broadcasts_benchmark(spark):
    """Both benchmark-side tables (inverted index + sizes) broadcast; the
    training corpus side must never hash-shuffle its exploded shingles."""
    from es_household_retention_spark_job_spark.entry_queries import EXTRA_QUERIES

    df = EXTRA_QUERIES["decontaminate_overlap"](spark, SF_DIR)
    P.assert_broadcast_join(df, at_least=2)
    P.assert_no_cartesian(df)
    # the single hash exchange is the (train, bench) pair aggregation
    assert P.count_shuffles(df) == 1


def test_curation_verdict_no_shuffle(spark):
    """The composed quality∧repetition∧language policy is one scan."""
    from es_household_retention_spark_job_spark.entry_queries import EXTRA_QUERIES

    assert P.count_shuffles(EXTRA_QUERIES["curation_verdict"](spark, SF_DIR)) == 0


def test_pii_scrub_no_shuffle(spark):
    """Redaction is a pure per-row regexp map — the whole pass must ride one
    codegen stage with zero exchanges."""
    from es_household_retention_spark_job_spark.entry_queries import EXTRA_QUERIES

    assert P.count_shuffles(EXTRA_QUERIES["pii_scrub"](spark, SF_DIR)) == 0


def test_embedding_quantize_no_shuffle(spark):
    """int8 quantization of the embedding store is a pure map."""
    assert P.count_shuffles(q(spark, "embedding_quantize")) == 0


def test_centroid_eval_broadcasts_centroids(spark):
    """The |labels|-row centroid table broadcasts; the corpus side computes
    distances map-side (its only exchange is the per-vector argmin window +
    the final per-label rollup)."""
    from es_household_retention_spark_job_spark.entry_queries import EXTRA_QUERIES

    df = EXTRA_QUERIES["centroid_eval"](spark, SF_DIR)
    assert "BroadcastNestedLoopJoin" in P.explain_str(df)
    P.assert_no_cartesian(df)


def test_boilerplate_profile_no_cartesian(spark):
    from es_household_retention_spark_job_spark.entry_queries import EXTRA_QUERIES

    df = EXTRA_QUERIES["boilerplate_profile"](spark, SF_DIR)
    P.assert_no_cartesian(df)


def test_balance_sources_target_stays_in_plan(spark):
    """The min-source-count target is aggregated and broadcast inside the
    plan — no collect, no cartesian blowup."""
    from es_household_retention_spark_job_spark.entry_queries import EXTRA_QUERIES

    df = EXTRA_QUERIES["balance_sources"](spark, SF_DIR)
    P.assert_no_cartesian(df)
    # the 1-row target joins as a broadcast nested loop, never a shuffle
    assert "BroadcastNestedLoopJoin" in P.explain_str(df)


def test_minhash_lsh_plan_stays_bucketed(spark):
    """The band-key self-join must stay a single-exchange bucketed plan
    (signatures map-side, one shuffle for the candidate join at this input
    size) with no cartesian blowup — the guard for the xxhash64 band-key
    path. The verify-spread repartition (dedup.py, sf1 skew stress in
    SCALING.md) shares this exchange: Catalyst collapses it into the
    distinct's hash exchange on the same keys, so parallelism is pinned
    WITHOUT an extra shuffle."""
    df = q(spark, "dedup_minhash_lsh")
    P.assert_no_cartesian(df)
    assert P.count_shuffles(df) == 1


def test_media_features_no_shuffle(spark):
    """The multimodal feature scan (mapInPandas + codec) is a pure map —
    a shuffle here means the Arrow plumbing picked up a spurious
    repartition."""
    assert P.count_shuffles(q(spark, "media_features")) == 0


def test_funnel_single_user_exchange_plus_stage_count(spark):
    """The chained stage-window funnel must reuse ONE user-partition
    exchange for all three window passes and the per-user agg; the only
    other shuffle is the 4-row stage count."""
    from es_household_retention_spark_job_spark.entry_queries import EXTRA_QUERIES

    df = EXTRA_QUERIES["funnel_view_click_purchase"](spark, SF_DIR)
    assert P.count_shuffles(df) == 2


def test_cube_uses_expand_one_exchange(spark):
    """CUBE must plan as partial-aggregated Expand (all four grouping sets
    in one pass) with a single exchange — not a union of four scans."""
    from es_household_retention_spark_job_spark.entry_queries import EXTRA_QUERIES

    df = EXTRA_QUERIES["cube_revenue"](spark, SF_DIR)
    assert "Expand" in P.explain_str(df, "simple")
    assert P.count_shuffles(df) == 1


def test_chunked_sessionize_never_exchanges_events_by_user_alone(spark):
    """The skew-safe sessionization's full event stream must only exchange
    on (user, chunk); the per-user sequential pass rides the tiny summary
    frame, whose offsets broadcast back. A user-only hashpartitioning of
    the event columns (width > summary) would reintroduce the mega-user
    serialization this operator exists to remove."""
    df = q(spark, "sessionize_events_chunked")
    plan = P.explain_str(df, "simple")
    assert "BroadcastHashJoin" in plan  # offsets join, never a shuffle join
    assert P.count_shuffles(df) <= 4


@pytest.mark.parametrize(
    "name",
    [
        "knn_bruteforce",
        "knn_lsh",
        "knn_ivf_indexed",
        "knn_sq8_indexed",
        "knn_ann_auto",
        "knn_ivfpq",
        "knn_pq_indexed",
        "hybrid_mlt_search_ann",
        "neardup_probe_indexed",
        "dedup_minhash_lsh",
        "knn_filtered",
        "knn_filtered_auto",
        "knn_ivf_filtered",
    ],
)
def test_ann_family_no_wide_keyed_shuffle(spark, name):
    """Round-10 lesson codified (r10 verdict #8): at |Q|=10k a dedup
    planned BEFORE scoring shuffled rows carrying both embeddings
    (~1 KB/row) and filled the disk; deduping the scored 3-column frame
    was ~30x fewer shuffle bytes. The guard walks every keyed exchange in
    the physical plan and asserts no array/map column crosses one —
    pinned for the whole ANN/retrieval family so the regression class
    cannot silently return. (RoundRobin input-spread exchanges are
    exempt: ensure_parallelism's one-time small-input spread, a no-op at
    scale.)"""
    P.assert_no_wide_shuffle(q(spark, name))
