"""Round-13 optimization pins (OPTIMIZATION_r13.md): each test guards one
measured optimization — the plan property that makes it real at scale AND
the result identity that makes it safe."""

from __future__ import annotations

from pyspark.sql import functions as F

from es_household_retention_spark_job_spark import plans as P
from es_household_retention_spark_job_spark.clock import (
    TESTDATA_AS_OF,
    add_years,
    epoch_ms,
)
from es_household_retention_spark_job_spark.entry_queries import (
    EXTRA_QUERIES,
    QUERIES,
)
from es_household_retention_spark_job_spark.operators import retention as R
from es_household_retention_spark_job_spark.sources.tpch import (
    RAW_ADMIT_TS,
    retention_inputs,
)

from .conftest import SF_DIR


def q(spark, name):
    fn = QUERIES.get(name) or EXTRA_QUERIES[name]
    return fn(spark, SF_DIR)


# --------------------------------------------------------------------------
# admit-window parquet pushdown (guide §6: derived-column filters never
# reach PushedFilters; the raw-column twin predicate does)
# --------------------------------------------------------------------------


def test_admit_window_reaches_orders_scan(spark):
    for name in ("retention_phase1", "retention_phase2", "has_child_semi"):
        df = q(spark, name)
        P.assert_filter_pushed(df, "o_orderdate")


def test_admit_window_equivalent_to_derived_filter(spark):
    """The raw-timestamp range is EXACTLY the derived epoch-ms range — for
    day-aligned bounds (the production as_of) and for arbitrary intra-day
    bounds (where ceil/floor day rounding must not widen the window)."""
    _, encounter = retention_inputs(spark, SF_DIR)
    assert RAW_ADMIT_TS in encounter.columns
    day = 86_400_000
    cases = [
        (epoch_ms(add_years(TESTDATA_AS_OF, -5)), epoch_ms(TESTDATA_AS_OF)),
        # non-aligned: lo mid-day (must EXCLUDE lo's day), hi mid-day
        # (must INCLUDE hi's day start)
        (epoch_ms(add_years(TESTDATA_AS_OF, -3)) + 123_456,
         epoch_ms(add_years(TESTDATA_AS_OF, -1)) + 7_200_000),
        # degenerate single-day window
        (epoch_ms(add_years(TESTDATA_AS_OF, -2)),
         epoch_ms(add_years(TESTDATA_AS_OF, -2))),
    ]
    for i, (lo, hi) in enumerate(cases):
        assert lo % day == 0 if i == 0 else True  # production case is aligned
        with_raw = (
            encounter.where(R.admit_window(encounter, lo, hi))
            .select("encounter_id")
        )
        plain = (
            encounter.where(F.col("admit_date").between(lo, hi))
            .select("encounter_id")
        )
        got = sorted(r[0] for r in with_raw.collect())
        want = sorted(r[0] for r in plain.collect())
        assert got == want, (lo, hi, len(got), len(want))
        if i == 0:  # the production 5y window must actually match rows
            assert got


def test_admit_window_without_raw_column_falls_back(spark):
    """Production encounter tables (plain stored admit_date) don't carry the
    derivation-internal column — the helper must degrade to the plain
    between (which pushes down by itself there)."""
    _, encounter = retention_inputs(spark, SF_DIR)
    bare = encounter.drop(RAW_ADMIT_TS)
    lo = epoch_ms(add_years(TESTDATA_AS_OF, -5))
    hi = epoch_ms(TESTDATA_AS_OF)
    got = sorted(
        r[0]
        for r in bare.where(R.admit_window(bare, lo, hi))
        .select("encounter_id")
        .collect()
    )
    want = sorted(
        r[0]
        for r in encounter.where(F.col("admit_date").between(lo, hi))
        .select("encounter_id")
        .collect()
    )
    assert got == want


# --------------------------------------------------------------------------
# pack_history: (household, person_id) grouping rides the phase-1 stream's
# hash(household) partitioning — no exchange for the packed arrays
# (guide §2.4)
# --------------------------------------------------------------------------


def test_pack_history_stats_shuffle_count(spark):
    # was 4 before round 13: the pack's final regroup exchanged the packed
    # arrays; grouping on (household, person_id) satisfies the distribution
    # already established by the islands chain
    assert P.count_shuffles(q(spark, "pack_history_stats")) == 3


def test_pack_history_identical_to_single_key_grouping(spark):
    person, encounter = retention_inputs(spark, SF_DIR)
    final = R.phase1(person, encounter, "HOUSEHOLD", TESTDATA_AS_OF, cache=False)
    packed_new = R.pack_history(final)
    # dropping the household column forces the pre-round-13 single-key path
    packed_old = R.pack_history(final.drop("household"))
    new = {r["person_id"]: r["household_retention_history"]
           for r in packed_new.collect()}
    old = {r["person_id"]: r["household_retention_history"]
           for r in packed_old.collect()}
    assert new == old and new


# --------------------------------------------------------------------------
# multimodal: only (doc_id, payload) crosses the JVM->Python boundary
# (guide §4.1 — mapInPandas is opaque; an unprojected input ships every
# column through Arrow)
# --------------------------------------------------------------------------


def test_mapinpandas_ships_only_needed_columns(spark):
    for name in ("media_frames", "media_features"):
        plan = P.explain_str(q(spark, name))
        line = next(l for l in plan.splitlines() if "MapInPandas" in l)
        assert "meta#" not in line, f"{name} ships meta through Arrow:\n{line}"
