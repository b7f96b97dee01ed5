"""FIXTURES.md edge-case households: explicit expected islands + full-fidelity
oracle over Spark-written NESTED parquet (the P8 three-valued predicate is
evaluated by both engines on the real array<struct> column)."""

from __future__ import annotations

import duckdb
import pytest

from es_household_retention_spark_job_spark import oracle
from es_household_retention_spark_job_spark.operators import retention as R
from es_household_retention_spark_job_spark.sources.fixtures import (
    EXPECTED_ISLANDS,
    FIXTURE_AS_OF,
    FIXTURE_CLIENT,
    fixture_frames,
    write_fixture_store,
)

from .conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("fixture_store")
    p_path, e_path = write_fixture_store(spark, str(base))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW person AS SELECT * FROM read_parquet('{p_path}/*.parquet')")
    con.execute(
        f"CREATE VIEW encounter AS SELECT * FROM read_parquet('{e_path}/*.parquet')"
    )
    yield spark.read.parquet(p_path), spark.read.parquet(e_path), con
    con.close()


def collapsed_df(spark, person, encounter):
    persons = R.eligible_persons(person, FIXTURE_CLIENT)
    encounters = R.eligible_encounters(encounter, FIXTURE_CLIENT, FIXTURE_AS_OF)
    admits = R.person_encounter_admits(persons, encounters)
    base = R.retention_base(
        persons, R.retained_months(admits), R.month_grid(spark, FIXTURE_AS_OF)
    )
    return R.collapse_retention(base, FIXTURE_AS_OF)


def test_expected_islands(spark, store):
    person, encounter, _ = store
    rows = collapsed_df(spark, person, encounter).collect()
    got: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["household"], r["start_date"])):
        got.setdefault(r["household"], []).append((r["start_date"], r["retained"]))
    assert got == EXPECTED_ISLANDS


def test_island_end_dates(spark, store):
    person, encounter, _ = store
    rows = {
        (r["household"], r["start_date"]): r
        for r in collapsed_df(spark, person, encounter).collect()
    }
    # terminal island ends at last second of the grid's max month
    assert rows[("HH_CURMONTH", "2026-08-01")]["end_date"] == "2026-08-31 23:59:59"
    # replicated reference quirk (HRP:580,586): state change AT max month
    # stretches the preceding island's end through the max month (overlap)
    assert rows[("HH_CURMONTH", "2022-08-01")]["end_date"] == "2026-08-31 23:59:59"
    # mid-chain island ends at last second of its final month (HRP:571-573)
    assert rows[("HH_RUN", "2024-02-01")]["end_date"] == "2024-06-30 23:59:59"
    r = rows[("HH_RUN", "2024-02-01")]
    assert r["start_date_epoch"] == 1706745600000  # 2024-02-01 UTC
    assert r["end_date_epoch"] == 1719791999000  # 2024-06-30 23:59:59 UTC


def test_phase1_matches_nested_oracle(spark, store):
    person, encounter, con = store
    out = R.phase1(person, encounter, FIXTURE_CLIENT, FIXTURE_AS_OF, cache=False)
    prelude = oracle.fixture_cte(FIXTURE_CLIENT, FIXTURE_AS_OF)
    assert_matches_oracle(
        out, con, oracle.phase1_sql(FIXTURE_CLIENT, FIXTURE_AS_OF, prelude), min_rows=10
    )


def test_collapse_matches_reference_literal_sql(spark, store):
    """Faithfulness anchor: the island-id rewrite vs the reference's LITERAL
    4-window/3-join SQL (HRP:557-590) run in DuckDB on the same base."""
    person, encounter, con = store
    out = collapsed_df(spark, person, encounter)
    prelude = oracle.fixture_cte(FIXTURE_CLIENT, FIXTURE_AS_OF)
    assert_matches_oracle(
        out,
        con,
        oracle.reference_collapse_sql(FIXTURE_CLIENT, FIXTURE_AS_OF, prelude),
        min_rows=10,
    )


def test_multiperson_household_inherits_identical_ranges(spark, store):
    person, encounter, _ = store
    out = R.phase1(person, encounter, FIXTURE_CLIENT, FIXTURE_AS_OF, cache=False)
    by_person = {
        pid: sorted(
            (r["start_date"], r["end_date"], r["retained"])
            for r in out.collect()
            if r["person_id"] == pid
        )
        for pid in ("P_M1", "P_M2", "P_M3")
    }
    assert by_person["P_M1"] == by_person["P_M2"] == by_person["P_M3"]
    assert len(by_person["P_M1"]) == 3


def test_exclusions(spark, store):
    person, encounter, _ = store
    out = R.phase1(person, encounter, FIXTURE_CLIENT, FIXTURE_AS_OF, cache=False)
    ids = {r["person_id"] for r in out.select("person_id").distinct().collect()}
    assert "P_X1" not in ids  # processed (P8)
    assert "P_N1" not in ids  # null household (P5)
    assert "P_O1" not in ids  # other client (P4)
    assert {"P_Y1", "P_Z1"} <= ids  # null-retained / empty array are unprocessed


def test_chunked_sessionization_boundary_edges(spark):
    """sessionize_chunked must equal sessionize on hand-built boundary
    shapes: a session spanning THREE day-chunks, a boundary gap of exactly
    gap_seconds (still one session), one of gap_seconds+1 (split), and a
    multi-chunk quiet user. Also: chunk_seconds <= gap is rejected."""
    import pytest
    from es_household_retention_spark_job_spark.operators.sessionize import (
        sessionize,
        sessionize_chunked,
    )

    rows = [
        # user 1: one session crossing two midnights (events 10 min apart)
        *[(1, f"2026-01-0{d} 23:5{m}:00") for d in (1, 2) for m in (0, 5)],
        (1, "2026-01-02 00:05:00"),
        (1, "2026-01-03 00:05:00"),
        # user 4: ONE session spanning THREE full day-chunks (an event every
        # 29 min from 02-01 23:50 through 02-03 01:30) — the chained merge
        # where the middle chunk's ONLY session merges backward AND
        # continues forward (contributed = n_local − merges = 0)
        *[
            (4, f"2026-02-0{1 + (1430 + 29 * i) // 1440} "
                f"{((1430 + 29 * i) % 1440) // 60:02d}:{(1430 + 29 * i) % 60:02d}:00")
            for i in range(54)
        ],
        # ...followed by a genuinely new session two days later
        (4, "2026-02-05 12:00:00"),
        # user 2: boundary gap exactly 1800s -> SAME session
        (2, "2026-01-01 23:40:00"),
        (2, "2026-01-02 00:10:00"),
        # user 2 later: boundary gap 1801s -> NEW session
        (2, "2026-01-05 23:40:00"),
        (2, "2026-01-06 00:10:01"),
        # user 3: sparse — one event per week (every chunk its own session)
        (3, "2026-01-01 12:00:00"),
        (3, "2026-01-08 12:00:00"),
        (3, "2026-01-15 12:00:00"),
    ]
    from datetime import datetime

    rows = [(u, datetime.strptime(t, "%Y-%m-%d %H:%M:%S")) for u, t in rows]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    plain = {
        (r.user_id, str(r.ts)): r.session_id
        for r in sessionize(df, ["user_id"], "ts", 1800).collect()
    }
    chunked = {
        (r.user_id, str(r.ts)): r.session_id
        for r in sessionize_chunked(df, ["user_id"], "ts", 1800).collect()
    }
    assert plain == chunked
    # pin the interesting shapes directly (not just mutual equality)
    assert chunked[(2, "2026-01-02 00:10:00")] == chunked[(2, "2026-01-01 23:40:00")]
    assert chunked[(2, "2026-01-06 00:10:01")] != chunked[(2, "2026-01-05 23:40:00")]
    assert len({chunked[(3, t)] for t in (
        "2026-01-01 12:00:00", "2026-01-08 12:00:00", "2026-01-15 12:00:00"
    )}) == 3
    # user 4: all 54 chained events share ONE session id; the later event
    # starts session 2 — proving the contributed=0 middle chunk inherited
    # the offset correctly instead of resetting or double-counting
    u4 = {t: sid for (u, t), sid in chunked.items() if u == 4}
    chain_ids = {sid for t, sid in u4.items() if t != "2026-02-05 12:00:00"}
    assert chain_ids == {1}, sorted(set(u4.values()))
    assert u4["2026-02-05 12:00:00"] == 2

    with pytest.raises(ValueError):
        sessionize_chunked(df, ["user_id"], "ts", gap_seconds=1800, chunk_seconds=600)


def test_chunked_sessionization_mega_user_equality(spark):
    """A bot-shaped mega-user (20k events over 30 days, mixed gaps) plus
    normal users: chunked output must equal the plain formulation row for
    row — the skew-safe rewrite changes the plan, never the answer."""
    from pyspark.sql import functions as F
    from es_household_retention_spark_job_spark.operators.sessionize import (
        session_stats,
    )

    base = spark.range(20_000).select(
        F.lit(999).alias("user_id"),
        # deterministic mixed gaps: mostly 2 min, every 97th event jumps 2h
        F.timestamp_seconds(
            F.lit(1_767_225_600)
            + F.col("id") * 120
            + F.floor(F.col("id") / 97) * 7200
        ).alias("ts"),
    )
    others = spark.range(200).select(
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_seconds(F.lit(1_767_225_600) + F.col("id") * 3600).alias("ts"),
    )
    ev = base.unionByName(others)
    plain = session_stats(ev, ["user_id"], "ts", gap_seconds=1800).collect()
    chunked = session_stats(
        ev, ["user_id"], "ts", gap_seconds=1800, chunk_seconds=86_400
    ).collect()
    as_set = lambda rows: {
        (r.user_id, r.session_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in rows
    }
    assert as_set(plain) == as_set(chunked)
    assert len(plain) > 100  # non-trivial session structure


def test_chunked_asof_join_boundary_edges(spark):
    """asof_join_chunked must equal asof_join on the boundary shapes: the
    matching build row in an EARLIER chunk (and several chunks back), no
    build at all (null carry), build and probe tied on ts (build wins),
    and a fresher build in the same chunk shadowing the carried one."""
    from datetime import datetime

    from es_household_retention_spark_job_spark.operators.asof import (
        asof_join,
        asof_join_chunked,
    )

    def t(s):
        return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")

    build = spark.createDataFrame(
        [
            (1, t("2026-01-01 10:00:00"), 100),  # carried across 2 chunks
            (1, t("2026-01-03 09:00:00"), 101),  # same-chunk shadow
            (2, t("2026-01-05 12:00:00"), 200),  # tie with probe ts
            # user 3 has probes but NO builds at all
        ],
        "user_id long, ts timestamp, event_id long",
    )
    probe = spark.createDataFrame(
        [
            (1, t("2026-01-03 08:00:00"), 1),  # matches 100 from 2 chunks back
            (1, t("2026-01-03 09:30:00"), 2),  # matches same-chunk 101
            (2, t("2026-01-05 12:00:00"), 3),  # tie -> build 200
            (2, t("2026-01-04 12:00:00"), 4),  # before any build -> null
            (3, t("2026-01-02 00:00:00"), 5),  # no builds ever -> null
        ],
        "user_id long, ts timestamp, event_id long",
    )
    args = dict(
        keys=["user_id"], ts_col="ts", build_cols=["event_id"],
        tiebreak_col="event_id",
    )
    plain = {r.event_id: r.event_id_asof for r in asof_join(probe, build, **args).collect()}
    chunked = {
        r.event_id: r.event_id_asof
        for r in asof_join_chunked(probe, build, **args).collect()
    }
    assert plain == chunked
    assert chunked == {1: 100, 2: 101, 3: 200, 4: None, 5: None}


def test_chunked_exchange_width_derivation(spark):
    """Pins functions.chunked_exchange_width: floor at defaultParallelism*2
    for small inputs (the measured-healthy bench width), size-derived
    growth once the input outgrows the per-task byte target, cap at
    defaultParallelism*32 against bad Catalyst estimates, and the explicit
    conf override winning verbatim."""
    from pyspark.sql import functions as F

    from es_household_retention_spark_job_spark.functions import (
        CHUNK_TARGET_BYTES_CONF,
        CHUNK_WIDTH_CONF,
        chunked_exchange_width,
    )

    dp = spark.sparkContext.defaultParallelism
    small = spark.range(10).select(F.col("id").alias("x"))
    assert chunked_exchange_width(small) == dp * 2

    big = spark.range(1_000_000)  # ~8 MB by Catalyst stats, no job runs
    spark.conf.set(CHUNK_TARGET_BYTES_CONF, "1")
    try:
        # 8M bytes / 1-byte target >> cap -> clamped to dp*32
        assert chunked_exchange_width(big) == dp * 32
    finally:
        spark.conf.unset(CHUNK_TARGET_BYTES_CONF)
    # a target equal to the whole input -> 1 task wanted -> floored
    spark.conf.set(CHUNK_TARGET_BYTES_CONF, str(1 << 40))
    try:
        assert chunked_exchange_width(big) == dp * 2
    finally:
        spark.conf.unset(CHUNK_TARGET_BYTES_CONF)

    spark.conf.set(CHUNK_WIDTH_CONF, "7")
    try:
        assert chunked_exchange_width(big) == 7
    finally:
        spark.conf.unset(CHUNK_WIDTH_CONF)


def test_chunked_sessionization_randomized_equivalence(spark):
    """Seeded 100-case property check: sessionize_chunked ≡ sessionize on
    randomized event streams across EXTREME gap/chunk ratios — chunk barely
    above gap (constant boundary merging), chunk >> gap (many sessions per
    chunk), day-scale chunks with near-day gaps, plus exact-boundary
    timestamps and duplicate timestamps. 5 configs x 20 random cases each;
    every config's 20 cases union into ONE frame (case id in the key) so
    the whole check costs 10 Spark jobs, not 200."""
    import random

    from pyspark.sql import functions as F

    from es_household_retention_spark_job_spark.operators.sessionize import (
        session_stats,
    )

    rng = random.Random(20260814)
    t0 = 1_767_225_600
    configs = [  # (gap_seconds, chunk_seconds, time span)
        (1, 2, 600),
        (3600, 3601, 40 * 3600),
        (10, 86_400, 3 * 86_400),
        (86_399, 86_400, 20 * 86_400),
        (1800, 3600, 10 * 86_400),
    ]
    for gap, chunk, span in configs:
        rows = []
        for case in range(20):
            n = rng.randint(1, 60)
            for _ in range(n):
                r = rng.random()
                if r < 0.15:  # exact chunk-boundary timestamp
                    ts = t0 + rng.randrange(0, span, chunk)
                elif r < 0.25:  # duplicate-prone small range
                    ts = t0 + rng.randrange(10)
                else:
                    ts = t0 + rng.randrange(span)
                rows.append((case, ts))
        ev = spark.createDataFrame(rows, "user_id int, sec long").select(
            "user_id", F.timestamp_seconds("sec").alias("ts")
        )
        key = lambda r: (r.user_id, r.session_id, str(r.session_start), str(r.session_end), r.n_events)
        plain = sorted(
            key(r) for r in session_stats(ev, ["user_id"], "ts", gap).collect()
        )
        chunked = sorted(
            key(r)
            for r in session_stats(
                ev, ["user_id"], "ts", gap, chunk_seconds=chunk
            ).collect()
        )
        assert plain == chunked, (gap, chunk)


def test_chunked_asof_join_randomized_equivalence(spark):
    """Seeded randomized property check for the value-carry rewrite:
    asof_join_chunked ≡ asof_join across extreme chunk sizes (2 s — almost
    every match carried from an earlier chunk — up to day-scale), with
    build/probe timestamp ties, duplicate build timestamps (tiebreak
    decides), and keys missing builds entirely. 60 random cases per config
    in one frame; exact row-set equality."""
    import random

    from pyspark.sql import functions as F

    from es_household_retention_spark_job_spark.operators.asof import (
        asof_join,
        asof_join_chunked,
    )

    rng = random.Random(20260815)
    t0 = 1_767_225_600
    span = 1200
    for chunk in (2, 60, 86_400):
        brows, prows = [], []
        eid = 0
        for case in range(60):
            for _ in range(rng.randint(0, 8)):
                eid += 1
                brows.append((case, t0 + rng.randrange(span), eid, rng.randrange(1000)))
            for _ in range(rng.randint(1, 8)):
                eid += 1
                prows.append((case, t0 + rng.randrange(span), eid))
        build = spark.createDataFrame(
            brows, "user_id int, sec long, event_id long, val int"
        ).select(
            "user_id",
            F.timestamp_seconds("sec").alias("ts"),
            "event_id",
            "val",
        )
        probe = spark.createDataFrame(
            prows, "user_id int, sec long, event_id long"
        ).select(
            "user_id", F.timestamp_seconds("sec").alias("ts"), "event_id"
        )
        args = (probe, build, ["user_id"], "ts", ["ts", "val"], "event_id")
        key = lambda r: tuple(str(v) for v in r)
        plain = sorted(key(r) for r in asof_join(*args).collect())
        chunked = sorted(
            key(r) for r in asof_join_chunked(*args, chunk_seconds=chunk).collect()
        )
        assert plain == chunked, chunk


def test_auto_window_strategy_selection(spark):
    """The adaptive per-key-window mode branches on a sampled hottest-key
    estimate: uniform keys stay on the plain single-window plan, a hot key
    crossing the threshold flips to the chunked rewrite, and the conf
    override moves the threshold. fraction=1.0 makes the estimate exact so
    the branch is deterministic."""
    from pyspark.sql import functions as F

    from es_household_retention_spark_job_spark.functions import (
        HOT_KEY_THRESHOLD_CONF,
        hot_key_estimate,
        hot_key_threshold,
    )
    from es_household_retention_spark_job_spark.operators.sessionize import (
        choose_window_strategy,
    )

    t0 = 1_767_225_600
    uniform = spark.createDataFrame(
        [(u, t0 + i) for u in range(10) for i in range(5)], "user_id int, sec long"
    ).select("user_id", F.timestamp_seconds("sec").alias("ts"))
    hot = uniform.unionByName(
        spark.createDataFrame(
            [(99, t0 + i) for i in range(200)], "user_id int, sec long"
        ).select("user_id", F.timestamp_seconds("sec").alias("ts"))
    )

    assert hot_key_estimate(uniform, ["user_id"], fraction=1.0) == 5
    assert hot_key_estimate(hot, ["user_id"], fraction=1.0) == 200

    s, est = choose_window_strategy(
        uniform, ["user_id"], threshold_rows=100, fraction=1.0
    )
    assert (s, est) == ("plain", 5)
    s, est = choose_window_strategy(hot, ["user_id"], threshold_rows=100, fraction=1.0)
    assert (s, est) == ("chunked", 200)

    # threshold default + conf override
    assert hot_key_threshold(spark) == 1_000_000
    spark.conf.set(HOT_KEY_THRESHOLD_CONF, "123")
    try:
        assert hot_key_threshold(spark) == 123
        s, _ = choose_window_strategy(hot, ["user_id"], fraction=1.0)
        assert s == "chunked"
    finally:
        spark.conf.unset(HOT_KEY_THRESHOLD_CONF)


def test_auto_operators_strategy_independent_output(spark):
    """sessionize_auto / asof_join_auto produce identical rows whichever
    side of the threshold the input lands on — the choice is physical
    only. Both branches are forced by moving threshold_rows around the
    exact (fraction=1.0) estimate."""
    from pyspark.sql import functions as F

    from es_household_retention_spark_job_spark.operators.asof import (
        asof_join_auto,
    )
    from es_household_retention_spark_job_spark.operators.sessionize import (
        sessionize_auto,
    )

    t0 = 1_767_225_600
    ev = spark.createDataFrame(
        [(u, t0 + i * 900 * (u + 1), u * 1000 + i) for u in range(4) for i in range(30)],
        "user_id int, sec long, event_id long",
    ).select(
        "user_id", F.timestamp_seconds("sec").alias("ts"), "event_id"
    )
    key = lambda r: tuple(str(v) for v in r)
    outs = [
        sorted(
            key(r)
            for r in sessionize_auto(
                ev,
                ["user_id"],
                "ts",
                gap_seconds=1800,
                chunk_seconds=7200,
                order_tiebreak=["event_id"],
                threshold_rows=thr,
                sample_fraction=1.0,
            ).collect()
        )
        for thr in (1, 10**9)  # chunked branch, then plain branch
    ]
    assert outs[0] == outs[1]
    assert len(outs[0]) == 120

    probe = ev.where(F.col("event_id") % 3 == 0)
    build = ev.where(F.col("event_id") % 3 != 0)
    asof_outs = [
        sorted(
            key(r)
            for r in asof_join_auto(
                probe,
                build,
                keys=["user_id"],
                ts_col="ts",
                build_cols=["event_id"],
                tiebreak_col="event_id",
                chunk_seconds=7200,
                threshold_rows=thr,
                sample_fraction=1.0,
            ).collect()
        )
        for thr in (1, 10**9)
    ]
    assert asof_outs[0] == asof_outs[1]
    assert len(asof_outs[0]) == probe.count()
