"""Property-based tests (hypothesis) for the gaps-and-islands collapse —
the engine's most semantics-dense operator. Random boolean state sequences
must always collapse into islands that (1) tile the sequence exactly,
(2) alternate state between neighbors, and (3) reconstruct the input.

The reference had no tests at all (SURVEY §5.1); this is the class of test
its hand-shaped 4-window/3-join SQL most needed."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from es_household_retention_spark_job_spark.operators.islands import (
    collapse_consecutive,
)

SEQ = st.lists(st.booleans(), min_size=1, max_size=24)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(states=SEQ)
def test_collapse_tiles_and_alternates(spark, states):
    rows = [("k", i, s) for i, s in enumerate(states)]
    df = spark.createDataFrame(rows, "key string, pos int, state boolean")
    out = collapse_consecutive(df, ["key"], "pos", "state")
    islands = sorted(
        ((r.island_start, r.island_end, r.state) for r in out.collect())
    )
    # tiling: islands are contiguous, non-overlapping, cover [0, n-1]
    assert islands[0][0] == 0
    assert islands[-1][1] == len(states) - 1
    for (s0, e0, _), (s1, _, _) in zip(islands, islands[1:]):
        assert s1 == e0 + 1
    # alternation: adjacent islands differ in state
    for (_, _, a), (_, _, b) in zip(islands, islands[1:]):
        assert a != b
    # reconstruction: expanding islands reproduces the input sequence
    rebuilt = {}
    for s, e, v in islands:
        for p in range(s, e + 1):
            rebuilt[p] = v
    assert [rebuilt[i] for i in range(len(states))] == states


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    states=st.lists(
        st.one_of(st.booleans(), st.none()), min_size=1, max_size=12
    )
)
def test_collapse_null_state_is_its_own_island_value(spark, states):
    """Null states group with nulls (null-safe equality), never merge with
    true/false runs."""
    rows = [("k", i, s) for i, s in enumerate(states)]
    df = spark.createDataFrame(rows, "key string, pos int, state boolean")
    out = collapse_consecutive(df, ["key"], "pos", "state")
    islands = sorted(
        ((r.island_start, r.island_end, r.state) for r in out.collect())
    )
    rebuilt = {}
    for s, e, v in islands:
        for p in range(s, e + 1):
            rebuilt[p] = v
    assert [rebuilt[i] for i in range(len(states))] == states
    for (_, _, a), (_, _, b) in zip(islands, islands[1:]):
        assert a != b  # None != True/False and runs of None collapse to one
