"""Physical-plan introspection helpers (SURVEY §4).

The engine's scale posture is declared, not hand-scheduled: we write
declarative DataFrame plans and then ASSERT the physical properties Catalyst
must deliver — predicate/projection pushdown into the parquet scan,
broadcast joins for dimension tables, no cartesian products, whole-stage
codegen on the hot path. tests/test_plans.py runs these assertions per
query, so a regression that would silently cost 100× at 100 TB (a filter
that stopped pushing, a broadcast that fell back to shuffle) fails CI
instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The .explain output as a string (what df.explain(mode) prints)."""
    jdf = df._jdf  # noqa: SLF001 — no public API returns the plan text
    return jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001
            mode
        )
    )


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters lines from the formatted plan."""
    return "\n".join(
        line
        for line in explain_str(df).splitlines()
        if "PushedFilters" in line
    )


def read_schema(df: DataFrame) -> str:
    """Concatenated ReadSchema lines (column-pruning evidence)."""
    return "\n".join(
        line for line in explain_str(df).splitlines() if "ReadSchema" in line
    )


def assert_no_cartesian(df: DataFrame) -> None:
    """No CartesianProduct (both-sides-big). A BroadcastNestedLoopJoin is
    acceptable — it only appears when one side is broadcast-small (e.g. the
    49-row month grid, J2) and is the intended physical form of those
    plans."""
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, (
        "unexpected cartesian product in plan:\n" + plan
    )


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = explain_str(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, f"expected >= {at_least} BroadcastHashJoin, got {n}:\n{plan}"


def assert_wholestage_codegen(df: DataFrame) -> None:
    # "codegen" explain mode compiles the plan and reports
    # "Found N WholeStageCodegen subtrees" — robust under AQE, where the
    # formatted plan hides codegen ids until execution.
    report = explain_str(df, "codegen")
    first = report.splitlines()[0] if report else ""
    assert "WholeStageCodegen subtrees" in first and "Found 0" not in first, (
        "no WholeStageCodegen spans:\n" + first
    )


def count_shuffles(df: DataFrame) -> int:
    """Number of hash-partitioning exchanges in the physical plan."""
    return explain_str(df, "simple").count("Exchange hashpartitioning")


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    pf = pushed_filters(df)
    assert fragment in pf, f"filter {fragment!r} not pushed; PushedFilters:\n{pf}"


def assert_column_pruned(df: DataFrame, absent_column: str) -> None:
    rs = read_schema(df)
    assert absent_column not in rs, (
        f"column {absent_column!r} should be pruned from scans; ReadSchema:\n{rs}"
    )
