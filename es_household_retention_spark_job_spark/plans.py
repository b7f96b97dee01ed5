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


def _collect_exchanges(node, out: list) -> None:
    """Walk a JVM SparkPlan tree collecting ShuffleExchange nodes —
    descending through the AQE wrapper's initial plan and materialized
    query stages, which hide exchanges from a naive children() walk."""
    name = node.getClass().getSimpleName()
    if "ShuffleExchange" in name:
        out.append(node)
    if "AdaptiveSparkPlan" in name:
        _collect_exchanges(node.initialPlan(), out)
    if "QueryStage" in name:
        try:
            _collect_exchanges(node.plan(), out)
        except Exception:
            pass
    children = node.children()
    for i in range(children.size()):
        _collect_exchanges(children.apply(i), out)


def shuffled_wide_columns(df: DataFrame) -> list[tuple[str, list[str]]]:
    """Per ShuffleExchange in the physical plan: (partitioning, the
    array/map-carrying output columns crossing it). The wide-shuffle
    audit: shuffling rows that carry embedding-sized arrays multiplies
    shuffle bytes by the payload width — the round-10 |Q|=10k disk-full
    came from exactly this (dedup before scoring shuffled both embeddings
    per candidate row; deduping the scored 3-column frame was ~30× fewer
    bytes). ``assert_no_wide_shuffle`` pins the lesson per plan."""
    exchanges: list = []
    _collect_exchanges(df._jdf.queryExecution().executedPlan(), exchanges)  # noqa: SLF001
    out = []
    for ex in exchanges:
        attrs = ex.output()
        wide = []
        for i in range(attrs.size()):
            a = attrs.apply(i)
            if "array<" in a.dataType().catalogString() or a.dataType().typeName() == "map":
                wide.append(a.name().split("#")[0] if "#" in a.name() else a.name())
        out.append((ex.outputPartitioning().toString(), sorted(wide)))
    return out


def assert_no_wide_shuffle(df: DataFrame, allow: tuple[str, ...] = ()) -> None:
    """No KEYED shuffle (hash/range partitioning) in the plan carries an
    array/map column, minus the explicit ``allow`` list for plans whose
    PAYLOAD is legitimately an array (e.g. a packed-history write keyed
    by person). Catches the class of regression where a dedup/join/window
    is planned before narrowing the row, silently multiplying shuffle
    bytes by the embedding width. RoundRobin exchanges are exempt: that
    is ``ensure_parallelism``'s one-time spread of an under-split small
    input — a no-op at scale (big inputs arrive well-split), not a
    per-operator re-shuffle."""
    offenders = [
        (part, [c for c in wide if c not in allow])
        for part, wide in shuffled_wide_columns(df)
        if not part.startswith("RoundRobinPartitioning")
    ]
    offenders = [(p, w) for p, w in offenders if w]
    assert not offenders, (
        "wide (array/map-carrying) keyed shuffles in plan — narrow the "
        f"row before the exchange: {offenders}"
    )
