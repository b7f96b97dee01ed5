"""Generic gaps-and-islands collapse (SURVEY §2.5).

The reference implements the collapse with four window specs and three
self-joins (HRP:557-590). All of them share ``partition by household order by
month_rank``, so Catalyst reuses one Exchange — but the idiomatic island-id
formulation below needs exactly ONE window pass plus ONE aggregation:

    change = state != lag(state)            (first row := change)
    island = running sum of change          (same window)
    group by (keys, island, state) -> min(order)/max(order)

Both formulations produce identical islands (proved by the DuckDB oracle and
the edge-case fixtures); the engine ships the cheap one. At 100 TB this is a
single hash-partition shuffle on the key columns — no join amplification, no
skew beyond what the key distribution already has.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def collapse_consecutive(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    state_col: str,
    agg_extra: Sequence[Column] = (),
) -> DataFrame:
    """Collapse runs of consecutive rows with equal ``state_col`` per key.

    Returns one row per island: keys, ``<state_col>``, ``island_start`` /
    ``island_end`` (min/max of ``order_col``) and ``island_size``.
    Nulls in ``state_col`` compare as a distinct state (null-safe equality),
    mirroring SQL ``lag() IS DISTINCT FROM`` semantics.
    """
    w = Window.partitionBy(*keys).orderBy(order_col)
    prev = F.lag(F.col(state_col)).over(w)
    change = F.when(prev.eqNullSafe(F.col(state_col)), F.lit(0)).otherwise(F.lit(1))
    run = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_island = df.withColumn("_change", change).withColumn(
        "_island", F.sum("_change").over(run)
    )
    return with_island.groupBy(*keys, "_island", state_col).agg(
        F.min(order_col).alias("island_start"),
        F.max(order_col).alias("island_end"),
        F.count(F.lit(1)).alias("island_size"),
        *agg_extra,
    )
