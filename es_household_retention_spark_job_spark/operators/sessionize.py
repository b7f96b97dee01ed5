"""Gap-based sessionization (beyond-reference; batch analog of a streaming
session window). Same island machinery as the retention collapse: a new
session starts when the gap to the previous event exceeds the threshold;
session ids are a running sum of the start flags — ONE window pass + one
aggregation, a single shuffle on the key."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign ``session_id`` (1-based per key) to each row."""
    order = [ts_col, *order_tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("_new_session", new_session).withColumn(
        "session_id", F.sum("_new_session").over(run)
    ).drop("_new_session")


def session_stats(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """One row per session: bounds and event count."""
    s = sessionize(df, keys, ts_col, gap_seconds, order_tiebreak)
    return s.groupBy(*keys, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
