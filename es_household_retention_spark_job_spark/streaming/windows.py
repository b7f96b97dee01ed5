"""Watermarked window aggregations over an event stream: tumbling counts and
session windows (the streaming form of ``operators.sessionize``).

Late-data semantics are the watermark's: events older than
``max(event time) - delay`` are dropped deterministically and the
corresponding windows finalize — state size stays bounded by
(#keys × windows inside the watermark), which is what makes these safe on an
unbounded 100 TB/day stream where the batch operators would need the full
history."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Per-key tumbling-window event counts with a watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_len).alias("win"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Per-key session windows (gap-based, merging) with a watermark — the
    built-in streaming counterpart of operators.sessionize; equivalence on
    static input is asserted in tests/test_streaming.py."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("win.start").alias("session_start"),
            "n_events",
        )
    )
