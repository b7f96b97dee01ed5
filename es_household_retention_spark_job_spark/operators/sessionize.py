"""Gap-based sessionization (beyond-reference; batch analog of a streaming
session window). Same island machinery as the retention collapse: a new
session starts when the gap to the previous event exceeds the threshold;
session ids are a running sum of the start flags — ONE window pass + one
aggregation, a single shuffle on the key."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import chunked_exchange_width, hot_key_estimate, hot_key_threshold


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


def sessionize_chunked(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    chunk_seconds: int = 86_400,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Skew-safe sessionization: identical output to ``sessionize``, but no
    single key ever serializes into one task.

    ``sessionize`` windows by key alone, so a mega-user (bot, service
    account) with 10M events lands in ONE task — per-key windows are the
    one skew AQE cannot split. This two-level variant bounds task work by
    (key, time-chunk) instead:

    1. events window within ``(keys, chunk)`` — local session flags/ids;
    2. a per-(keys, chunk) SUMMARY frame (first/last ts, #local sessions —
       thousands of rows, not billions) takes the only per-key sequential
       pass: a lag decides whether each chunk's first local session merges
       with the previous chunk's last (boundary gap ≤ threshold; chunks
       are ``chunk_seconds > gap_seconds`` wide, so non-adjacent chunks can
       never merge and empty chunks need no special case), and a running
       sum converts per-chunk session counts into a global id offset;
    3. one distributed join keyed on (keys, chunk) stamps global ids:
       ``offset + local_id − merges`` — the merged first session inherits
       the previous chunk's last id, everything else shifts up.

    Session ids come out 1-based in the same order as ``sessionize`` —
    equality is asserted in tests and against the driver oracle."""
    if chunk_seconds <= gap_seconds:
        raise ValueError("chunk_seconds must exceed gap_seconds")
    keys = list(keys)
    sec = F.unix_timestamp(F.col(ts_col))
    order = [ts_col, *order_tiebreak]
    # PIN the (keys, chunk) exchange parallelism: event rows are narrow and
    # timestamps compress to almost nothing, so AQE's byte-based coalescing
    # happily folds the whole exchange into ONE task (measured: an 8M-row
    # mega-key window ran 10.8s in a single task) — reintroducing exactly
    # the serialization this operator exists to remove. An explicit
    # repartition is REPARTITION_BY_NUM, which AQE never coalesces; both
    # window subtrees branch from it and inherit the pinned width, which is
    # derived from the input size estimate (functions.chunked_exchange_width
    # — conf-overridable, floored at the measured-healthy bench width).
    chunked = df.withColumn("_chunk", F.floor(sec / chunk_seconds)).repartition(
        chunked_exchange_width(df), *keys, F.col("_chunk")
    )

    wl = Window.partitionBy(*keys, "_chunk").orderBy(*order)
    prev_ts = F.lag(ts_col).over(wl)
    local_new = F.when(
        prev_ts.isNull()
        | (sec - F.unix_timestamp(prev_ts) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    runl = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = chunked.withColumn("_lsid", F.sum(local_new).over(runl))

    summary = local.groupBy(*keys, "_chunk").agg(
        F.min(ts_col).alias("_first_ts"),
        F.max(ts_col).alias("_last_ts"),
        F.max("_lsid").alias("_n_local"),
    )
    ws = Window.partitionBy(*keys).orderBy("_chunk")
    prev_last = F.lag("_last_ts").over(ws)
    merges = (
        prev_last.isNotNull()
        & (
            F.unix_timestamp("_first_ts") - F.unix_timestamp(prev_last)
            <= gap_seconds
        )
    ).cast("long")
    contributed = F.col("_n_local") - F.col("_merges")
    runs = ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offsets = (
        summary.withColumn("_merges", merges)
        .withColumn("_offset", F.sum(contributed).over(runs) - contributed)
        .select(*keys, "_chunk", "_merges", "_offset")
    )
    return (
        local.join(offsets, [*keys, "_chunk"])
        .withColumn(
            "session_id", F.col("_offset") + F.col("_lsid") - F.col("_merges")
        )
        .drop("_chunk", "_lsid", "_merges", "_offset")
    )


def choose_window_strategy(
    df: DataFrame,
    keys: Sequence[str],
    threshold_rows: int | None = None,
    fraction: float | None = None,
) -> tuple[str, float]:
    """Pick ``"plain"`` vs ``"chunked"`` for a per-key window over ``df``
    from a sampled hottest-key estimate (one cheap key-column pre-pass;
    see ``functions.hot_key_estimate`` for cost/accuracy).

    The crossover is real and measured (SCALING.md "Mega-key windows"): at
    sf1-skew (200k-event hot key) the plain window wins 2.3s vs 4.1s, at an
    8M-event mega-key the chunked rewrite wins 4.9s vs 11.1s — and beyond
    wall time, the plain form must SORT one key's whole history in a single
    task (guaranteed spill/OOM for a 100M-row bot key at 100 TB), so the
    auto mode is the production default: pay one sampling scan, serialize
    nothing you can't afford to."""
    if threshold_rows is None:
        threshold_rows = hot_key_threshold(df.sparkSession)
    est = hot_key_estimate(df, keys, fraction)
    return ("chunked" if est >= threshold_rows else "plain", est)


def sessionize_auto(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    chunk_seconds: int = 86_400,
    order_tiebreak: Sequence[str] = (),
    threshold_rows: int | None = None,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Adaptive sessionization: ``sessionize`` when no key is hot enough to
    matter, ``sessionize_chunked`` when the sampled hottest-key estimate
    crosses the threshold (conf ``spark.spark_graft.hotKeyThresholdRows``).
    Output is identical either way — the choice is purely physical."""
    strategy, _ = choose_window_strategy(df, keys, threshold_rows, sample_fraction)
    if strategy == "chunked":
        return sessionize_chunked(
            df, keys, ts_col, gap_seconds, chunk_seconds, order_tiebreak
        )
    return sessionize(df, keys, ts_col, gap_seconds, order_tiebreak)


def session_stats(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: Sequence[str] = (),
    chunk_seconds: int | None = None,
    auto: bool = False,
) -> DataFrame:
    """One row per session: bounds and event count. ``chunk_seconds``
    selects the skew-safe two-level formulation, ``auto`` the sampled
    hot-key branch between the two (same output either way)."""
    if auto:
        s = sessionize_auto(
            df, keys, ts_col, gap_seconds, chunk_seconds or 86_400, order_tiebreak
        )
    elif chunk_seconds is not None:
        s = sessionize_chunked(
            df, keys, ts_col, gap_seconds, chunk_seconds, order_tiebreak
        )
    else:
        s = sessionize(df, keys, ts_col, gap_seconds, order_tiebreak)
    return s.groupBy(*keys, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
