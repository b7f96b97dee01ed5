"""As-of join (beyond-reference operator; SURVEY §2.3 "not present" list).

For each *probe* row, find the latest *build* row of the same key with
``build.ts <= probe.ts``. Implemented as UNION + one window pass instead of a
range self-join: both sides are tagged, sorted once per key, and a running
``last(..., ignorenulls)`` carries the most recent build row forward.

Scale: one shuffle on the key, O(n log n) per key, no join amplification —
the classic formulation (join on key + ts inequality, then max) re-shuffles
and explodes on hot keys. Ties (build.ts == probe.ts) resolve to the build
row, matching DuckDB's ASOF JOIN ``<=`` semantics; equal-ts build rows
resolve to the highest tiebreaker value.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import chunked_exchange_width, hot_key_estimate, hot_key_threshold


def _tag_union(
    probe: DataFrame,
    build: DataFrame,
    keys: list[str],
    ts_col: str,
    carry: list[str],
    tiebreak_col: str,
) -> tuple[DataFrame, list[str]]:
    """The shared preamble of both as-of variants: tag build rows (side 0,
    payload struct) and probe rows (side 1, null payload), union them into
    one orderable stream. Returns (unioned, probe_extra_columns)."""
    b = build.select(
        *keys,
        ts_col,
        F.col(tiebreak_col).alias("_tb"),
        F.struct(*[F.col(c).alias(c) for c in carry]).alias("_bpayload"),
    ).withColumn("_side", F.lit(0))
    p = probe.withColumn("_side", F.lit(1)).withColumn(
        "_tb", F.col(tiebreak_col)
    ).withColumn("_bpayload", F.lit(None).cast(b.schema["_bpayload"].dataType))

    common = keys + [ts_col, "_side", "_tb", "_bpayload"]
    probe_extra = [c for c in probe.columns if c not in common]
    unioned = p.select(*common, *probe_extra).unionByName(
        b.select(
            *common,
            *[
                F.lit(None).cast(probe.schema[c].dataType).alias(c)
                for c in probe_extra
            ],
        )
    )
    return unioned, probe_extra


def _matched_select(
    matched: DataFrame,
    keys: list[str],
    ts_col: str,
    probe_extra: list[str],
    carry: list[str],
    suffix: str,
) -> DataFrame:
    """The shared epilogue: probe rows + the carried build payload fields."""
    return matched.select(
        *keys,
        ts_col,
        *probe_extra,
        *[F.col(f"_last_build.{c}").alias(f"{c}{suffix}") for c in carry],
    )


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    build_cols: Sequence[str],
    tiebreak_col: str,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every probe row, plus ``build_cols`` (suffixed) from
    the latest build row at-or-before its timestamp (nulls if none)."""
    keys = list(keys)
    carry = [c for c in build_cols if c != ts_col] + [ts_col]
    unioned, probe_extra = _tag_union(
        probe, build, keys, ts_col, carry, tiebreak_col
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "_last_build", F.last("_bpayload", ignorenulls=True).over(w)
    ).where(F.col("_side") == 1)
    return _matched_select(matched, keys, ts_col, probe_extra, carry, suffix)


def asof_join_chunked(
    probe: DataFrame,
    build: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    build_cols: Sequence[str],
    tiebreak_col: str,
    suffix: str = "_asof",
    chunk_seconds: int = 86_400,
) -> DataFrame:
    """Skew-safe as-of join — identical output to ``asof_join``, but the
    unioned stream windows by (key, time-chunk) so a mega-key never
    serializes into one task (the same two-level rewrite as
    ``sessionize_chunked``).

    The carried state here is a VALUE, not a count: each chunk's local
    ``last(build, ignorenulls)`` misses only builds from earlier chunks, so
    a per-(key, chunk) summary computes every chunk's final build payload
    (``max_by`` over (ts, tiebreak) — one partial-aggregated pass), a
    running ``last ignorenulls`` over the TINY summary ordered by chunk
    yields "latest build before this chunk", and a broadcast join patches
    it in via ``coalesce(local, carried)``."""
    keys = list(keys)
    carry = [c for c in build_cols if c != ts_col] + [ts_col]
    unioned, probe_extra = _tag_union(
        probe, build, keys, ts_col, carry, tiebreak_col
    )
    # the repartition pins the exchange width against AQE's byte-based
    # coalescing — see sessionize_chunked for the measured single-task
    # collapse this prevents; width derived from the unioned input's size
    # estimate (functions.chunked_exchange_width)
    unioned = unioned.withColumn(
        "_chunk",
        F.floor(F.unix_timestamp(F.col(ts_col)) / chunk_seconds),
    ).repartition(
        chunked_exchange_width(unioned),
        *keys,
        F.col("_chunk"),
    )

    wl = (
        Window.partitionBy(*keys, "_chunk")
        .orderBy(ts_col, "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = unioned.withColumn(
        "_local_build", F.last("_bpayload", ignorenulls=True).over(wl)
    )

    # every chunk's FINAL build payload (null where the chunk has none) —
    # max_by ignores rows with a null ordering key, i.e. the probe side
    summary = unioned.groupBy(*keys, "_chunk").agg(
        F.max_by(
            "_bpayload",
            F.when(F.col("_side") == 0, F.struct(ts_col, "_tb")),
        ).alias("_chunk_build")
    )
    ws = (
        Window.partitionBy(*keys)
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = summary.select(
        *keys,
        "_chunk",
        F.last("_chunk_build", ignorenulls=True).over(ws).alias("_carried"),
    )

    matched = (
        local.join(carried, [*keys, "_chunk"])
        .withColumn("_last_build", F.coalesce("_local_build", "_carried"))
        .where(F.col("_side") == 1)
    )
    return _matched_select(matched, keys, ts_col, probe_extra, carry, suffix)


def asof_join_auto(
    probe: DataFrame,
    build: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    build_cols: Sequence[str],
    tiebreak_col: str,
    suffix: str = "_asof",
    chunk_seconds: int = 86_400,
    threshold_rows: int | None = None,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Adaptive as-of join: plain ``asof_join`` unless the sampled
    hottest-key estimate over probe∪build (the stream the window actually
    sorts) crosses the threshold, then the skew-safe chunked rewrite.
    Identical output either way — the choice is purely physical (see
    ``sessionize.choose_window_strategy`` for the measured crossover and
    the OOM argument)."""
    keys = list(keys)
    spark = probe.sparkSession
    if threshold_rows is None:
        threshold_rows = hot_key_threshold(spark)
    stream = probe.select(*keys).unionByName(build.select(*keys))
    est = hot_key_estimate(stream, keys, sample_fraction)
    impl = asof_join_chunked if est >= threshold_rows else asof_join
    kwargs = {"chunk_seconds": chunk_seconds} if impl is asof_join_chunked else {}
    return impl(
        probe, build, keys, ts_col, build_cols, tiebreak_col, suffix, **kwargs
    )
