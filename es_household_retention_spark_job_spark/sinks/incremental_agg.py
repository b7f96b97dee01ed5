"""Incremental materialized aggregates maintained from the keyed sink's
change data feed — the downstream half of the CDC story.

``pipeline.run_incremental`` keeps the RETENTION STORE itself current at
O(changed households); this module keeps an AGGREGATE of any keyed table
current at O(changed rows): a grouped count+sum table that is updated by
folding ``read_changes(last_folded, current)`` with retract/apply math
(insert/update_postimage rows add, delete/update_preimage rows subtract)
instead of re-scanning the source. The aggregate state itself lives in a
keyed sink table (key = the group column), so folds dogfood the same
upsert/point-lookup/time-travel machinery they consume upstream, and the
update write is confined to the buckets the affected groups hash to.

Exactly-once: the fold's cursor (the source version it folded TO) rides the
SAME commit as the folded data, via the sink's application commit metadata
(``app_meta`` — the Delta ``txn`` pattern), and the commit is conditional on
the cursor still being the one the fold was computed FROM
(``app_meta_expect``). A crash between compute and commit leaves the cursor
untouched (the refold recomputes the identical window); two folds racing
from the same cursor cannot both commit even when their affected groups
land in disjoint buckets.

Only DECOMPOSABLE aggregates are offered (count, sum — and anything
derivable from them downstream: avg = sum/cnt). min/max are deliberately
absent: retracting a min requires the full group's rows, which is a
recompute, not a fold — callers who need them should recompute affected
groups from the source instead of pretending the fold is O(changes).

100 TB shape: fold cost = change-feed read (bucket-confined, see
``read_changes``) + one shuffle of the CHANGE rows to group keys + a point
lookup of |affected groups| agg rows + an upsert of |affected groups| rows.
Nothing scales with the source table or the aggregate table size.

Reference parity: the reference job's terminal step is an ES terms-agg
dashboard query over the maintained store (HouseholdRetentionProcessing
.scala:es "households without retention" readback); this module is the
beyond-reference generalization — the dashboard aggregate maintained
incrementally instead of recomputed per refresh.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .upsert import (
    CHANGE_TYPE_COL,
    DEFAULT_BUCKETS,
    current_version,
    read_changes,
    read_keyed_table,
    table_app_meta,
    upsert_parquet,
    write_keyed_table,
)

#: app-meta keys the fold commits atomically with its data
CURSOR_KEY = "fold_source_version"
SOURCE_KEY = "fold_source"

#: largest affected-group count served by the point-lookup read of prior
#: aggregate rows (the group list is collected to the driver — bounded by
#: this cap); beyond it the fold joins against a full aggregate-table scan
#: (still one shuffle of |groups| + |agg| rows, never of the SOURCE table)
FOLD_LOOKUP_MAX = int(os.environ.get("SPARK_GRAFT_FOLD_LOOKUP_MAX", "10000"))

#: synthesized single-column key for MULTI-column groups (the bucketed
#: layout addresses one key column); unit-separator-joined string casts of
#: the group values — the group columns themselves stay as data columns
GROUP_KEY_COL = "_group"


def _group_key(group_cols: list[str]):
    # ESCAPED before joining: a group value that itself contains the
    # separator must not collide with a differently-split tuple (e.g.
    # ('a\\x1fb','c') vs ('a','b\\x1fc')) — backslash-escape both the
    # escape character and the separator per value, so the join is
    # injective over tuples of non-null strings
    parts = []
    for c in group_cols:
        s = F.col(c).cast("string")
        s = F.replace(s, F.lit("\\"), F.lit("\\\\"))
        s = F.replace(s, F.lit("\x1f"), F.lit("\\\x1f"))
        parts.append(s)
    return F.concat_ws("\x1f", *parts)


def _agg_exprs(sum_cols: tuple[str, ...], weight) -> list:
    """Signed count+sum expressions over change rows. Sums ignore nulls
    (SQL SUM semantics); the count counts rows, null measures included."""
    exprs = [F.sum(weight).cast("long").alias("_dcnt")]
    for c in sum_cols:
        exprs.append(
            F.sum(F.when(F.col(c).isNotNull(), F.col(c) * weight)).alias(
                f"_dsum_{c}"
            )
        )
    return exprs


def fold_aggregate(
    spark: SparkSession,
    source_path: str,
    agg_path: str,
    group_col: str | list[str] | tuple[str, ...],
    sum_cols: tuple[str, ...] | list[str] = (),
    n_buckets: int = DEFAULT_BUCKETS,
) -> int:
    """Bring the count+sum aggregate of ``source_path`` grouped by
    ``group_col`` (one column name, or a list for composite groups — the
    terms-agg-by-(client, month) shape) up to date at ``agg_path``;
    returns the source version the aggregate now reflects. First call
    bootstraps (one full grouped scan of the pinned current version);
    later calls fold only the change feed since the recorded cursor.
    Output columns: the group column(s), ``cnt`` (long), and ``sum_<c>``
    per requested column (multi-column groups also carry the synthesized
    ``_group`` key — ``read_aggregate`` hides it). A group whose count
    reaches zero keeps a ``cnt=0`` row (sums zeroed) — readers filter, and
    a later revival is a plain update, not a resurrection special case.

    Null group keys are rejected: the aggregate row's KEY would be null,
    which the bucketed layout cannot address for point lookups.

    Idempotent per version: a fold at an unchanged cursor is a no-op; a
    re-sent fold from a stale cursor aborts with ``ConcurrentWriteError``
    (the committed cursor no longer matches ``app_meta_expect``)."""
    group_cols = [group_col] if isinstance(group_col, str) else list(group_col)
    composite = len(group_cols) > 1
    key = GROUP_KEY_COL if composite else group_cols[0]
    sum_cols = tuple(sum_cols)
    out_cols = {c: f"sum_{c}" for c in sum_cols}
    source_id = os.path.abspath(source_path)
    v_now = current_version(source_path)

    def _with_key(df: DataFrame) -> DataFrame:
        return (
            df.withColumn(GROUP_KEY_COL, _group_key(group_cols))
            if composite
            else df
        )

    if not os.path.exists(agg_path):
        # bootstrap: one grouped scan of the PINNED current version (a
        # concurrent source publish mid-scan cannot tear the baseline —
        # the cursor recorded is exactly the version that was read)
        src = read_keyed_table(spark, source_path, version=v_now)
        boot = src.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias("cnt"),
            *[F.sum(c).alias(out_cols[c]) for c in sum_cols],
        )
        null_any = None
        for c in group_cols:
            cond = F.col(c).isNull()
            null_any = cond if null_any is None else (null_any | cond)
        if boot.where(null_any).limit(1).count():
            raise ValueError(f"null values in group column(s) {group_cols!r}")
        write_keyed_table(
            _with_key(boot),
            agg_path,
            key=key,
            n_buckets=n_buckets,
            app_meta={CURSOR_KEY: v_now, SOURCE_KEY: source_id},
        )
        return v_now

    meta = table_app_meta(agg_path)
    v_from = meta.get(CURSOR_KEY)
    if v_from is None:
        raise ValueError(
            f"{agg_path} carries no fold cursor — not a fold-maintained "
            "aggregate (bootstrap into a fresh path)"
        )
    if meta.get(SOURCE_KEY) != source_id:
        raise ValueError(
            f"aggregate at {agg_path} folds {meta.get(SOURCE_KEY)!r}, "
            f"not {source_id!r}"
        )
    if v_now == v_from:
        return v_from  # nothing published since the last fold
    ch = read_changes(spark, source_path, v_from, v_now)
    weight = F.when(
        F.col(CHANGE_TYPE_COL).isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    deltas = _with_key(
        ch.groupBy(*group_cols).agg(*_agg_exprs(sum_cols, weight))
    )
    # one bounded materialization decides the old-row read strategy; the
    # deltas feed two plans below, so cache across them
    deltas = deltas.persist()
    try:
        probe_cols = [key] + (group_cols if composite else [])
        groups = (
            deltas.select(*probe_cols).limit(FOLD_LOOKUP_MAX + 1).collect()
        )
        if not groups:
            # net-zero window (e.g. only same-value rewrites): advance the
            # cursor anyway via an empty-batch commit, or the feed window
            # would grow without bound
            empty = spark.createDataFrame([], read_keyed_table(spark, agg_path).schema)
            upsert_parquet(
                spark,
                agg_path,
                empty,
                key=key,
                n_buckets=n_buckets,
                app_meta={CURSOR_KEY: v_now, SOURCE_KEY: source_id},
                app_meta_expect={CURSOR_KEY: v_from},
            )
            return v_now
        if composite:
            nulls = any(any(r[c] is None for c in group_cols) for r in groups)
        else:
            nulls = any(r[0] is None for r in groups)
        if nulls:
            raise ValueError(f"null values in group column(s) {group_cols!r}")
        if len(groups) <= FOLD_LOOKUP_MAX:
            # serving shape: only the buckets the affected groups hash to
            # are opened (manifest-level pruning in read_keyed_table)
            old = read_keyed_table(
                spark, agg_path, keys=[r[0] for r in groups]
            )
        else:
            # huge change window: join against the full aggregate scan —
            # still never touches the SOURCE table
            old = read_keyed_table(spark, agg_path)
        d, o = deltas.alias("d"), old.alias("o")
        merged = d.join(o, on=key, how="left")
        sel = [
            *[F.col(f"d.{c}").alias(c) for c in group_cols],
            *([F.col(f"d.{GROUP_KEY_COL}").alias(GROUP_KEY_COL)] if composite else []),
            (F.coalesce(F.col("o.cnt"), F.lit(0)) + F.col("d._dcnt"))
            .cast("long")
            .alias("cnt"),
        ]
        for c in sum_cols:
            oc, dc = out_cols[c], f"_dsum_{c}"
            zero = F.lit(0).cast(deltas.schema[dc].dataType)
            sel.append(
                F.when(
                    (F.coalesce(F.col("o.cnt"), F.lit(0)) + F.col("d._dcnt"))
                    == 0,
                    zero,
                )
                .otherwise(
                    F.coalesce(F.col(f"o.{oc}"), zero)
                    + F.coalesce(F.col(f"d.{dc}"), zero)
                )
                .alias(oc)
            )
        merged = merged.select(*sel)
        # a negative count can only mean the window was applied against the
        # wrong baseline (cursor corruption the expect-check didn't see,
        # e.g. a hand-edited manifest) — fail the job, don't publish it
        merged = merged.where(
            F.assert_true(
                F.col("cnt") >= 0,
                F.concat(
                    F.lit("negative folded count for group "),
                    F.col(key).cast("string"),
                ),
            ).isNull()
        )
        upsert_parquet(
            spark,
            agg_path,
            merged,
            key=key,
            n_buckets=n_buckets,
            app_meta={CURSOR_KEY: v_now, SOURCE_KEY: source_id},
            app_meta_expect={CURSOR_KEY: v_from},
        )
    finally:
        deltas.unpersist()
    return v_now


def read_aggregate(spark: SparkSession, agg_path: str) -> DataFrame:
    """The maintained aggregate, zero-count rows filtered and the
    synthesized composite-group key hidden — what a consumer sees.
    (``read_keyed_table`` directly if the zero rows or the key matter.)"""
    df = read_keyed_table(spark, agg_path).where(F.col("cnt") > 0)
    return df.drop(GROUP_KEY_COL) if GROUP_KEY_COL in df.columns else df
