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

Aggregate families, by retractability (round 10 extends the original
count/sum pair):

* **count, sum** — fully decomposable: every change row folds in O(1)
  (avg = sum/cnt downstream).
* **min, max** — decomposable on APPLY (``least``/``greatest`` with the
  stored extremum) but NOT on retraction: deleting the stored minimum
  says nothing about the runner-up. The fold detects exactly that case
  (a retracted value ≤ the stored min / ≥ the stored max) and recomputes
  ONLY the suspect groups from the pinned source version — the
  documented O(suspect groups' source rows) fallback; all other groups
  stay O(changes). Pretending min/max folds are always O(changes) would
  simply be wrong.
* **distinct count (HLL)** — the sketch (Spark's DataSketches
  ``hll_sketch_agg``/``hll_union``) merges on apply but cannot retract
  at all; any retraction of a non-null value marks the group suspect
  and triggers the same source recompute. The stored state is the
  BINARY sketch; ``read_aggregate`` surfaces the estimate as
  ``dcnt_<col>`` (the ±rsd accuracy contract is the caller's, same as
  ``approx_count_distinct``).
* **approximate percentiles (fixed-bucket histogram, round 11)** — the
  canonical FULLY-retractable quantile sketch: the stored state is a
  per-group ``array<long>`` of bucket counts over a caller-fixed
  ``(lo, hi, n_buckets)`` spec, and a retraction simply decrements its
  bucket — unlike min/max/HLL there is NO suspect-group source
  recompute, ever; every fold is O(changes). Accuracy is the bucket
  width (the caller's spec, recorded in the table's commit metadata
  and validated on every later fold); ``histogram_percentile`` reads
  any quantile out as the exact INTEGER lower bound of the covering
  bucket, so the estimate is deterministic integer math end to end —
  cross-engine hashable, unlike interpolated t-digest floats.

100 TB shape: fold cost = change-feed read (sidecar/bucket-confined, see
``read_changes``) + one shuffle of the CHANGE rows to group keys + a point
lookup of |affected groups| agg rows + an upsert of |affected groups| rows
— plus, only when a retraction hits an extremum/sketch, one source read
semi-join-pruned to the suspect groups. Nothing else scales with the
source table or the aggregate table size.

Reference parity: the reference job's terminal step is an ES terms-agg
dashboard query over the maintained store (HouseholdRetentionProcessing
.scala:es "households without retention" readback); this module is the
beyond-reference generalization — the dashboard aggregate maintained
incrementally instead of recomputed per refresh.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
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

#: app-meta key recording the histogram bucket spec the stored arrays were
#: built under (JSON ``{col: [lo, hi, n_buckets]}``) — a later fold with a
#: DIFFERENT spec would silently mix incompatible bucketings, so the spec
#: is validated against this record on every fold
HIST_SPEC_KEY = "fold_hist_spec"

#: largest affected-group count served by the point-lookup read of prior
#: aggregate rows (the group list is collected to the driver — bounded by
#: this cap); beyond it the fold joins against a full aggregate-table scan
#: (still one shuffle of |groups| + |agg| rows, never of the SOURCE table)
FOLD_LOOKUP_MAX = int(os.environ.get("SPARK_GRAFT_FOLD_LOOKUP_MAX", "10000"))

#: synthesized single-column key for MULTI-column groups (the bucketed
#: layout addresses one key column); unit-separator-joined string casts of
#: the group values — the group columns themselves stay as data columns
GROUP_KEY_COL = "_group"

#: stored-sketch column prefix (binary HLL state; hidden by read_aggregate)
HLL_COL = "_hll_"

#: stored-histogram column prefix (array<long> bucket counts, length
#: n_buckets + 2 — slot 0 is underflow, slots 1..n the buckets, slot n+1
#: overflow; hidden by read_aggregate, served by histogram_percentile)
HIST_COL = "_hist_"


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


def _hll_merge(old, new):
    """Null-safe sketch union: hll_union refuses nulls, but either side is
    legitimately absent (new group / no applied rows in the window)."""
    return (
        F.when(old.isNull(), new)
        .when(new.isNull(), old)
        .otherwise(F.hll_union(old, new))
    )


def _validate_hist_spec(hist_cols: dict) -> dict[str, tuple[int, int, int]]:
    """Normalize and sanity-check ``{col: (lo, hi, n_buckets)}``. The
    integer-exactness contract needs (hi - lo) divisible by n (bucket
    lower bounds are exact longs) and (hi - lo) * n below 2**53 (the one
    long*long product that transits a double division stays exact)."""
    out = {}
    for c, spec in hist_cols.items():
        lo, hi, n = (int(v) for v in spec)
        if not (lo < hi and n >= 1):
            raise ValueError(f"histogram spec for {c!r} needs lo < hi, n >= 1")
        if (hi - lo) % n:
            raise ValueError(
                f"histogram spec for {c!r}: (hi - lo) = {hi - lo} not "
                f"divisible by n_buckets = {n} (bucket bounds must be "
                "exact integers)"
            )
        if (hi - lo) * n >= 2**53:
            raise ValueError(f"histogram spec for {c!r} too wide for exact math")
        out[c] = (lo, hi, n)
    return out


def _hist_bucket(c: str, lo: int, hi: int, n: int):
    """Bucket index of a value: 0 = underflow (< lo), 1..n = the equal-width
    buckets of [lo, hi), n+1 = overflow (>= hi); null passes through.
    Integer math throughout — the double division is exact under the
    validated (hi - lo) * n < 2**53 bound, and its operands are
    non-negative so floor == the oracle engines' integer division."""
    x = F.col(c).cast("long")
    return (
        F.when(x.isNull(), F.lit(None).cast("long"))
        .when(x < lo, F.lit(0).cast("long"))
        .when(x >= hi, F.lit(n + 1).cast("long"))
        .otherwise(
            F.floor(((x - F.lit(lo)) * F.lit(n)) / F.lit(hi - lo)).cast("long")
            + 1
        )
    )


def _hist_array(c: str, lo: int, hi: int, n: int, weight) -> list:
    """Per-bucket signed-count sum expressions (one array element each);
    ``weight`` is +1/-1 over change rows, or literal 1 over source rows."""
    b = _hist_bucket(c, lo, hi, n)
    return [
        F.sum(F.when(b == i, weight).otherwise(F.lit(0))).cast("long")
        for i in range(n + 2)
    ]


def _delta_exprs(
    sum_cols: tuple[str, ...],
    min_cols: tuple[str, ...],
    max_cols: tuple[str, ...],
    distinct_cols: tuple[str, ...],
    weight,
    applied,
    hist_cols: dict[str, tuple[int, int, int]] | None = None,
) -> list:
    """Per-group fold inputs over change rows: the signed count, signed
    sums (null measures ignored — SQL SUM semantics), the window's applied
    extrema and retracted extrema (suspicion probes), the applied-values
    sketch, and the retracted-non-null counter per distinct column."""
    exprs = [F.sum(weight).cast("long").alias("_dcnt")]
    for c in sum_cols:
        exprs.append(
            F.sum(F.when(F.col(c).isNotNull(), F.col(c) * weight)).alias(
                f"_dsum_{c}"
            )
        )
    for c in sorted(set(min_cols)):
        exprs.append(F.min(F.when(applied, F.col(c))).alias(f"_imin_{c}"))
        exprs.append(F.min(F.when(~applied, F.col(c))).alias(f"_rmin_{c}"))
    for c in sorted(set(max_cols)):
        exprs.append(F.max(F.when(applied, F.col(c))).alias(f"_imax_{c}"))
        exprs.append(F.max(F.when(~applied, F.col(c))).alias(f"_rmax_{c}"))
    for c in sorted(set(distinct_cols)):
        exprs.append(
            F.hll_sketch_agg(F.when(applied, F.col(c))).alias(f"_ihll_{c}")
        )
        exprs.append(
            F.sum(
                F.when(~applied & F.col(c).isNotNull(), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias(f"_rdist_{c}")
        )
    for c, (lo, hi, n) in sorted((hist_cols or {}).items()):
        # fully retractable: the delta histogram carries SIGNED bucket
        # counts (applies +1, retractions -1) and merges by element-wise
        # add — no suspicion flag exists for this family
        exprs.append(
            F.array(*_hist_array(c, lo, hi, n, weight)).alias(f"_dhist_{c}")
        )
    return exprs


def _extremum_exprs(
    min_cols: tuple[str, ...],
    max_cols: tuple[str, ...],
    distinct_cols: tuple[str, ...],
    prefix: str = "",
    hist_cols: dict[str, tuple[int, int, int]] | None = None,
) -> list:
    """Ground-truth aggregate expressions over source rows (bootstrap and
    the suspect-group recompute share them; histograms appear only at
    bootstrap — they never need the recompute)."""
    exprs = []
    for c in sorted(set(min_cols)):
        exprs.append(F.min(c).alias(f"{prefix}min_{c}"))
    for c in sorted(set(max_cols)):
        exprs.append(F.max(c).alias(f"{prefix}max_{c}"))
    for c in sorted(set(distinct_cols)):
        exprs.append(F.hll_sketch_agg(c).alias(f"{prefix}{HLL_COL}{c}"))
    for c, (lo, hi, n) in sorted((hist_cols or {}).items()):
        exprs.append(
            F.array(*_hist_array(c, lo, hi, n, F.lit(1))).alias(
                f"{prefix}{HIST_COL}{c}"
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
    min_cols: tuple[str, ...] | list[str] = (),
    max_cols: tuple[str, ...] | list[str] = (),
    distinct_cols: tuple[str, ...] | list[str] = (),
    hist_cols: dict[str, tuple[int, int, int]] | None = None,
) -> int:
    """Bring the grouped aggregate of ``source_path`` by ``group_col``
    (one column name, or a list for composite groups — the
    terms-agg-by-(client, month) shape) up to date at ``agg_path``;
    returns the source version the aggregate now reflects. First call
    bootstraps (one full grouped scan of the pinned current version);
    later calls fold only the change feed since the recorded cursor.
    Output columns: the group column(s), ``cnt`` (long), ``sum_<c>`` /
    ``min_<c>`` / ``max_<c>`` per requested column, a binary
    ``_hll_<c>`` sketch per distinct column (``read_aggregate`` surfaces
    the estimate as ``dcnt_<c>`` and hides the sketch; multi-column
    groups also carry the synthesized ``_group`` key, likewise hidden),
    and an ``array<long>`` ``_hist_<c>`` bucket histogram per
    ``hist_cols`` entry (``{col: (lo, hi, n_buckets)}`` — spec recorded
    at bootstrap and enforced on every later fold; quantiles read out
    via ``read_percentiles``).
    A group whose count reaches zero keeps a ``cnt=0`` row (sums zeroed,
    extrema/sketches nulled) — readers filter, and a later revival is a
    plain update, not a resurrection special case.

    Retraction semantics per family (module docstring): sums fold both
    directions; min/max and distinct sketches fold applies and fall back
    to a suspect-group-confined source recompute when a retraction could
    have removed the stored extremum / a distinct value. An update that
    leaves the tracked column unchanged still produces a pre+post pair
    for the GROUP (some other column changed), so the suspicion test is
    conservative — correctness never depends on the fold guessing which
    retracted values still exist.

    Null group keys are rejected: the aggregate row's KEY would be null,
    which the bucketed layout cannot address for point lookups.

    Idempotent per version: a fold at an unchanged cursor is a no-op; a
    re-sent fold from a stale cursor aborts with ``ConcurrentWriteError``
    (the committed cursor no longer matches ``app_meta_expect``)."""
    group_cols = [group_col] if isinstance(group_col, str) else list(group_col)
    composite = len(group_cols) > 1
    key = GROUP_KEY_COL if composite else group_cols[0]
    sum_cols = tuple(sum_cols)
    min_cols = tuple(min_cols)
    max_cols = tuple(max_cols)
    distinct_cols = tuple(distinct_cols)
    hist_cols = _validate_hist_spec(hist_cols or {})
    hist_spec_json = json.dumps(
        {c: list(s) for c, s in hist_cols.items()}, sort_keys=True
    )
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
            *_extremum_exprs(
                min_cols, max_cols, distinct_cols, hist_cols=hist_cols
            ),
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
            app_meta={
                CURSOR_KEY: v_now,
                SOURCE_KEY: source_id,
                HIST_SPEC_KEY: hist_spec_json,
            },
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
    recorded_spec = meta.get(HIST_SPEC_KEY, "{}")
    if recorded_spec != hist_spec_json:
        raise ValueError(
            f"histogram spec mismatch at {agg_path}: stored arrays were "
            f"built under {recorded_spec}, fold requested {hist_spec_json} "
            "(bucketings cannot be mixed — bootstrap a fresh aggregate)"
        )
    if v_now == v_from:
        return v_from  # nothing published since the last fold
    # COLUMN-SCOPED feed (round 11): the fold only touches the group and
    # measure columns, so the feed compares/reports exactly those — a
    # source change confined to other columns nets out before it reaches
    # the retract/apply math (it would cancel there anyway), and the
    # state-diff tiers' preimage scans prune to the scoped width on disk
    # (the partial-window read on a wide store drops from O(row bytes)
    # to O(scoped bytes); plan-pinned in test_partial_deltas)
    ch = read_changes(
        spark,
        source_path,
        v_from,
        v_now,
        columns=sorted(
            set(group_cols)
            | set(sum_cols)
            | set(min_cols)
            | set(max_cols)
            | set(distinct_cols)
            | set(hist_cols)
        ),
    )
    applied = F.col(CHANGE_TYPE_COL).isin("insert", "update_postimage")
    weight = F.when(applied, F.lit(1)).otherwise(F.lit(-1))
    deltas = _with_key(
        ch.groupBy(*group_cols).agg(
            *_delta_exprs(
                sum_cols,
                min_cols,
                max_cols,
                distinct_cols,
                weight,
                applied,
                hist_cols=hist_cols,
            )
        )
    )
    # one bounded materialization decides the old-row read strategy; the
    # deltas feed two plans below, so cache across them
    deltas = deltas.persist()
    cached = [deltas]
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
        new_cnt = (
            F.coalesce(F.col("o.cnt"), F.lit(0)) + F.col("d._dcnt")
        ).cast("long")
        sel = [
            *[F.col(f"d.{c}").alias(c) for c in group_cols],
            *([F.col(f"d.{GROUP_KEY_COL}").alias(GROUP_KEY_COL)] if composite else []),
            new_cnt.alias("cnt"),
        ]
        for c in sum_cols:
            oc, dc = out_cols[c], f"_dsum_{c}"
            zero = F.lit(0).cast(deltas.schema[dc].dataType)
            sel.append(
                F.when(new_cnt == 0, zero)
                .otherwise(
                    F.coalesce(F.col(f"o.{oc}"), zero)
                    + F.coalesce(F.col(f"d.{dc}"), zero)
                )
                .alias(oc)
            )
        # non-retractable families: the APPLY side folds (least/greatest/
        # sketch-union with the stored state); a retraction that could
        # have removed the stored extremum or a distinct value raises a
        # per-group SUSPECT flag — those groups are recomputed from the
        # pinned source below, everything else stays O(changes)
        sus_flags = []
        for c in sorted(set(min_cols)):
            oc = f"min_{c}"
            cand = F.least(F.col(f"o.{oc}"), F.col(f"d._imin_{c}"))
            sel.append(F.when(new_cnt == 0, F.lit(None)).otherwise(cand).alias(oc))
            sus_flags.append(
                (
                    (new_cnt > 0)
                    & F.col(f"d._rmin_{c}").isNotNull()
                    & F.col(f"o.{oc}").isNotNull()
                    & (F.col(f"d._rmin_{c}") <= F.col(f"o.{oc}"))
                ).alias(f"_sus_min_{c}")
            )
        for c in sorted(set(max_cols)):
            oc = f"max_{c}"
            cand = F.greatest(F.col(f"o.{oc}"), F.col(f"d._imax_{c}"))
            sel.append(F.when(new_cnt == 0, F.lit(None)).otherwise(cand).alias(oc))
            sus_flags.append(
                (
                    (new_cnt > 0)
                    & F.col(f"d._rmax_{c}").isNotNull()
                    & F.col(f"o.{oc}").isNotNull()
                    & (F.col(f"d._rmax_{c}") >= F.col(f"o.{oc}"))
                ).alias(f"_sus_max_{c}")
            )
        for c in sorted(set(distinct_cols)):
            oc = f"{HLL_COL}{c}"
            cand = _hll_merge(F.col(f"o.{oc}"), F.col(f"d._ihll_{c}"))
            sel.append(F.when(new_cnt == 0, F.lit(None)).otherwise(cand).alias(oc))
            sus_flags.append(
                ((new_cnt > 0) & (F.col(f"d._rdist_{c}") > 0)).alias(
                    f"_sus_hll_{c}"
                )
            )
        for c, (lo, hi, n) in sorted(hist_cols.items()):
            # element-wise add of the signed delta histogram — retractions
            # decrement their bucket directly, no suspicion flag
            oc = f"{HIST_COL}{c}"
            zeros = F.array_repeat(F.lit(0).cast("long"), n + 2)
            cand = F.zip_with(
                F.coalesce(F.col(f"o.{oc}"), zeros),
                F.coalesce(F.col(f"d._dhist_{c}"), zeros),
                lambda a, b: a + b,
            )
            sel.append(
                F.when(new_cnt == 0, F.lit(None)).otherwise(cand).alias(oc)
            )
        merged = merged.select(*sel, *sus_flags)
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
        for c in sorted(hist_cols):
            # same cursor-corruption detector as the count: a bucket can
            # only fold negative if the window was applied against the
            # wrong baseline
            oc = f"{HIST_COL}{c}"
            merged = merged.where(
                F.assert_true(
                    F.col(oc).isNull()
                    | F.forall(F.col(oc), lambda v: v >= 0),
                    F.concat(
                        F.lit("negative folded histogram bucket for group "),
                        F.col(key).cast("string"),
                    ),
                ).isNull()
            )
        sus_names = [f.name for f in merged.schema.fields if f.name.startswith("_sus_")]
        if sus_names:
            merged = merged.persist()
            cached.append(merged)
            any_sus = None
            for n in sus_names:
                any_sus = F.col(n) if any_sus is None else (any_sus | F.col(n))
            need = merged.where(any_sus)
            if need.limit(1).count():
                # O(suspect groups) source recompute, pinned at v_now so a
                # concurrent source publish cannot tear the ground truth
                src = _with_key(
                    read_keyed_table(spark, source_path, version=v_now)
                )
                rec = (
                    src.join(need.select(key), key, "left_semi")
                    .groupBy(key)
                    .agg(
                        *_extremum_exprs(
                            min_cols, max_cols, distinct_cols, prefix="_rec_"
                        )
                    )
                )
                merged = merged.join(rec, on=key, how="left")
                repl = []
                for c in sorted(set(min_cols)):
                    repl.append((f"min_{c}", f"_sus_min_{c}", f"_rec_min_{c}"))
                for c in sorted(set(max_cols)):
                    repl.append((f"max_{c}", f"_sus_max_{c}", f"_rec_max_{c}"))
                for c in sorted(set(distinct_cols)):
                    repl.append(
                        (f"{HLL_COL}{c}", f"_sus_hll_{c}", f"_rec_{HLL_COL}{c}")
                    )
                for out, sus, rec_c in repl:
                    merged = merged.withColumn(
                        out,
                        F.when(F.col(sus), F.col(rec_c)).otherwise(F.col(out)),
                    )
                merged = merged.drop(*[r[2] for r in repl])
        merged = merged.drop(*sus_names)
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
        for df_ in cached:
            df_.unpersist()
    return v_now


def read_aggregate(spark: SparkSession, agg_path: str) -> DataFrame:
    """The maintained aggregate, zero-count rows filtered, the synthesized
    composite-group key hidden, each stored HLL sketch surfaced as its
    ``dcnt_<col>`` estimate, and the raw histogram arrays hidden (read
    quantiles out with ``read_percentiles``) — what a consumer sees.
    (``read_keyed_table`` directly if the zero rows, the key, or the raw
    sketch/histogram state matters.)"""
    df = read_keyed_table(spark, agg_path).where(F.col("cnt") > 0)
    for f in df.schema.fields:
        if f.name.startswith(HLL_COL):
            c = f.name[len(HLL_COL):]
            df = df.withColumn(
                f"dcnt_{c}",
                F.when(
                    F.col(f.name).isNull(), F.lit(0)
                )
                .otherwise(F.hll_sketch_estimate(F.col(f.name)))
                .cast("long"),
            ).drop(f.name)
        elif f.name.startswith(HIST_COL):
            df = df.drop(f.name)
    return df.drop(GROUP_KEY_COL) if GROUP_KEY_COL in df.columns else df


def hist_specs(agg_path: str) -> dict[str, tuple[int, int, int]]:
    """The histogram bucket spec the aggregate's stored arrays were built
    under (recorded in commit metadata at bootstrap)."""
    raw = json.loads(table_app_meta(agg_path).get(HIST_SPEC_KEY, "{}"))
    return {c: tuple(int(v) for v in s) for c, s in raw.items()}


def histogram_percentile(
    hist, spec: tuple[int, int, int], q_num: int, q_den: int
):
    """Column expression: the q-th percentile read out of a stored bucket
    histogram as the exact INTEGER lower bound of the bucket holding the
    ceil(q * cnt)-th smallest value. Deterministic integer math end to
    end (rank and bucket bounds never touch inexact floats), so the
    estimate hashes identically across engines — the property that lets
    a percentile row sit in the hash gate at all. Accuracy is one bucket
    width by construction. Null when the group's values all fell below
    ``lo`` (no defined lower bound) or the histogram is null; the
    overflow bucket reads as ``hi``. Callers size the spec to cover the
    data — that is the caller-owned half of the accuracy contract."""
    lo, hi, n = spec
    if not (0 < q_num <= q_den):
        raise ValueError("quantile must satisfy 0 < q_num/q_den <= 1")
    width = (hi - lo) // n
    hist = F.col(hist) if isinstance(hist, str) else hist
    total = F.aggregate(hist, F.lit(0).cast("long"), lambda a, x: a + x)
    # ceil(total * q) via integer arithmetic; the double division is exact
    # under the validated spec bound (operands < 2**53)
    rank = F.floor((total * q_num + (q_den - 1)) / F.lit(q_den)).cast("long")
    pairs = F.zip_with(
        hist,
        F.sequence(F.lit(0), F.lit(n + 1)),
        lambda c, i: F.struct(c.alias("c"), i.alias("i")),
    )
    # single left fold carrying (cumulative count, first index reaching the
    # rank): O(n) per row, no shuffle, no UDF
    acc0 = F.struct(
        F.lit(0).cast("long").alias("cum"), F.lit(-1).alias("idx")
    )
    folded = F.aggregate(
        pairs,
        acc0,
        lambda acc, p: F.struct(
            (acc["cum"] + p["c"]).alias("cum"),
            F.when(acc["idx"] >= 0, acc["idx"])
            .when((acc["cum"] + p["c"]) >= rank, p["i"])
            .otherwise(F.lit(-1))
            .alias("idx"),
        ),
    )
    idx = folded["idx"]
    return (
        F.when(hist.isNull() | (total == 0) | (idx <= 0), F.lit(None))
        .when(idx >= n + 1, F.lit(hi))
        .otherwise(F.lit(lo) + (idx - 1) * F.lit(width))
        .cast("long")
    )


def read_percentiles(
    spark: SparkSession,
    agg_path: str,
    quantiles: dict[str, list[tuple[int, int]]],
) -> DataFrame:
    """The maintained aggregate with percentile columns read out of the
    stored histograms: ``{col: [(q_num, q_den), ...]}`` adds a
    ``p<round(100q)>_<col>`` long per requested quantile, spec taken from
    the bootstrap record. Zero-count rows filtered, raw arrays hidden."""
    specs = hist_specs(agg_path)
    df = read_keyed_table(spark, agg_path).where(F.col("cnt") > 0)
    for c, qs in sorted(quantiles.items()):
        if c not in specs:
            raise ValueError(f"no histogram maintained for column {c!r}")
        for q_num, q_den in qs:
            name = f"p{round(100 * q_num / q_den)}_{c}"
            df = df.withColumn(
                name,
                histogram_percentile(f"{HIST_COL}{c}", specs[c], q_num, q_den),
            )
    for f in df.schema.fields:
        if f.name.startswith(HIST_COL) or f.name.startswith(HLL_COL):
            df = df.drop(f.name)
    return df.drop(GROUP_KEY_COL) if GROUP_KEY_COL in df.columns else df


def read_topk(
    spark: SparkSession,
    agg_path: str,
    group_cols: list[str] | tuple[str, ...],
    item_col: str,
    k: int,
) -> DataFrame:
    """Exact per-group top-k most-frequent items, served from a
    fold-maintained composite-group count aggregate: maintain
    ``fold_aggregate(group_col=[*group_cols, item_col])`` (every change
    row is a retractable ±1 on its (group, item) count — the machinery
    this module already has), then this read ranks within each group by
    (cnt desc, item asc — deterministic ties) and keeps ``k``.

    EXACT by construction, unlike the streaming-summary alternatives
    (space-saving / count-min) — which is not a luxury but the point:
    those sketches cannot retract, and this table's change feed carries
    deletes and update preimages. The cost is state O(distinct (group,
    item)) instead of O(k) per group; the read shuffles only the
    AGGREGATE table (never the source), so the trade is a bounded,
    maintained serving table — the same shape Delta/Hudi users
    materialize for top-N dashboards."""
    df = read_aggregate(spark, agg_path)
    w = Window.partitionBy(
        *[F.col(c) for c in group_cols]
    ).orderBy(F.col("cnt").desc(), F.col(item_col).asc())
    return (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            *group_cols,
            item_col,
            "cnt",
            F.col("rank").cast("int").alias("rank"),
        )
    )
