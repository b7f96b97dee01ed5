"""Embedding-column transforms for the training-data pipeline
(beyond-reference; SURVEY §7.1 M7): int8 quantization, per-label centroids,
and nearest-centroid assignment over the ``embeddings`` table
(``vec_id``, ``embedding: array<float>``, ``label``).

These are the storage/eval companions to ``operators/similarity``: a 100 TB
embedding store is kept int8-quantized (4× the vectors per byte of cache and
shuffle), and centroid geometry is the cheap corpus-health signal (label
coherence, drift between snapshots) that doesn't need a full ANN build.

Determinism contract (same as the rest of the docs pipeline): everything the
oracle hash-compares is either exact-integer arithmetic on fixed-point values
(``floor(x · 1e6)``) or sequential left-fold double arithmetic mirrored
expression-for-expression in DuckDB. Notably the per-label centroid SUMS are
integer — float summation order across partitions is nondeterministic, so
summing doubles would break the cross-engine hash; summing scaled longs is
associative and exact.

Zero Python UDFs; per-row work is whole-stage codegen, aggregates are
partial (map-side combine) before their one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import as_double

#: fixed-point scale for exact cross-engine coordinate arithmetic. Testdata
#: components are O(1); 1e6 keeps squared distances < 2^52 at dim 64.
FIX = 1_000_000
#: symmetric int8 range.
QMAX = 127


def _fold_sum(arr: Column) -> Column:
    """Sequential left-fold double sum (order-deterministic, mirrored by
    DuckDB ``list_reduce`` with a prepended 0.0)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def quantize_int8(
    df: DataFrame, emb_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector symmetric int8 quantization, entirely map-side (no shuffle).

    ``scale = 127 / max|x|``; ``q_i = floor(x_i · scale + 0.5)`` (round half
    up — identical in IEEE doubles on both engines). Emits per vector:

    * ``amax_x1e6`` — the quantization range, fixed-point;
    * ``q_md5`` — md5 of the comma-joined int8 codes (the payload that would
      be stored; the oracle recomputing it proves every code matches);
    * ``err_bp`` — reconstruction error ``Σ(x−q/scale)² / Σx²`` in basis
      points (the quality number a quantized store is monitored by);
    * ``n_dims``.

    All-zero vectors quantize to all-zero codes with ``err_bp = 0``.

    At 100 TB this is the compaction pass of an embedding store: pure scan,
    output 64 int8 + one double per vector instead of 64 floats — run it in
    the parquet writer's partition layout and it never shuffles at all.

    Built as CHAINED PROJECTIONS materializing ``_emb`` → ``_amax`` →
    ``_q`` so each is computed once and referenced as an attribute. The
    single-expression form (``scale``/``q`` spliced into transform and
    zip_with lambda bodies) re-evaluated the O(dim) ``amax`` fold per
    array element — Catalyst does no CSE inside lambda bodies — for
    O(dim²) work per vector across five expressions (~0.9 ms/vector
    measured at dim 64; this rewrite is ~20×). CollapseProject keeps the
    stages separate because each alias is non-cheap and multiply
    referenced; everything still rides one codegen stage, zero shuffle.
    """
    base = df.select(id_col, as_double(F.col(emb_col)).alias("_emb"))
    with_amax = base.select(
        id_col,
        "_emb",
        F.aggregate(
            F.col("_emb"), F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
        ).alias("_amax"),
    )
    scale = F.lit(float(QMAX)) / F.col("_amax")
    with_q = with_amax.select(
        id_col,
        "_emb",
        "_amax",
        F.when(
            F.col("_amax") > 0,
            F.transform(
                F.col("_emb"), lambda x: F.floor(x * scale + F.lit(0.5)).cast("long")
            ),
        )
        .otherwise(F.transform(F.col("_emb"), lambda _: F.lit(0).cast("long")))
        .alias("_q"),
    )
    deq_err = F.zip_with(
        F.col("_emb"),
        F.col("_q"),
        lambda x, qi: (x - qi.cast("double") / scale)
        * (x - qi.cast("double") / scale),
    )
    ref = _fold_sum(F.transform(F.col("_emb"), lambda x: x * x))
    err_bp = F.when(
        (F.col("_amax") > 0) & (ref > 0), F.floor(_fold_sum(deq_err) * 10000 / ref)
    ).otherwise(F.lit(0))
    return with_q.select(
        id_col,
        F.floor(F.col("_amax") * FIX).cast("long").alias("amax_x1e6"),
        F.md5(
            F.concat_ws(",", F.transform(F.col("_q"), lambda x: x.cast("string")))
        ).alias("q_md5"),
        err_bp.cast("long").alias("err_bp"),
        F.size(F.col("_emb")).cast("long").alias("n_dims"),
    )


def _fixed(emb_col: str) -> Column:
    """Embedding as fixed-point longs — the exact-arithmetic working form."""
    return F.transform(
        as_double(F.col(emb_col)), lambda x: F.floor(x * FIX).cast("long")
    )


def label_centroids(
    df: DataFrame, emb_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label centroid in fixed-point: ``centroid_q[d] = (Σ floor(x·1e6))
    div n``. One row per (label, dim).

    Shape: ``posexplode`` (64 rows per vector) → partial-aggregated sum/count
    → one shuffle on (label, dim) with ~|labels|·dim groups. The explode is
    map-local and the partial agg collapses it before the exchange, so the
    shuffle carries only the group table regardless of corpus size — this is
    the scale-correct way to sum arrays elementwise (Spark has no native
    elementwise array-sum aggregate)."""
    exploded = df.select(
        label_col, F.posexplode(_fixed(emb_col)).alias("dim", "xq")
    )
    return (
        exploded.groupBy(label_col, "dim")
        .agg(F.sum("xq").alias("sum_q"), F.count(F.lit(1)).alias("n_vecs"))
        .select(
            label_col,
            F.col("dim").cast("int").alias("dim"),
            F.expr("sum_q div n_vecs").cast("long").alias("centroid_q"),
            F.col("n_vecs").cast("long").alias("n_vecs"),
        )
    )


def _centroid_arrays(df: DataFrame, emb_col: str, label_col: str) -> DataFrame:
    """(label, centroid: array<long>) — centroid rows packed back into
    dim-ordered arrays (sort by dim inside the struct array, then strip)."""
    cents = label_centroids(df, emb_col, label_col)
    return cents.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "centroid_q"))),
            lambda s: s["centroid_q"],
        ).alias("centroid")
    )


def nearest_centroid(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Assign each vector to its nearest label centroid (squared L2 in
    fixed-point — exact integers, ties broken by smaller label).

    Output: (vec_id, label, pred_label, dist_q, is_match).

    Shape: the centroid table is |labels| rows — broadcast; distances are
    ``zip_with``/``aggregate`` codegen per (vector, centroid) pair; the
    argmin is a per-vector window over |labels| rows. The corpus never
    shuffles — only the tiny centroid side moves. This is the evaluation
    loop of a quantizer/classifier at 100 TB: one scan, k·dim multiplies
    per row."""
    cents = _centroid_arrays(df, emb_col, label_col)
    vecs = df.select(id_col, label_col, _fixed(emb_col).alias("_xq"))
    dist = F.aggregate(
        F.zip_with(
            F.col("_xq"), F.col("centroid"), lambda x, c: (x - c) * (x - c)
        ),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )
    scored = vecs.crossJoin(
        F.broadcast(cents.select(F.col(label_col).alias("cand"), "centroid"))
    ).select(id_col, label_col, "cand", dist.alias("dist_q"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("dist_q").asc(), F.col("cand").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(
            id_col,
            label_col,
            F.col("cand").alias("pred_label"),
            "dist_q",
            (F.col("cand") == F.col(label_col)).alias("is_match"),
        )
    )


def centroid_eval(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Per-label nearest-centroid accuracy — the label-coherence scorecard
    (one row per label: n_vecs, n_correct, acc_bp)."""
    assigned = nearest_centroid(df, emb_col, id_col, label_col)
    return (
        assigned.groupBy(label_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum(F.col("is_match").cast("long")).cast("long").alias("n_correct"),
        )
        .select(
            label_col,
            "n_vecs",
            "n_correct",
            F.floor(F.col("n_correct") * 10000 / F.col("n_vecs"))
            .cast("long")
            .alias("acc_bp"),
        )
    )
