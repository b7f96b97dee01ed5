"""S7 — keyed partial-document upsert sink over parquet.

The reference writes per-person partial updates with ES
``es.write.operation=upsert`` (HRP:297-302): for each key, fields present in
the update replace the stored fields; unknown keys insert new docs. Parquet
has no point-update, so the engine uses a **hash-bucketed merge** layout:

* the table is laid out as ``_bucket=NN/`` partitions with
  ``_bucket = pmod(xxhash64(key), n_buckets)``;
* an upsert computes the affected buckets from the updates (a distinct over
  the updates only — never a full-table scan), reads ONLY those partitions
  (partition pruning), full-outer merges on the key, and swaps just those
  bucket directories.

Scale story: cost is O(|updates| + |affected buckets|), independent of total
table size; bucket count is chosen so one bucket ≈ one comfortable task
(e.g. 100 TB / 256 MB ⇒ ~400k buckets). On a production lakehouse this
operator maps 1:1 onto Delta/Iceberg ``MERGE INTO`` (same plan: semi-join
pruning + per-file rewrite); the directory-swap here is the dependency-free
equivalent with the same pruning structure.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

BUCKET_COL = "_bucket"
DEFAULT_BUCKETS = 16
LAYOUT_FILE = "_keyed_layout.json"


def _with_bucket(df: DataFrame, key: str, n_buckets: int) -> DataFrame:
    return df.withColumn(BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)))


def _read_layout(path: str) -> dict:
    with open(os.path.join(path, LAYOUT_FILE)) as f:
        return json.load(f)


def _table_schema(df: DataFrame) -> StructType:
    """The table's pinned unified schema: every data column (nullable — an
    upsert may insert keys with missing columns) plus the bucket partition
    column last."""
    fields = [
        StructField(f.name, f.dataType, True)
        for f in df.schema.fields
        if f.name != BUCKET_COL
    ]
    fields.append(StructField(BUCKET_COL, LongType(), True))
    return StructType(fields)


def _write_layout(path: str, key: str, n_buckets: int, schema: StructType) -> None:
    from ..operators.multimodal import codec_backend

    with open(os.path.join(path, LAYOUT_FILE), "w") as f:
        json.dump(
            {
                "key": key,
                "n_buckets": n_buckets,
                "schema": schema.jsonValue(),
                # writer-environment audit: codec-backed artifacts (e.g.
                # thumbnails) are deterministic only per backend, so the
                # manifest records which backend wrote this table — a
                # mixed-backend cluster becomes detectable from the sidecars
                "writer_env": {"image_codec": codec_backend()},
            },
            f,
        )


def _stored_schema(layout: dict) -> StructType | None:
    raw = layout.get("schema")
    return StructType.fromJson(raw) if raw else None


def _swap_dir(src: str, dst: str) -> None:
    """Replace ``dst`` with ``src`` via rename-aside: the old bucket stays
    on disk (as ``<dst>.__old``) until the new one is in place, so a crash
    at any point leaves either the old or the new directory recoverable —
    never a missing bucket (a bare rmtree-then-move has that hole)."""
    if not os.path.exists(src):
        return
    # dot-prefix: hidden from Spark's file index, so a crash-leftover aside
    # dir is never mistaken for a partition directory
    parent, name = os.path.split(dst)
    aside = os.path.join(parent, f".old__{name}")
    shutil.rmtree(aside, ignore_errors=True)
    if os.path.exists(dst):
        os.rename(dst, aside)
    os.rename(src, dst)
    shutil.rmtree(aside, ignore_errors=True)


def write_keyed_table(
    df: DataFrame, path: str, key: str = "person_id", n_buckets: int = DEFAULT_BUCKETS
) -> None:
    """Initial load of a keyed table in the bucketed-merge layout. The bucket
    function (key column + bucket count) and the unified column schema are
    TABLE properties, persisted in a sidecar so later upserts can never
    diverge from the layout and schema evolution stays metadata-only."""
    bucketed = _with_bucket(df, key, n_buckets)
    bucketed.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(path)
    _write_layout(path, key, n_buckets, _table_schema(bucketed))


def read_keyed_table(spark: SparkSession, path: str) -> DataFrame:
    """Read back without the layout column.

    Reads with the PINNED unified schema from the sidecar: schema evolution
    rewrites only the buckets an upsert touches, so older buckets lack
    later-added columns in their footers — an inferred read (which samples
    files) could silently drop such a column. The explicit schema fills it
    with nulls instead, with no mergeSchema footer sweep."""
    try:
        schema = _stored_schema(_read_layout(path))
    except FileNotFoundError:  # plain bucketed parquet without a sidecar
        schema = None
    reader = spark.read.schema(schema) if schema else spark.read
    return reader.parquet(path).drop(BUCKET_COL)


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str = "person_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """ES-style partial upsert: merge ``updates`` into the keyed table at
    ``path``. Columns present in ``updates`` replace stored values for
    matched keys; unmatched keys are inserted (missing columns null).

    An existing table's persisted layout (key, bucket count) always wins over
    the arguments — mixing bucket functions would corrupt the merge.

    The merged data is fully materialized into a temp directory BEFORE any
    target directory is touched, so a failure mid-write leaves the target
    intact (write-then-swap; per-bucket atomic on a POSIX fs)."""
    if not os.path.exists(path):
        write_keyed_table(updates, path, key, n_buckets)
        return

    layout = _read_layout(path)
    if layout["key"] != key:
        raise ValueError(
            f"upsert key {key!r} does not match table layout key {layout['key']!r}"
        )
    n_buckets = layout["n_buckets"]
    stored = _stored_schema(layout)
    if stored is not None:
        # schema evolution guard: new columns are fine (the sidecar schema
        # evolves below), but a TYPE change on an existing column would make
        # old buckets unreadable under the evolved schema — reject it.
        # nullability-insensitive comparison (simpleString drops nullable/
        # containsNull flags): an upsert legitimately carries tighter nested
        # nullability than the stored all-nullable schema
        stored_types = {f.name: f.dataType.simpleString() for f in stored.fields}
        for f in updates.schema.fields:
            if (
                f.name in stored_types
                and f.dataType.simpleString() != stored_types[f.name]
            ):
                raise ValueError(
                    f"upsert column {f.name!r} type {f.dataType.simpleString()} "
                    f"conflicts with stored type {stored_types[f.name]}"
                )

    # persist the update lineage: it is consumed twice (affected-bucket
    # discovery + the merge write) and may be arbitrarily expensive (the
    # whole phase-1 DAG, or a streaming micro-batch recompute)
    u = _with_bucket(updates, key, n_buckets).persist()
    try:
        affected = [r[BUCKET_COL] for r in u.select(BUCKET_COL).distinct().collect()]
        if not affected:
            return
        _merge_and_swap(spark, path, u, key, affected, stored)
    finally:
        u.unpersist()


def _merge_and_swap(
    spark: SparkSession,
    path: str,
    u: DataFrame,
    key: str,
    affected: list,
    stored: StructType | None,
) -> None:
    # read the affected buckets under the PINNED schema: buckets that predate
    # an earlier schema evolution lack the newer columns in their footers,
    # and an inferred read could drop them (Spark samples files for schema)
    reader = spark.read.schema(stored) if stored else spark.read
    target = reader.parquet(path).where(F.col(BUCKET_COL).isin(affected))

    t_cols = [c for c in target.columns if c != BUCKET_COL]
    u_cols = [c for c in u.columns if c != BUCKET_COL]
    all_cols = t_cols + [c for c in u_cols if c not in t_cols]

    t, uu = target.alias("t"), u.alias("u")
    merged = t.join(uu, F.col(f"t.{key}") == F.col(f"u.{key}"), "full_outer")
    matched = F.col(f"u.{key}").isNotNull()
    select: list = []
    for c in all_cols:
        if c == key:
            select.append(F.coalesce(F.col(f"u.{key}"), F.col(f"t.{key}")).alias(key))
        elif c in u_cols and c in t_cols:
            select.append(F.when(matched, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c))
        elif c in u_cols:
            select.append(F.col(f"u.{c}").alias(c))
        else:
            select.append(F.col(f"t.{c}").alias(c))
    select.append(
        F.coalesce(F.col(f"u.{BUCKET_COL}"), F.col(f"t.{BUCKET_COL}")).alias(BUCKET_COL)
    )
    merged = merged.select(*select)

    tmp = f"{path}.__upsert_tmp_{uuid.uuid4().hex[:8]}"
    try:
        merged.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(tmp)
        for b in affected:
            src = os.path.join(tmp, f"{BUCKET_COL}={b}")
            dst = os.path.join(path, f"{BUCKET_COL}={b}")
            _swap_dir(src, dst)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # evolve the pinned schema AFTER the swap: updates may have introduced
    # new columns (present only in the rewritten buckets' files; the sidecar
    # schema makes them visible as nulls everywhere else)
    layout = _read_layout(path)
    _write_layout(path, layout["key"], layout["n_buckets"], _table_schema(merged))
    # Spark caches file listings per path (FileStatusCache); the swap above
    # happened behind its back.
    spark.catalog.refreshByPath(path)


def compact_keyed_table(spark: SparkSession, path: str) -> int:
    """Small-file compaction: rewrite every multi-file bucket into ONE file,
    preserving the layout. Repeated upserts leave one file per write per
    bucket; at 100 TB that read-amplifies every scan (footer parse + seek
    per tiny file), so compaction runs as periodic maintenance — the parquet
    equivalent of Delta/Iceberg OPTIMIZE (bucket count sizes the files:
    ~100 TB / 400k buckets ≈ 256 MB each). Returns #buckets rewritten.

    Same write-then-swap safety as the upsert: a crash mid-compact leaves
    every bucket either old or fully rewritten, never mixed."""
    layout = _read_layout(path)  # asserts this IS a keyed table; untouched
    to_compact = [
        d
        for d in os.listdir(path)
        if d.startswith(f"{BUCKET_COL}=")
        and len(
            [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        )
        > 1
    ]
    if not to_compact:
        return 0
    ids = [int(d.split("=", 1)[1]) for d in to_compact]
    # pinned schema: a compaction must not drop columns that older files in
    # a bucket lack (see read_keyed_table)
    stored = _stored_schema(layout)
    reader = spark.read.schema(stored) if stored else spark.read
    # one task per bucket → exactly one output file per bucket directory
    data = (
        reader.parquet(path)
        .where(F.col(BUCKET_COL).isin(ids))
        .repartition(len(ids), BUCKET_COL)
    )
    tmp = f"{path}.__compact_tmp_{uuid.uuid4().hex[:8]}"
    try:
        data.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(tmp)
        for d in to_compact:
            _swap_dir(os.path.join(tmp, d), os.path.join(path, d))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.catalog.refreshByPath(path)
    return len(to_compact)
