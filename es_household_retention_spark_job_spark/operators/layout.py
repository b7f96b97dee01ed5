"""Z-order (Morton) data layout for multi-column data skipping.

Parquet readers (Spark's included) skip row groups / files whose footer
min-max statistics exclude the query predicate. A layout sorted on ONE
column gives tight min-max ranges — and therefore skipping — on that column
only; a Z-ORDERED layout interleaves the bits of several columns' rank
buckets so that every written unit stays range-tight on EVERY participating
column. This is the lakehouse ``OPTIMIZE ... ZORDER BY`` analog (Delta/
Iceberg), built from plain DataFrame ops:

1. per column: quantile cutoffs (a ≤64-value driver-side array — the same
   class of driver metadata as a broadcast join's build side) map each value
   to a rank bucket via a chain of codegen comparisons — equal-frequency, so
   skewed distributions still fill buckets evenly;
2. the bucket indices are bit-interleaved into one Morton key (pure integer
   expressions, whole-stage codegen);
3. ``repartitionByRange(morton_key)`` + ``sortWithinPartitions`` clusters
   the data so each output file (and each row group inside it) covers a
   small hyper-rectangle of the key space.

At 100 TB the win is at the scan: a predicate on any Z-columns prunes most
files before a byte is read. ``skippable_fraction`` computes the evidence
directly from the parquet footers (pyarrow), which is exactly the metadata
a cluster reader uses to skip.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per column in the Morton key; 2 columns × 6 bits = 64 buckets each,
#: 4096 distinct keys — plenty of range-partition resolution while keeping
#: the cutoff arrays tiny.
DEFAULT_BITS = 6


def rank_bucket(col: Column, cutoffs: list[float]) -> Column:
    """Equal-frequency bucket index of ``col`` given ascending quantile
    ``cutoffs`` (len = 2^bits - 1): a chain of ≥ comparisons, fully inside
    codegen. NULLs land in bucket 0 (they sort first in parquet stats)."""
    idx: Column = F.lit(0)
    for c in cutoffs:
        idx = idx + F.when(col >= F.lit(c), 1).otherwise(0)
    return idx


def morton_key(bucket_cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Bit-interleave N bucket indices (each < 2^bits) into one long:
    output bit (j*N + i) = bit j of column i — the classic Morton curve."""
    n = len(bucket_cols)
    key: Column = F.lit(0).cast("long")
    for i, b in enumerate(bucket_cols):
        for j in range(bits):
            key = key + (
                F.shiftleft(F.shiftright(b.cast("long"), j) % 2, j * n + i)
            )
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` to parquet Z-ordered on ``cols``.

    The quantile pass is one aggregation job (approxQuantile, driver gets
    only the cutoff arrays); the layout pass is one range shuffle + local
    sort. ``n_files`` is the file-level pruning granularity — size it so one
    file ≈ one comfortable scan task (100 TB / 256 MB ⇒ ~400k files)."""
    n_buckets = 1 << bits
    qs = [i / n_buckets for i in range(1, n_buckets)]
    buckets = [
        rank_bucket(F.col(c), df.approxQuantile(c, qs, 0.001)) for c in cols
    ]
    key = morton_key(buckets, bits)
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def linear_write(df: DataFrame, path: str, col: str, n_files: int = 8) -> None:
    """Single-column sorted layout (the thing Z-order improves on): tight
    ranges on ``col``, arbitrary ranges on every other column."""
    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_column_ranges(path: str, col: str) -> list[tuple]:
    """(min, max) of ``col`` per parquet data file, straight from the
    footers — the exact statistics a reader's skipping logic consults."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = md.schema.names.index(col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return []  # stats missing: nothing is skippable
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((lo, hi))
    return out


def skippable_fraction(path: str, col: str, value) -> float:
    """Fraction of data files a point predicate ``col = value`` can skip
    using footer min-max alone (the reader-side pruning rate)."""
    ranges = file_column_ranges(path, col)
    if not ranges:
        return 0.0
    skipped = sum(1 for lo, hi in ranges if not (lo <= value <= hi))
    return skipped / len(ranges)
