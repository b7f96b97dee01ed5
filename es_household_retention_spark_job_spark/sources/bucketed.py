"""Spark-native bucketed tables for shuffle-free co-located joins
(SURVEY §4 "partitioning & shuffle" scale lever).

At 100 TB the dominant cost of ``person ⋈ encounter``-shaped joins is the
shuffle of both fact sides. Writing both tables bucketed (and sorted) by the
join key makes the join a zero-exchange SortMergeJoin: each task reads
bucket i of both sides — the classic co-location strategy, persisted in the
table layout so EVERY downstream join on that key is shuffle-free, not just
one.

Uses the session catalog (``saveAsTable``) because bucket metadata lives in
the catalog, not in parquet itself. tests/test_bucketing.py asserts the
plan has zero Exchange operators and that results match the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (+sorted) catalog table on ``key``."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def cobucket_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key — planned
    with no Exchange when bucket counts match."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
