"""Cost-based optimization: catalog statistics + stats-driven join planning.

The engine's plans are declarative, so the quality of a multi-way join
order is Catalyst's call — and Catalyst can only call it well if it knows
table and column cardinalities. On parquet *paths* Spark sees just file
sizes; registering the data as catalog tables and running
``ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS`` gives the
optimizer rowCount, distinct counts, min/max and null counts per column,
which feed:

* **CBO join reordering** (``spark.sql.cbo.joinReorder.enabled``): the
  DP-based planner re-orders an inner-join cluster by estimated cost
  instead of syntactic order — exactly what saves a 100 TB fact-fact join
  from running before a selective dimension filter has shrunk one side.
* **Size estimation everywhere else**: broadcast-vs-shuffle decisions and
  AQE's initial partition sizing start from these stats instead of raw
  file bytes.

This module is deliberately *evidence-producing*: ``table_stats`` and
``plan_stats`` read back what the optimizer actually knows, and
tests/test_cbo.py asserts (a) ANALYZE populated row/column stats, (b) the
optimized plan carries a rowCount, and (c) with CBO on, a deliberately
badly-ordered join is re-ordered away from its syntactic shape.

At 100 TB the operational model is: ANALYZE runs once per table load (it
is a single distributed scan producing per-column sketches), queries then
plan against the cached catalog stats — the scan cost is amortized over
every subsequent query.
"""

from __future__ import annotations

import os
import re
import shutil
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the conf keys the CBO path needs; values are restored by `cbo_session`.
_CBO_CONFS = {
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # stats-based star-schema detection also keys off CBO being on
    "spark.sql.cbo.planStats.enabled": "true",
}


def register_stats_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = ("region", "nation", "customer", "orders", "lineitem"),
    db: str = "cbo_demo",
) -> None:
    """Register parquet tables in the session catalog and ANALYZE them.

    ``saveAsTable`` materializes into the session warehouse dir (tests point
    this at a tmpdir); ANALYZE then computes table rowCount/sizeInBytes and
    per-column NDV/min/max/null-count histogram-level stats. Idempotent —
    re-registering drops and replaces."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {db}.{t}")
        # an in-memory metastore forgets tables across sessions but their
        # managed locations survive on disk; purge orphans or saveAsTable
        # refuses with LOCATION_ALREADY_EXISTS
        loc = os.path.join(re.sub(r"^file:", "", warehouse), f"{db}.db", t)
        if os.path.exists(loc):
            shutil.rmtree(loc)
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.mode(
            "overwrite"
        ).saveAsTable(f"{db}.{t}")
        spark.sql(f"ANALYZE TABLE {db}.{t} COMPUTE STATISTICS FOR ALL COLUMNS")


def table_stats(spark: SparkSession, table: str) -> dict[str, int]:
    """rowCount / sizeInBytes the catalog holds for ``table`` (what ANALYZE
    produced and what the optimizer will read)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    out: dict[str, int] = {}
    for r in rows:
        if r["col_name"] == "Statistics":
            # e.g. "123456 bytes, 15000 rows"
            m = re.search(r"(\d+) bytes(?:, (\d+) rows)?", r["data_type"])
            if m:
                out["size_bytes"] = int(m.group(1))
                if m.group(2):
                    out["row_count"] = int(m.group(2))
    return out


def column_stats(spark: SparkSession, table: str, column: str) -> dict[str, str]:
    """Per-column catalog stats (NDV, min, max, null count) for evidence."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table} {column}").collect()
    return {r["info_name"]: r["info_value"] for r in rows}


def plan_stats(df: DataFrame) -> dict[str, int | None]:
    """The optimizer's own size/rowCount estimate for ``df``'s optimized
    plan — the number CBO costing actually uses."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()  # noqa: SLF001
    row_count = stats.rowCount()
    return {
        # py4j converts scala.math.BigInt through its string form
        "size_bytes": int(str(stats.sizeInBytes())),
        "row_count": int(str(row_count.get())) if row_count.isDefined() else None,
    }


def join_order(df: DataFrame) -> list[str]:
    """Leaf relation names in optimized-plan join order (left-deep reading
    order) — the observable CBO join-reorder output."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()  # noqa: SLF001
    seen: list[str] = []
    for m in re.finditer(r"Relation (?:\S*?\.)?(\w+)\[", plan):
        seen.append(m.group(1))
    return seen


@contextmanager
def cbo_session(spark: SparkSession, enabled: bool = True) -> Iterator[SparkSession]:
    """Temporarily flip the CBO confs (restoring prior values) so the same
    query can be planned with and without stats-based reordering."""
    prior = {k: spark.conf.get(k, None) for k in _CBO_CONFS}
    try:
        for k, v in _CBO_CONFS.items():
            spark.conf.set(k, v if enabled else "false")
        yield spark
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def regional_revenue_badly_ordered(spark: SparkSession, db: str = "cbo_demo") -> DataFrame:
    """A 5-way inner join written in a deliberately bad syntactic order:
    the two big facts (lineitem ⋈ orders) first, the selective dimension
    chain (customer → nation → region['EUROPE']) last. With catalog stats +
    CBO join reorder, Catalyst re-plans so the filtered dimension chain
    shrinks the fact side before the fact-fact join — the order a human
    would hand-write, recovered from statistics. Without stats it can only
    trust syntax/file sizes."""
    li = spark.table(f"{db}.lineitem")
    o = spark.table(f"{db}.orders")
    c = spark.table(f"{db}.customer")
    n = spark.table(f"{db}.nation")
    r = spark.table(f"{db}.region").where("r_name = 'EUROPE'")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        # integer cents: the reorder changes FP accumulation order, and the
        # point of the invariance test is that the ANSWER is order-free
        .agg(
            F.sum(F.round(li.l_extendedprice * 100).cast("long")).alias(
                "revenue_cents"
            )
        )
    )
