"""Generic relational operator inventory (SURVEY §2) exercised over the
TPC-H-ish tables and ``events`` — scans, joins, aggregations, windows,
sorts/limits, set ops, scalar/date functions, JSON ingestion, plus the
beyond-reference as-of join and sessionization.

Design note on floats: the driver hash-compares values exactly, so money/
quantity aggregates are computed as integer cents (``ROUND(x*100)`` as
BIGINT) in BOTH engines — double multiplication is IEEE-deterministic, and
integer sums are order-independent, so results are bit-identical regardless
of aggregation order. Never sum raw doubles in an oracle-checked query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .entry_queries import register
from .operators.asof import asof_join, asof_join_auto, asof_join_chunked
from .operators.sessionize import session_stats
from .sources.tpch import load_table


def cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


# --------------------------------------------------------------------------
# Aggregations (A1-A4) + conditional agg + distinct agg
# --------------------------------------------------------------------------


@register(
    "pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_x100,
              CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_x100,
              CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
                  AS sum_disc_price_x100,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
              CAST(max(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS max_qty_x100,
              CAST(sum(CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_tax
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
       GROUP BY l_returnflag, l_linestatus""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style hash aggregate: partial+final agg, conditional agg
    (F10), distinct agg, exact integer-cents arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-06-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents("l_quantity")).alias("sum_qty_x100"),
            F.sum(cents("l_extendedprice")).alias("sum_price_x100"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                    "long"
                )
            ).alias("sum_disc_price_x100"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.max(cents("l_quantity")).alias("max_qty_x100"),
            F.sum(F.when(F.col("l_tax") > 0.04, 1).otherwise(0)).alias("n_high_tax"),
        )
    )


@register(
    "multiway_join_revenue",
    """SELECT r_name,
              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_x100,
              CAST(count(*) AS BIGINT) AS n_orders
       FROM region
       JOIN nation   ON n_regionkey = r_regionkey
       JOIN customer ON c_nationkey = n_nationkey
       JOIN orders   ON o_custkey = c_custkey
       GROUP BY r_name""",
)
def multiway_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-chain: 4-table star join; the two dimension tables are broadcast
    (explicit hint — at 100 TB the fact side never shuffles for them)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum(cents("o_totalprice")).alias("revenue_x100"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "rollup_revenue",
    """SELECT r_name, n_name,
              CAST(GROUPING(r_name) AS INT) AS g_region,
              CAST(GROUPING(n_name) AS INT) AS g_nation,
              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_x100
       FROM region
       JOIN nation   ON n_regionkey = r_regionkey
       JOIN customer ON c_nationkey = n_nationkey
       JOIN orders   ON o_custkey = c_custkey
       GROUP BY ROLLUP(r_name, n_name)""",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP + GROUPING markers (beyond the
    reference's surface; partial-agg friendly — one shuffle)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.sum(cents("o_totalprice")).alias("revenue_x100"),
        )
        .select("r_name", "n_name", "g_region", "g_nation", "revenue_x100")
    )


# extra: the raw HLL estimate differs by engine, so a naive registration
# would be rows-only; instead the query carries its own ACCURACY CONTRACT
# in-plan — the oracle hash-checks the exact cardinalities plus the
# literal-true bound column, so a sketch regression (estimate drifting past
# ±5% of truth) flips a hash-checked value. Spark's HLL++ is deterministic
# for given data, so the boolean is stable run-over-run.
@register(
    "approx_distinct_custkeys",
    """SELECT o_orderpriority,
              CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact,
              true AS hll_within_5pct
       FROM orders GROUP BY o_orderpriority""",
    extra=True,
)
def approx_distinct_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd=0.02) — the constant-memory
    one-pass distinct count for 100 TB cardinality estimation — next to the
    exact count, with the |approx−exact| ≤ 5% contract evaluated in-plan.
    The estimate itself is engine-specific and never surfaced; what the
    driver gate hash-checks is the exact count and the contract holding."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_exact"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("_approx"),
        )
        .select(
            "o_orderpriority",
            "n_exact",
            (
                F.abs(F.col("_approx") - F.col("n_exact"))
                <= F.col("n_exact") * 0.05
            ).alias("hll_within_5pct"),
        )
    )


# the quantile analog of the HLL contract above: the sketch estimate never
# crosses engines; what hash-checks is the exact order statistic plus the
# in-plan boolean that the sketch landed inside its guaranteed rank band
@register(
    "quantile_contract_orders",
    """WITH v AS (
        SELECT o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey
        FROM orders),
    r AS (SELECT o_orderpriority, cents,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY cents, o_orderkey) AS rk,
                 count(*) OVER (PARTITION BY o_orderpriority) AS n
          FROM v)
    SELECT o_orderpriority,
           CAST(max(n) AS BIGINT) AS n,
           max(CASE WHEN rk = (n + 1) // 2 THEN cents END) AS median_cents,
           true AS approx_within_rank_band
    FROM r GROUP BY o_orderpriority""",
    extra=True,
)
def quantile_contract_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch with an accuracy CONTRACT — the 100 TB percentile
    pattern: ``percentile_approx`` (Greenwald-Khanna style, constant memory
    per group) next to the exact lower-median order statistic, plus an
    in-plan boolean that the sketch's answer lies inside the value band of
    ranks ``k ± ceil(n/accuracy)`` — the bound the sketch actually
    guarantees (rank error, not value error). The engine-specific estimate
    never crosses engines; the driver gate hash-checks the exact median
    and the contract holding, exactly like the HLL row above. One exchange:
    the rank window and the final agg share the group partitioning."""
    from pyspark.sql import Window

    accuracy = 100  # rank error ≤ ceil(n / accuracy)
    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        "o_orderpriority",
        cents("o_totalprice").alias("cents"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    r = v.select(
        "o_orderpriority",
        "cents",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    k = F.floor((F.col("n") + 1) / 2)
    d = F.ceil(F.col("n") / accuracy)
    grouped = r.groupBy("o_orderpriority").agg(
        F.max("n").cast("long").alias("n"),
        F.max(F.when(F.col("rk") == k, F.col("cents"))).alias("median_cents"),
        F.max(F.when(F.col("rk") == F.greatest(k - d, F.lit(1)), F.col("cents"))).alias(
            "_band_lo"
        ),
        F.max(
            F.when(F.col("rk") == F.least(k + d, F.col("n")), F.col("cents"))
        ).alias("_band_hi"),
        F.percentile_approx("cents", 0.5, accuracy).alias("_approx"),
    )
    return grouped.select(
        "o_orderpriority",
        "n",
        "median_cents",
        (
            (F.col("_approx") >= F.col("_band_lo"))
            & (F.col("_approx") <= F.col("_band_hi"))
        ).alias("approx_within_rank_band"),
    )


# --------------------------------------------------------------------------
# Sorts / limits (O2-O3)
# --------------------------------------------------------------------------


@register(
    "topk_orders",
    """SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS total_x100
       FROM orders
       ORDER BY total_x100 DESC, o_orderkey ASC
       LIMIT 10""",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark runs TakeOrderedAndProject (no full sort at
    scale). Deterministic tie-break on the key."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", cents("o_totalprice").alias("total_x100"))
        .orderBy(F.col("total_x100").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# Anti join / set ops (§2.7 — free in Spark, exercised for completeness)
# --------------------------------------------------------------------------


# extra=True (below): redundant TPC-H shapes / §2.7 set ops — their operator
# classes (joins+topk, star joins, anti join, distinct) are all covered by
# driver-checked keys; they stay oracle-verified in pytest and benchable
# without spending one of the driver's 50 correctness slots.
@register(
    extra=True,
    name="shipping_priority",
    sql="""SELECT l_orderkey,
              CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                   AS BIGINT) AS revenue_x100,
              o_orderdate
       FROM customer JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1998-03-15'
         AND l_shipdate > TIMESTAMP '1998-03-15'
       GROUP BY l_orderkey, o_orderdate
       ORDER BY revenue_x100 DESC, o_orderdate ASC, l_orderkey ASC
       LIMIT 10""",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3 shape: selective dimension filter → fact join → agg →
    top-k (TakeOrderedAndProject; both date filters pushed to the scans)."""
    customer = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
            ).alias("revenue_x100")
        )
        .orderBy(
            F.col("revenue_x100").desc(),
            F.col("o_orderdate").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(10)
        .select("l_orderkey", "revenue_x100", "o_orderdate")
    )


@register(
    extra=True,
    name="local_supplier_volume",
    sql="""SELECT n_name,
              CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                   AS BIGINT) AS revenue_x100
       FROM customer
       JOIN orders   ON o_custkey = c_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       JOIN nation   ON s_nationkey = n_nationkey
       JOIN region   ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1997-01-01'
         AND o_orderdate < TIMESTAMP '1998-01-01'
       GROUP BY n_name""",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5 shape: 6-table join with a compound join condition
    (customer and supplier in the same nation) and region/date filters;
    dimensions broadcast."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            supplier,
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
            ).alias("revenue_x100")
        )
    )


@register(
    extra=True,
    name="customers_without_orders",
    sql="""SELECT c_custkey FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey")


@register(
    extra=True,
    name="set_ops_nationkeys",
    sql="""SELECT nationkey, tag FROM (
         SELECT c_nationkey AS nationkey, 'both' AS tag FROM customer
         INTERSECT SELECT s_nationkey, 'both' FROM supplier
       ) UNION ALL
       SELECT nationkey, tag FROM (
         SELECT c_nationkey AS nationkey, 'customer_only' AS tag FROM customer
         EXCEPT SELECT s_nationkey, 'customer_only' FROM supplier
       )""",
)
def set_ops_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    both = customer.intersect(supplier).withColumn("tag", F.lit("both"))
    conly = customer.subtract(supplier).withColumn("tag", F.lit("customer_only"))
    return both.unionByName(conly)


# --------------------------------------------------------------------------
# Window battery (W1-W4 + frames) on events
# --------------------------------------------------------------------------


@register(
    "window_battery_events",
    """SELECT event_id, user_id,
              CAST(row_number() OVER w AS INT) AS rn,
              lag(event_type) OVER w AS prev_type,
              lead(event_type) OVER w AS next_type,
              CAST(coalesce(lag(CAST(round(value * 100) AS BIGINT)) OVER w, 0) AS BIGINT)
                  AS prev_value_x100,
              CAST(sum(CAST(round(value * 100) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_value_x100
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)
def window_battery_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / lag (with default) / lead / running-frame sum — the
    reference's full window surface (HRP:537,564,577,582,585) plus an
    explicit rowsBetween frame."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v = F.round(F.col("value") * 100).cast("long")
    return events.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.coalesce(F.lag(v).over(w), F.lit(0)).alias("prev_value_x100"),
        F.sum(v).over(run).alias("run_value_x100"),
    )


@register(
    "resample_hourly_gapfill",
    """WITH hourly AS (
         SELECT user_id, date_trunc('hour', ts) AS hour,
                CAST(count(*) AS BIGINT) AS n_events
         FROM events GROUP BY user_id, hour),
       bounds AS (
         SELECT user_id, min(hour) AS hmin, max(hour) AS hmax
         FROM hourly GROUP BY user_id),
       grid AS (
         SELECT user_id,
                unnest(generate_series(hmin, hmax, INTERVAL 1 HOUR)) AS hour
         FROM bounds)
       SELECT g.user_id, g.hour, coalesce(h.n_events, 0) AS n_events
       FROM grid g LEFT JOIN hourly h
         ON h.user_id = g.user_id AND h.hour = g.hour""",
    extra=True,  # r12: demoted to extras (window_battery_events covers the
    # reshape surface) to free a driver slot for sink_partial_delta
)
def resample_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap fill: dense per-user hourly grid
    (sequence/explode between each user's bounds — the month-grid pattern
    generalized), zero-filled. Partial-agg shuffles only; grid fan-out is
    bounded by each user's own span."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    bounds = hourly.groupBy("user_id").agg(
        F.min("hour").alias("hmin"), F.max("hour").alias("hmax")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("hmin"), F.col("hmax"), F.expr("interval 1 hour"))
        ).alias("hour"),
    )
    return grid.join(hourly, ["user_id", "hour"], "left").select(
        "user_id", "hour", F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events")
    )


@register(
    "string_battery",
    """SELECT o_orderkey,
              upper(o_orderpriority) AS up,
              lpad(CAST(o_orderkey % 1000 AS VARCHAR), 6, '0') AS padded,
              reverse(o_orderstatus) AS rev,
              CAST(strpos(o_orderpriority, '-') AS INT) AS dash_pos,
              substr(o_orderpriority, 3) AS after_num,
              regexp_extract(o_orderpriority, '[0-9]+') AS pri_num,
              translate(o_orderstatus, 'OF', 'of') AS translated,
              CAST(levenshtein(o_orderstatus, 'OK') AS INT) AS lev_ok,
              concat_ws('|', o_orderstatus, o_orderpriority) AS joined
       FROM orders""",
)
def string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface (beyond the reference's F13): case, padding,
    search, slicing, regex extraction, translation, edit distance."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("up"),
        F.lpad((F.col("o_orderkey") % 1000).cast("string"), 6, "0").alias("padded"),
        F.reverse("o_orderstatus").alias("rev"),
        F.instr("o_orderpriority", "-").cast("int").alias("dash_pos"),
        F.substring("o_orderpriority", 3, 2147483647).alias("after_num"),
        F.regexp_extract("o_orderpriority", "[0-9]+", 0).alias("pri_num"),
        F.translate("o_orderstatus", "OF", "of").alias("translated"),
        F.levenshtein("o_orderstatus", F.lit("OK")).cast("int").alias("lev_ok"),
        F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("joined"),
    )


@register(
    "array_battery",
    """SELECT user_id,
              CAST(len(list_sort(list(DISTINCT event_type))) AS INT) AS n_types,
              CAST(len(list(event_type)) AS INT) AS n,
              list_sort(list(DISTINCT event_type))[1] AS first_type,
              list_sort(list(DISTINCT event_type))[-1] AS last_type,
              array_to_string(list_sort(list(DISTINCT event_type)), ',') AS type_csv,
              CAST(list_contains(list(DISTINCT event_type), 'purchase') AS BOOLEAN)
                  AS has_purchase
       FROM events WHERE event_type IS NOT NULL GROUP BY user_id""",
    # round-6 slot rotation: every array op here also rides a driver slot
    # (explode → month_grid, array_join → string_battery, collect_list →
    # pack_history_stats), so this battery double-covered its class; its
    # freed driver slot goes to sessionize_events_chunked so the skew-safe
    # per-key-window rewrite — a class nothing else driver-gates — gets a
    # hash-checked CORRECTNESS row. Still oracle-checked here per round via
    # EXTRA_CORRECTNESS.json.
    extra=True,
)
def array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface: collect_set/sort/size/element_at/join/contains
    — the nested-type toolkit the reference never had (its arrays lived only
    in the write envelope). Both sides pre-filter null event_type: DuckDB's
    list()/list(DISTINCT) KEEP null elements while Spark's collect_set and
    count(col) drop them — the filter pins one semantics.

    The array ops all run INSIDE the query; the output carries only scalar
    columns because the external correctness gate canonicalizes results with
    a pandas sort, which cannot hash list cells (repo convention, same as
    pack_history_stats)."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull()
    )
    types = F.array_sort(F.collect_set("event_type"))
    return events.groupBy("user_id").agg(
        F.size(types).alias("n_types"),
        F.count("event_type").cast("int").alias("n"),
        F.element_at(types, 1).alias("first_type"),
        F.element_at(types, -1).alias("last_type"),
        F.array_join(types, ",").alias("type_csv"),
        F.array_contains(types, "purchase").alias("has_purchase"),
    )


# --------------------------------------------------------------------------
# Sessionization (islands reuse) + as-of join (beyond-reference)
# --------------------------------------------------------------------------


@register(
    "sessionize_events",
    """WITH flagged AS (
         SELECT user_id, ts, event_id,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR (epoch_ms(ts) // 1000) - (epoch_ms(lag(ts) OVER w) // 1000) > 1800
                     THEN 1 ELSE 0 END AS new_session
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ),
       numbered AS (
         SELECT user_id, ts,
                sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_id
         FROM flagged
       )
       SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
              min(ts) AS session_start, max(ts) AS session_end,
              CAST(count(*) AS BIGINT) AS n_events
       FROM numbered GROUP BY user_id, session_id""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user — batch analog of a streaming session
    window, built on the same island machinery as the retention collapse."""
    events = load_table(spark, sf_dir, "events")
    return session_stats(
        events, ["user_id"], "ts", gap_seconds=1800, order_tiebreak=["event_id"]
    )


# the chunked variant answers the SAME question, so it reuses the exact
# oracle SQL of sessionize_events — equality with the plain formulation is
# the correctness claim, checked by the gate itself
from .entry_queries import ORACLE_SQL as _ORACLE_SQL  # noqa: E402


@register(
    "sessionize_events_chunked",
    _ORACLE_SQL["sessionize_events"],
    # extra since round 10: strategy twin of the driver-gated
    # sessionize_events (identical oracle); freed the slot for the round-9
    # sink surface
    extra=True,
)
def sessionize_events_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-level sessionization (operators/sessionize.py::
    sessionize_chunked): per-(user, day-chunk) local windows + a tiny
    per-chunk boundary-merge pass, so a mega-user can never serialize into
    one task — per-key windows are the one skew AQE cannot split, and this
    is the rewrite that removes it. Hash-checked against the SAME DuckDB
    oracle as the plain formulation; promoted to a driver slot in round 6
    (taking array_battery's, which double-covered its class) so the
    skew-safe path is verified by the external gate, not just pytest."""
    events = load_table(spark, sf_dir, "events")
    return session_stats(
        events,
        ["user_id"],
        "ts",
        gap_seconds=1800,
        order_tiebreak=["event_id"],
        chunk_seconds=86_400,
    )


@register("sessionize_events_auto", _ORACLE_SQL["sessionize_events"], extra=True)
def sessionize_events_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive sessionization (operators/sessionize.py::sessionize_auto):
    one sampled hottest-key pre-pass chooses the plain single-window plan
    or the skew-safe chunked rewrite at the measured ~1M-rows/key crossover
    (conf ``spark.spark_graft.hotKeyThresholdRows``). Output is identical
    either way, so it registers against the SAME oracle as both fixed
    forms — the correctness claim is strategy-independence."""
    events = load_table(spark, sf_dir, "events")
    return session_stats(
        events,
        ["user_id"],
        "ts",
        gap_seconds=1800,
        order_tiebreak=["event_id"],
        auto=True,
    )


@register(
    "null_semantics_battery",
    """SELECT o_orderkey,
              NULLIF(o_orderpriority, '1-URGENT') AS pri_or_null,
              (NULLIF(o_orderpriority, '1-URGENT') IS NULL) AS is_urgent,
              (NULLIF(o_orderpriority, '1-URGENT') IS NOT DISTINCT FROM
               NULLIF(o_orderstatus, 'F')) AS nullsafe_eq,
              coalesce(NULLIF(o_orderstatus, o_orderstatus), o_orderpriority,
                       'fallback') AS first_nonnull,
              (NULL AND o_orderkey > 0) IS NULL AS three_valued_and
       FROM orders""",
    # round-11 slot rotation: this battery's null surface overlaps
    # string_battery (both driver-gate null handling on the same orders
    # scan); its freed slot goes to sink_fold_minmax — the retractable-
    # extremum fold is subtle logic the hard gate should cover (r10
    # verdict #4). Still oracle-checked per round via
    # EXTRA_CORRECTNESS.json.
    extra=True,
)
def null_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic surface (SURVEY §7.3 hard part 3): NULLIF,
    null-safe equality (<=>), coalesce chains, and NULL-propagating AND —
    identical semantics asserted against the oracle."""
    orders = load_table(spark, sf_dir, "orders")
    pri = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    st = F.nullif(F.col("o_orderstatus"), F.lit("F"))
    return orders.select(
        "o_orderkey",
        pri.alias("pri_or_null"),
        pri.isNull().alias("is_urgent"),
        pri.eqNullSafe(st).alias("nullsafe_eq"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.col("o_orderstatus")),
            F.col("o_orderpriority"),
            F.lit("fallback"),
        ).alias("first_nonnull"),
        (F.lit(None).cast("boolean") & (F.col("o_orderkey") > 0))
        .isNull()
        .alias("three_valued_and"),
    )


@register(
    "pivot_event_counts",
    """SELECT user_id,
              CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
              CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase
       FROM events GROUP BY user_id""",
    extra=True,  # r12: demoted to extras (rollup_revenue covers the pivot/
    # reshape surface) to free a driver slot for knn_pq_indexed
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an EXPLICIT value list (no discovery job, single shuffle —
    the only pivot form that is sane at scale); oracle is the equivalent
    conditional-aggregate CASE expansion."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", ["view", "click", "purchase"])
        .agg(F.coalesce(F.count(F.lit(1)), F.lit(0)))
        .na.fill(0, ["view", "click", "purchase"])
        .select(
            "user_id",
            F.col("view").cast("long").alias("view"),
            F.col("click").cast("long").alias("click"),
            F.col("purchase").cast("long").alias("purchase"),
        )
    )


@register(
    "value_percentiles",
    """SELECT event_type,
              quantile_cont(CAST(round(value * 100) AS BIGINT), 0.25) AS p25,
              quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5)  AS p50,
              quantile_cont(CAST(round(value * 100) AS BIGINT), 0.75) AS p75,
              quantile_cont(CAST(round(value * 100) AS BIGINT), 0.95) AS p95
       FROM events GROUP BY event_type""",
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (R-7) over integer cents —
    interpolated midpoints of integers are exactly representable doubles, so
    the engines agree bitwise. (percentile_approx is the scale path for
    one-pass sketching; it is engine-specific and therefore not oracled.)

    Emitted as four SCALAR columns (not one array<double>): the external
    gate's pandas canonicalizer cannot hash list cells (repo convention).
    The four cut points go through ONE array-argument Percentile aggregate
    (four separate F.percentile calls each keep their own buffer and sort
    the group four times over); the array is unpacked to scalars in a
    post-agg projection, so the top-level schema stays atomic."""
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    pcts = events.groupBy("event_type").agg(
        F.percentile(cents, F.array(*[F.lit(p) for p in (0.25, 0.5, 0.75, 0.95)])).alias(
            "pct"
        )
    )
    return pcts.select(
        "event_type",
        F.col("pct")[0].alias("p25"),
        F.col("pct")[1].alias("p50"),
        F.col("pct")[2].alias("p75"),
        F.col("pct")[3].alias("p95"),
    )


@register(
    "session_window_events",
    """WITH flagged AS (
         SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= 1800000
                     THEN 1 ELSE 0 END AS new_session
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ),
       numbered AS (
         SELECT user_id, ts,
                sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid
         FROM flagged
       )
       SELECT user_id, min(ts) AS session_start,
              max(ts) + INTERVAL 30 MINUTE AS session_end,
              CAST(count(*) AS BIGINT) AS n_events
       FROM numbered GROUP BY user_id, sid""",
    # round-11 slot rotation: duplicates sessionize_events' driver-gated
    # surface (same islands semantics, different physical operator); its
    # freed slot goes to sink_fold_distinct (r10 verdict #4). Still
    # oracle-checked per round via EXTRA_CORRECTNESS.json.
    extra=True,
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in ``session_window`` in BATCH mode (same operator the
    streaming module uses) — oracled against the islands formulation with
    the session_window gap semantics (a gap of exactly 30min starts a new
    session; window end = last event + gap)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "asof_purchase_view",
    """SELECT p.user_id, p.ts, p.event_id,
              v.event_id AS event_id_asof, v.ts AS ts_asof
       FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       LEFT JOIN LATERAL (
         SELECT event_id, ts FROM events v
         WHERE v.event_type = 'view' AND v.user_id = p.user_id AND v.ts <= p.ts
         ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
       ) v ON TRUE""",
)
def asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest at-or-before 'view' of
    the same user. Union+window implementation (one shuffle, no range-join
    blowup); DuckDB LATERAL top-1 is the independent oracle."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = events.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    return asof_join(
        purchases,
        views,
        keys=["user_id"],
        ts_col="ts",
        build_cols=["event_id"],
        tiebreak_col="event_id",
    )


@register("asof_purchase_view_chunked", _ORACLE_SQL["asof_purchase_view"], extra=True)
def asof_purchase_view_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe as-of join (operators/asof.py::asof_join_chunked): the
    unioned event stream windows by (user, day-chunk); the per-user carry
    of the latest view rides a tiny per-chunk summary. Identical output to
    asof_purchase_view — registered against the SAME oracle."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = events.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    return asof_join_chunked(
        purchases,
        views,
        keys=["user_id"],
        ts_col="ts",
        build_cols=["event_id"],
        tiebreak_col="event_id",
    )


@register("asof_purchase_view_auto", _ORACLE_SQL["asof_purchase_view"], extra=True)
def asof_purchase_view_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive as-of join (operators/asof.py::asof_join_auto): a sampled
    hottest-key pre-pass picks plain vs chunked at the measured crossover
    (~1M rows/key, conf-overridable) — the production default that never
    hands a bot-shaped key to a single-task sort. Same oracle as both
    fixed-strategy forms."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = events.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    return asof_join_auto(
        purchases,
        views,
        keys=["user_id"],
        ts_col="ts",
        build_cols=["event_id"],
        tiebreak_col="event_id",
    )


# --------------------------------------------------------------------------
# Scalar / date function battery (F1-F12) + JSON ingestion (S3)
# --------------------------------------------------------------------------


@register(
    "date_battery_orders",
    """SELECT o_orderkey,
              CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
              CAST(CAST(date_trunc('month', o_orderdate) AS DATE) + INTERVAL 1 MONTH AS DATE)
                  AS next_month,
              CAST(o_orderdate AS DATE) - 365 AS minus_365,
              strftime(o_orderdate, '%Y-%m-%d') AS day_str,
              strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_str,
              CAST(epoch_ms(o_orderdate) // 1000 AS BIGINT) AS epoch_s,
              CAST(epoch_ms(CAST(date_trunc('month', o_orderdate) AS DATE)
                            + INTERVAL 1 MONTH) - 1000 AS BIGINT) AS eom_epoch_ms
       FROM orders""",
)
def date_battery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F8 surface: trunc/add_months/date_add(-365)/date_format/
    unix_timestamp/end-of-month-minus-1s epoch — the reference's entire date
    arithmetic (HRP:512-513,527,570-573) on a neutral table."""
    orders = load_table(spark, sf_dir, "orders")
    month_start = F.date_trunc("month", F.col("o_orderdate")).cast("date")
    return orders.select(
        "o_orderkey",
        month_start.alias("month_start"),
        F.add_months(month_start, 1).alias("next_month"),
        F.date_add(F.col("o_orderdate").cast("date"), -365).alias("minus_365"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day_str"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.unix_timestamp(F.col("o_orderdate")).alias("epoch_s"),
        (F.unix_millis(F.add_months(month_start, 1).cast("timestamp")) - 1000).alias(
            "eom_epoch_ms"
        ),
    )


@register(
    "json_extract_events",
    """SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k
       FROM events""",
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 — typed JSON parsing with an explicit schema (from_json), the
    engine's replacement for the reference's schema inference."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id", F.from_json("props", "k INT").getField("k").alias("k")
    )


@register(
    "scan_pushdown_lineitem",
    """SELECT l_orderkey, l_linenumber, CAST(round(l_quantity * 100) AS BIGINT) AS qty_x100
       FROM lineitem
       WHERE l_shipdate BETWEEN TIMESTAMP '1998-01-01' AND TIMESTAMP '1999-01-01'
         AND l_quantity >= 25 AND l_returnflag <> 'A'""",
)
def scan_pushdown_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/P4-P7 generic: conjunctive range+equality predicates and a narrow
    projection — all pushed to the parquet scan (asserted in
    tests/test_plans.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        F.col("l_shipdate").between("1998-01-01", "1999-01-01")
        & (F.col("l_quantity") >= 25)
        & (F.col("l_returnflag") != "A")
    ).select("l_orderkey", "l_linenumber", cents("l_quantity").alias("qty_x100"))


# --------------------------------------------------------------------------
# Product-analytics shapes (round 5, beyond-reference): sequential funnel,
# CUBE aggregation — extra registry (driver slots full), fully oracled
# --------------------------------------------------------------------------


@register(
    "funnel_view_click_purchase",
    """WITH u AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        FROM events GROUP BY user_id),
    c AS (
        SELECT u.user_id, u.t_view,
               min(CASE WHEN e.event_type = 'click' AND e.ts > u.t_view
                        THEN e.ts END) AS t_click
        FROM u JOIN events e ON e.user_id = u.user_id
        GROUP BY u.user_id, u.t_view),
    p AS (
        SELECT c.user_id, c.t_view, c.t_click,
               min(CASE WHEN e.event_type = 'purchase' AND e.ts > c.t_click
                        THEN e.ts END) AS t_purchase
        FROM c JOIN events e ON e.user_id = c.user_id
        GROUP BY c.user_id, c.t_view, c.t_click)
    SELECT CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
                     WHEN t_click IS NOT NULL THEN 2
                     WHEN t_view IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS stage,
           CAST(count(*) AS BIGINT) AS n_users
    FROM p GROUP BY 1""",
    extra=True,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential conversion funnel (view → later click → later purchase):
    per user, each stage's timestamp must STRICTLY follow the previous
    stage's — the product-analytics shape plain conditional aggregation
    cannot express (a click before the first view must not count).

    Plan: ONE user-partition exchange carries three chained window
    projections (each stage's min-over-user references the previous
    stage's column — Catalyst stacks Window nodes on the same
    partitioning without re-shuffling), then a tiny 4-row stage count.
    The oracle reproduces the chain as three grouped self-joins — same
    semantics through a deliberately different shape."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    staged = (
        events.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .groupBy("user_id")
        .agg(
            F.max("t_view").alias("t_view"),
            F.max("t_click").alias("t_click"),
            F.max("t_purchase").alias("t_purchase"),
        )
    )
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        staged.select(stage.cast("int").alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


@register(
    "cube_revenue",
    """SELECT o_orderpriority, o_orderstatus,
              CAST(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END AS INT) AS g_priority,
              CAST(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END AS INT) AS g_status,
              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_x100
       FROM orders
       GROUP BY CUBE (o_orderpriority, o_orderstatus)""",
    extra=True,
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (priority, status): all four grouping-set combinations in
    one pass (partial-aggregated Expand, one exchange) with explicit
    grouping flags — complements rollup_revenue's hierarchy. Neither input
    column is ever null in the data, so DuckDB's NULL-marker CASE and
    Spark's grouping() bits agree exactly."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "revenue_x100"
            ),
        )
        .select(
            "o_orderpriority",
            "o_orderstatus",
            "g_priority",
            "g_status",
            "revenue_x100",
        )
    )


def _pagerank_oracle(iters: int) -> str:
    """Unrolled-CTE DuckDB twin of graph.pagerank_fixed_point over the
    symmetric customer–part bipartite graph (same integer recurrence)."""
    from .operators.graph import DAMP_DEN, DAMP_NUM, SCALE

    teleport = SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    ctes = [
        """e0 AS (SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""",
        "edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)",
        """ed AS (SELECT e.src AS node, e.dst AS _dst, d.deg
                  FROM edges e JOIN deg d ON e.src = d.src)""",
        f"r0 AS (SELECT node, CAST({SCALE} AS BIGINT) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""r{i} AS (
            SELECT n.node,
                   CAST({teleport} + ({DAMP_NUM} * coalesce(s.m, 0)) // {DAMP_DEN}
                        AS BIGINT) AS rank
            FROM nodes n
            LEFT JOIN (SELECT _dst, sum(rank // deg) AS m
                       FROM ed JOIN r{i - 1} USING (node)
                       GROUP BY _dst) s ON s._dst = n.node)"""
        )
    return (
        "WITH " + ",\n    ".join(ctes) + f"\n    SELECT node, rank FROM r{iters}"
    )


@register("pagerank_customer_part", _pagerank_oracle(5), extra=True)
def pagerank_customer_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-point PageRank (operators/graph.py) over the
    symmetric customer–part purchase graph — the iterative-algorithm
    showpiece next to duplicate_clusters' label propagation. Integer
    fixed-point arithmetic makes an ITERATIVE float algorithm exactly
    oracle-able: the DuckDB twin unrolls the same recurrence as CTEs and
    hash-matches every node's rank after 5 rounds."""
    from .operators.graph import pagerank_fixed_point

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e0 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_partkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).cache()
    # pagerank_fixed_point localCheckpoints each round (eager), so by return
    # the result no longer depends on this cache — release it here instead
    # of holding executor storage for the rest of the session
    try:
        return pagerank_fixed_point(edges, iters=5)
    finally:
        edges.unpersist()


@register(
    "rank_battery_events",
    """SELECT event_id, user_id,
              CAST(rank() OVER w AS INT) AS rnk,
              CAST(dense_rank() OVER w AS INT) AS drnk,
              percent_rank() OVER w AS prnk,
              cume_dist() OVER w AS cdist,
              CAST(ntile(4) OVER w AS INT) AS quartile,
              first_value(event_type) OVER w AS top_type
       FROM events
       WINDOW w AS (PARTITION BY user_id
                    ORDER BY CAST(round(value * 100) AS BIGINT) DESC, event_id)""",
    extra=True,
)
def rank_battery_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-function surface window_battery does not cover: rank /
    dense_rank / percent_rank / cume_dist / ntile / first_value, one
    exchange. percent_rank and cume_dist are ratios of small integers —
    the same (numerator, denominator) divides to the bit-identical IEEE
    double in both engines, so even the float columns hash-match."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.round(F.col("value") * 100).cast("long").desc(), F.col("event_id")
    )
    return events.select(
        "event_id",
        "user_id",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.first("event_type").over(w).alias("top_type"),
    )
