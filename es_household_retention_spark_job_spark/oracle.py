"""DuckDB oracle SQL for the retention pipeline (SURVEY §5.2 t2).

These strings run against the driver's pre-registered parquet views
(``customer``, ``orders``, ...). They encode the REFERENCE semantics
(HRP:499-624, 762-784) independently of the Spark implementation:

* the TPC-H -> person/encounter derivation mirrors ``sources.tpch`` 1:1
  (any change must be made in both places);
* the "retained month" core uses the reference's literal BAND SELF-JOIN
  (HRP:529-533), while the Spark side uses the optimized window form —
  hash-matching outputs therefore proves the rewrite correct;
* the islands collapse uses the island-id formulation; its equivalence with
  the reference's 4-window/3-join SQL (HRP:557-590) is proved once in
  ``tests/test_islands_equivalence.py`` which runs BOTH formulations in
  DuckDB and compares.

All "now"-derived values are Python-computed from the pinned ``as_of``
(clock.py) and interpolated as literals, mirroring the reference's
driver-side date math (HRP:486,556,753) without its midnight race.
"""

from __future__ import annotations

from datetime import datetime

from .clock import add_years, epoch_ms, month_floor
from .operators.retention import (
    ENCOUNTER_SCAN_YEARS,
    HAS_CHILD_YEARS,
    LOOKBACK_DAYS,
    phase2_bounds,
)

DEFAULT_CLIENT = "HOUSEHOLD"


def derivation_cte(client: str, as_of: datetime) -> str:
    """Shared CTE prelude: customer->person, orders->encounter, and the
    client-scoped eligible sets (P4/P5/P8 reduced to the derivation's
    ``processed`` flag; full nested-array P8 is covered by the fixture
    tests over Spark-written nested parquet)."""
    scan_lo = epoch_ms(add_years(as_of, -ENCOUNTER_SCAN_YEARS))
    hi = epoch_ms(as_of)
    return f"""
    person_src AS (
        SELECT 'P' || CAST(c_custkey AS STRING) AS person_id,
               c_mktsegment AS client_code,
               CASE WHEN c_custkey % 17 = 0 THEN NULL
                    ELSE 'H' || CAST(CAST(FLOOR(c_custkey / 3) AS BIGINT) AS STRING)
               END AS household_id,
               (c_custkey % 13 = 0) AS processed
        FROM customer
    ),
    persons AS (
        SELECT person_id, household_id FROM person_src
        WHERE client_code = '{client}' AND household_id IS NOT NULL AND NOT processed
    ),
    encounter_src AS (
        SELECT 'E' || CAST(o_orderkey AS STRING) AS encounter_id,
               'P' || CAST(o_custkey AS STRING) AS person_id,
               c_mktsegment AS client_code,
               epoch_ms(o_orderdate) AS admit_date
        FROM orders JOIN customer ON c_custkey = o_custkey
    ),
    encounters AS (
        SELECT encounter_id, person_id,
               make_timestamp((admit_date // 1000) * 1000000) AS admit_ts
        FROM encounter_src
        WHERE client_code = '{client}' AND admit_date BETWEEN {scan_lo} AND {hi}
    )"""


def fixture_cte(
    client: str,
    as_of: datetime,
    person_table: str = "person",
    encounter_table: str = "encounter",
) -> str:
    """Prelude over REAL nested person/encounter tables (e.g. Spark-written
    fixture parquet): evaluates the full P8 three-valued nested-array
    predicate instead of the TPC-H derivation's reduced boolean."""
    scan_lo = epoch_ms(add_years(as_of, -ENCOUNTER_SCAN_YEARS))
    hi = epoch_ms(as_of)
    return f"""
    persons AS (
        SELECT p.person_id, p.household.household_id AS household_id
        FROM {person_table} p
        WHERE p.client_code = '{client}'
          AND p.household.household_id IS NOT NULL
          AND NOT coalesce(
                len(list_filter(p.household_retention_history,
                                e -> e.retained IS NOT NULL)) > 0, FALSE)
    ),
    encounters AS (
        SELECT encounter_id, person_id,
               make_timestamp((admit_date // 1000) * 1000000) AS admit_ts
        FROM {encounter_table}
        WHERE client_code = '{client}' AND admit_date BETWEEN {scan_lo} AND {hi}
    )"""


def months_cte(as_of: datetime) -> str:
    hi = month_floor(as_of)
    lo = add_years(hi, -HAS_CHILD_YEARS)
    return f"""
    months AS (
        SELECT CAST(unnest(generate_series(TIMESTAMP '{lo:%Y-%m-%d} 00:00:00',
                                           TIMESTAMP '{hi:%Y-%m-%d} 00:00:00',
                                           INTERVAL 1 MONTH)) AS DATE) AS month_start
    )"""


def retention_core_ctes(client: str, as_of: datetime, prelude: str | None = None) -> str:
    """admits -> retained (band SELF-JOIN, HRP:529-533) -> grid/base ->
    island-id collapse -> person-independent ranges. ``prelude`` supplies the
    persons/encounters CTEs (default: TPC-H derivation)."""
    if prelude is None:
        prelude = derivation_cte(client, as_of)
    return f"""{prelude},{months_cte(as_of)},
    admits AS (
        SELECT DISTINCT p.household_id, e.admit_ts
        FROM persons p JOIN encounters e ON e.person_id = p.person_id
    ),
    cur AS (
        SELECT household_id, admit_ts,
               CAST(admit_ts AS DATE) - {LOOKBACK_DAYS} AS admit_minus1
        FROM admits
    ),
    retained AS (
        SELECT DISTINCT cur.household_id,
               CAST(date_trunc('month', cur.admit_ts) AS DATE) AS admit_month
        FROM cur JOIN cur AS prv
          ON cur.household_id = prv.household_id
         AND cur.admit_ts > prv.admit_ts
         AND prv.admit_ts >= CAST(cur.admit_minus1 AS TIMESTAMP)
    ),
    hh AS (SELECT DISTINCT household_id FROM persons),
    base AS (
        SELECT h.household_id AS household, m.month_start,
               (r.admit_month IS NOT NULL) AS is_retained
        FROM hh h CROSS JOIN months m
        LEFT JOIN retained r
          ON r.household_id = h.household_id AND r.admit_month = m.month_start
    ),
    flagged AS (
        SELECT household, month_start, is_retained,
               CASE WHEN lag(is_retained) OVER (PARTITION BY household ORDER BY month_start)
                         IS NOT DISTINCT FROM is_retained
                    THEN 0 ELSE 1 END AS change
        FROM base
    ),
    islands AS (
        SELECT household, month_start, is_retained,
               SUM(change) OVER (PARTITION BY household ORDER BY month_start
                                 ROWS UNBOUNDED PRECEDING) AS island_id
        FROM flagged
    ),
    collapsed AS (
        SELECT household, island_id, is_retained AS retained,
               MIN(month_start) AS island_start, MAX(month_start) AS island_end
        FROM islands GROUP BY household, island_id, is_retained
    ),
    collapsed_adj AS (
        -- reference quirk (HRP:580,586): an island directly preceding a
        -- state change AT the max grid month has its end stretched to the
        -- max month (overlapping ranges); see operators/retention.py
        SELECT household, island_id, retained, island_start,
               CASE WHEN island_start < island_end
                         AND island_end + INTERVAL 1 MONTH
                             = TIMESTAMP '{month_floor(as_of):%Y-%m-%d} 00:00:00'
                    THEN DATE '{month_floor(as_of):%Y-%m-%d}'
                    ELSE island_end END AS island_end
        FROM collapsed
    ),
    ranges AS (
        SELECT household,
               strftime(CAST(island_start AS TIMESTAMP), '%Y-%m-%d') AS start_date,
               strftime(CAST(island_end AS TIMESTAMP) + INTERVAL 1 MONTH - INTERVAL 1 SECOND,
                        '%Y-%m-%d %H:%M:%S') AS end_date,
               epoch_ms(CAST(island_start AS TIMESTAMP)) AS start_date_epoch,
               epoch_ms(CAST(island_end AS TIMESTAMP) + INTERVAL 1 MONTH) - 1000 AS end_date_epoch,
               retained
        FROM collapsed_adj
    )"""


def phase1_sql(
    client: str = DEFAULT_CLIENT,
    as_of: datetime | None = None,
    prelude: str | None = None,
) -> str:
    """Full EP1 flagship output (HRP:602-618 shape)."""
    sql = f"""WITH {retention_core_ctes(client, as_of, prelude)}
    SELECT p.person_id, r.household, r.start_date, r.end_date,
           r.start_date_epoch, r.end_date_epoch, r.retained
    FROM ranges r JOIN persons p ON p.household_id = r.household"""
    return sql


def collapsed_sql(
    client: str = DEFAULT_CLIENT,
    as_of: datetime | None = None,
    prelude: str | None = None,
) -> str:
    """Household-level collapsed ranges (pre-fan-out, HRP:557-590)."""
    return f"""WITH {retention_core_ctes(client, as_of, prelude)}
    SELECT household, start_date, end_date, start_date_epoch, end_date_epoch, retained
    FROM ranges"""


def reference_collapse_sql(
    client: str,
    as_of: datetime,
    prelude: str | None = None,
) -> str:
    """The reference's LITERAL 4-window/3-join gaps-and-islands SQL
    (HRP:557-590) translated to DuckDB, applied to the same ``base`` CTE.
    Used by tests to prove the island-id formulation equivalent — this is the
    faithfulness anchor for the collapse rewrite.

    Mirrors: lag(isRetained,1,0)+rank<>1 same_state flag (HRP:564), chain
    starts via lead(same_state) (HRP:577,582), end-of-range via inequality
    join + min(case max-month terminal) (HRP:578-588), coalesce for
    single-month islands (HRP:571,573), filter same_state=0 (HRP:589)."""
    max_month = month_floor(as_of)
    return f"""WITH {retention_core_ctes(client, as_of, prelude)},
    rr AS (
        SELECT household, month_start, is_retained,
               CAST(is_retained AS INT) AS st,
               row_number() OVER (PARTITION BY household ORDER BY month_start) AS month_rank
        FROM base
    ),
    ranked AS (
        SELECT household, month_rank, month_start, is_retained, st,
               CASE WHEN lag(st, 1, 0) OVER (PARTITION BY household ORDER BY month_rank) = st
                         AND month_rank <> 1
                    THEN 1 ELSE 0 END AS same_state
        FROM rr
    ),
    starts AS (
        SELECT household, month_rank, month_start FROM (
            SELECT household, month_start, month_rank, same_state,
                   lead(same_state) OVER (PARTITION BY household ORDER BY month_rank) AS next_state
            FROM ranked)
        WHERE same_state = 0 AND next_state = 1
    ),
    ends AS (
        SELECT c.household, c.month_rank, c.month_start,
               min(n.month_rank) AS next_month_rank,
               min(CASE WHEN n.month_start = DATE '{max_month:%Y-%m-%d}'
                        THEN n.month_start ELSE n.previous_month END) AS end_of_range
        FROM starts c
        JOIN (SELECT household, month_rank, same_state, month_start,
                     lag(month_start) OVER (PARTITION BY household ORDER BY month_rank)
                         AS previous_month
              FROM ranked) n
          ON n.household = c.household AND c.month_rank < n.month_rank
         AND (n.same_state = 0 OR n.month_start = DATE '{max_month:%Y-%m-%d}')
        GROUP BY c.household, c.month_rank, c.month_start
    )
    SELECT r.household,
           strftime(CAST(r.month_start AS TIMESTAMP), '%Y-%m-%d') AS start_date,
           strftime(CAST(coalesce(z.end_of_range, r.month_start) AS TIMESTAMP)
                    + INTERVAL 1 MONTH - INTERVAL 1 SECOND, '%Y-%m-%d %H:%M:%S') AS end_date,
           epoch_ms(CAST(r.month_start AS TIMESTAMP)) AS start_date_epoch,
           epoch_ms(CAST(coalesce(z.end_of_range, r.month_start) AS TIMESTAMP)
                    + INTERVAL 1 MONTH) - 1000 AS end_date_epoch,
           r.is_retained AS retained
    FROM ranked r
    LEFT JOIN ends z ON r.household = z.household AND r.month_rank = z.month_rank
    WHERE r.same_state = 0"""


def phase2_sql(client: str = DEFAULT_CLIENT, as_of: datetime | None = None) -> str:
    """EP2 constant stamp (HRP:769-779) applied to the invariant-satisfying
    population: unprocessed persons with no qualifying encounter in the
    has_child window (exactly the set a legitimate phase-2 run stamps)."""
    lo, hi = phase2_bounds(as_of)
    child_lo = epoch_ms(add_years(as_of, -HAS_CHILD_YEARS))
    child_hi = epoch_ms(as_of)
    return f"""WITH {derivation_cte(client, as_of)}
    SELECT p.person_id, p.household_id AS household,
           strftime(make_timestamp({lo} * 1000), '%Y-%m-%d') AS start_date,
           strftime(make_timestamp({hi} * 1000), '%Y-%m-%d %H:%M:%S') AS end_date,
           CAST({lo} AS BIGINT) AS start_date_epoch,
           CAST({hi} AS BIGINT) AS end_date_epoch,
           FALSE AS retained
    FROM persons p
    WHERE NOT EXISTS (
        SELECT 1 FROM encounter_src e
        WHERE e.person_id = p.person_id AND e.client_code = '{client}'
          AND e.admit_date BETWEEN {child_lo} AND {child_hi}
    )"""
