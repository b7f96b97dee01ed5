"""Build the deliberately-SKEWED sf1 variant (round-5 stress): start from
the /tmp/sf1 rehearsal corpus and inject

1. a x1000 mega-household: 30,000 extra orders for one eligible
   HOUSEHOLD-segment customer (typical household has ~30 encounters) over
   the 5y admit window;
2. a giant near-dup cluster: 1,000 documents sharing ~all shingles
   (unique one-token tail each) — every minhash band collides, so the band
   join sees one ~1000-row bucket per band and duplicate_clusters gets a
   1000-node clique;
3. an embedding hot bucket: 500 near-identical vectors (cos > 0.999) that
   all land in the same LSH buckets;
4. a x2000 mega-USER: 200,000 events for one user_id (bot shape, mixed
   gaps -> ~2,250 sessions) — the stressor for per-key-window operators
   (sessionize, as-of), whose chunked variants exist exactly for this.

Usage: python tools/gen_sf1_skew.py [src=/tmp/sf1] [out=/tmp/sf1skew]
"""

import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1skew"

N_MEGA_ORDERS = 30_000
N_MEGA_EVENTS = 200_000
N_DUP_DOCS = 1_000
N_HOT_VECS = 500
KEY0 = 100_000_000


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in ("nation", "region", "customer", "part", "supplier", "lineitem"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

    # 4. a x2000 mega-user (bot shape): 200,000 events over ~1 year with
    # mixed gaps (mostly 3 min; every 89th event jumps 2h -> ~2,250
    # sessions) — the stressor for per-key-window operators (sessionize,
    # as-of), whose chunked variants exist exactly for this
    con.execute(
        f"""COPY (
        SELECT * FROM read_parquet('{SRC}/events.parquet')
        UNION ALL
        SELECT {KEY0} + i AS event_id,
               TIMESTAMP '2026-01-01 00:00:00'
                   + INTERVAL (i * 180 + (i // 89) * 7200) SECOND AS ts,
               {KEY0} AS user_id,
               CASE i % 3 WHEN 0 THEN 'view' WHEN 1 THEN 'click'
                          ELSE 'purchase' END AS event_type,
               1.0 AS value, '{{}}' AS props
        FROM range({N_MEGA_EVENTS}) t(i)
        ) TO '{OUT}/events.parquet' (FORMAT PARQUET)"""
    )

    mega = con.execute(
        f"""SELECT min(c_custkey) FROM read_parquet('{SRC}/customer.parquet')
        WHERE c_mktsegment = 'HOUSEHOLD' AND c_custkey % 17 <> 0"""
    ).fetchone()[0]
    print(f"mega customer: {mega} (household H{mega // 3})")
    con.execute(
        f"""COPY (
        SELECT * FROM read_parquet('{SRC}/orders.parquet')
        UNION ALL
        SELECT {KEY0} + i AS o_orderkey, {mega} AS o_custkey,
               'O' AS o_orderstatus, 1000.0 AS o_totalprice,
               TIMESTAMP '1996-08-02 00:00:00'
                   + INTERVAL (i % 1800) DAY AS o_orderdate,
               '3-MEDIUM' AS o_orderpriority
        FROM range({N_MEGA_ORDERS}) t(i)
        ) TO '{OUT}/orders.parquet' (FORMAT PARQUET)"""
    )

    base_words = " ".join(f"w{j} common clause segment" for j in range(20))
    con.execute(
        f"""COPY (
        SELECT * FROM read_parquet('{SRC}/documents.parquet')
        UNION ALL
        SELECT {KEY0} + i AS doc_id,
               '{base_words} tail' || i AS text,
               'en' AS lang, 'skewgen' AS source,
               CAST(length('{base_words} tail' || i) AS BIGINT) AS n_chars
        FROM range({N_DUP_DOCS}) t(i)
        ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)"""
    )

    con.execute(
        f"""COPY (
        SELECT * FROM read_parquet('{SRC}/embeddings.parquet')
        UNION ALL
        SELECT {KEY0} + i AS vec_id,
               list_transform(range(len(b.embedding)),
                   d -> b.embedding[1 + CAST(d AS INT)]
                        + CASE WHEN d = i % len(b.embedding)
                               THEN 0.001 * (1 + i % 7) ELSE 0 END)
                   ::FLOAT[] AS embedding,
               999 AS label
        FROM (SELECT embedding FROM read_parquet('{SRC}/embeddings.parquet')
              ORDER BY vec_id LIMIT 1) b, range({N_HOT_VECS}) t(i)
        ) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    for t in ("orders", "documents", "embeddings", "events"):
        n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
