"""Regenerate the synthetic sf1 rehearsal corpus (SCALING.md): 10 replicas
of sf0.1 with key offsets r*STRIDE. STRIDE = 2,784,600 is divisible by every
modulus the queries predicate on (%2..%10, %13, %17, %25, %50, and the /3
household derivation), so eligibility rates and selectivities are preserved
exactly. Documents get a per-token replica suffix (zero cross-replica
shingle overlap -> near-dup density stays at the sf0.1 rate); embeddings get
a cyclic dimension rotation (norms/intra-replica geometry preserved,
cross-replica cosine decorrelated). DuckDB-only; ~1 min.

Usage: python tools/gen_sf1.py [out_dir=/tmp/sf1] [n_replicas=10]
"""

import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10
STRIDE = 2_784_600

KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
}


def main() -> None:
    import os

    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, keys in KEYED.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + r * {STRIDE} AS {c}" if c in keys else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'), "
            f"range({N}) t(r)) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
    # documents: offset doc_id; suffix every whitespace token with _r<r> for
    # r>0 so cross-replica shingles never collide
    con.execute(
        f"""COPY (
        WITH rep AS (
            SELECT doc_id + r * {STRIDE} AS doc_id,
                   CASE WHEN r = 0 THEN text
                        ELSE array_to_string(
                            list_transform(string_split(text, ' '),
                                           w -> w || '_r' || r), ' ')
                   END AS text,
                   lang, source
            FROM read_parquet('{SRC}/documents.parquet'), range({N}) t(r))
        -- n_chars recomputed from the suffixed text: profile_documents'
        -- internal-consistency check must hold on the rehearsal corpus
        SELECT doc_id, text, lang, source,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM rep
        ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)"""
    )
    # embeddings: offset vec_id; rotate dimensions cyclically by r
    con.execute(
        f"""COPY (
        SELECT vec_id + r * {STRIDE} AS vec_id,
               list_transform(range(len(embedding)),
                   i -> embedding[1 + CAST((i + r) % len(embedding) AS INT)])
                   ::FLOAT[] AS embedding,
               label
        FROM read_parquet('{SRC}/embeddings.parquet'), range({N}) t(r)
        ) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    for t in list(KEYED) + ["documents", "embeddings", "nation", "region"]:
        n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
