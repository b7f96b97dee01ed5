"""Simulate the external driver's correctness gate at sf0.01: run every
queries() entry and hash-compare (canonicalized) against oracle_sql()."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from tests.conftest import canon_frame

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    import __spark_entry__ as entry_mod
    from es_household_retention_spark_job_spark.session import get_spark

    spark = get_spark(app_name="driver_sim", cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    # smoke-check entry()
    edf = entry_mod.entry(spark)
    n = edf.count()
    print(f"entry(): {n} rows, schema ok")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in queries.items():
        t0 = time.time()
        try:
            got = fn(spark, SF).toPandas()
            if name not in oracles:
                status = f"rows-only ({len(got)} rows)"
                n_rowsonly += 1
            else:
                want = con.execute(oracles[name]).df()
                if sorted(got.columns) != sorted(want.columns):
                    status = f"FAIL schema {sorted(got.columns)} vs {sorted(want.columns)}"
                    n_fail += 1
                elif len(got) != len(want):
                    status = f"FAIL rows {len(got)} vs {len(want)}"
                    n_fail += 1
                else:
                    g, w = canon_frame(got), canon_frame(want)
                    bad = [i for i, (a, b) in enumerate(zip(g, w)) if a != b]
                    if bad:
                        status = (
                            f"FAIL hash ({len(bad)}/{len(g)} rows; "
                            f"first: {g[bad[0]]} vs {w[bad[0]]})"
                        )
                        n_fail += 1
                    else:
                        status = f"pass ({len(g)} rows)"
                        n_pass += 1
        except Exception as exc:  # noqa: BLE001
            status = f"FAIL err {exc!r}"[:300]
            n_fail += 1
        print(f"  {name}: {status} [{time.time() - t0:.1f}s]")
    print(f"TOTAL: {n_pass} pass, {n_rowsonly} rows-only, {n_fail} FAIL")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
