"""Regenerate the SCALING.md header table: per-query wall time across
sf0.001 / sf0.01 / sf0.1 (steady-state second run per cell, local[32]).
Prints the markdown rows; paste into SCALING.md."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = [
    ("retention_phase1", "orders (1500→150000 rows)"),
    ("pricing_summary", "lineitem (6000→600000 rows)"),
    ("sessionize_events", "events (1000→100000 rows)"),
    ("dedup_exact", "documents (500→5000 rows)"),
    ("dedup_minhash_lsh", "documents (500→5000 rows)"),
    ("dedup_simhash", "documents (500→5000 rows)"),
    ("knn_bruteforce", "embeddings (500→2000 rows)"),
    ("knn_lsh", "embeddings (500→2000 rows)"),
    ("doc_fingerprint", "documents (500→5000 rows)"),
]
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from es_household_retention_spark_job_spark.session import get_spark
    from es_household_retention_spark_job_spark.entry_queries import (
        EXTRA_QUERIES,
        QUERIES as REG,
    )

    reg = {**REG, **EXTRA_QUERIES}
    spark = get_spark(app_name="scaling", cpus=32, shuffle_partitions=64)

    def run(name: str, sf: str) -> float:
        fn = reg[name]
        fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name, table in QUERIES:
        cells = [run(name, sf) for sf in SFS]
        r1 = cells[1] / cells[0]
        r2 = cells[2] / cells[1]
        print(
            f"| {name} | {table} | {cells[0]:.2f}s | {cells[1]:.2f}s "
            f"| {r1:.1f}x | {cells[2]:.2f}s | {r2:.1f}x |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
