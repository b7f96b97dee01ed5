"""Regenerate the SCALING.md header table: per-query wall time across
sf0.001 / sf0.01 / sf0.1 (steady-state second run per cell, local[32]).
Prints the markdown rows; paste into SCALING.md.

Pass SF dirs as argv to measure a different ladder (e.g. the sf1→sf10
linearity spot-check over the replicated rehearsal corpora):

    python tools/gen_scaling.py /tmp/sf1 /tmp/sf10

With a custom ladder the knn_* rows are skipped by default: knn_bruteforce
is corpus×queries quadratic BY DESIGN (the documented exact baseline) and
knn_lsh on the near-orthogonal corpus is scan-bound (see
knn_ann_eval_clustered for the pruning demo) — at sf10 both would burn
minutes demonstrating an already-documented property. Set
SPARK_GRAFT_SCALING_ALL=1 to include them anyway."""

from __future__ import annotations

import os
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
DEFAULT_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
SFS = sys.argv[1:] or DEFAULT_SFS


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

    skip_knn = sys.argv[1:] and not os.environ.get("SPARK_GRAFT_SCALING_ALL")
    # header matches the actual ladder (a custom ladder has fewer
    # time/ratio column pairs than the default 3-SF run — pasting rows
    # under the wrong header would silently misalign)
    labels = [os.path.basename(s.rstrip("/")) for s in SFS]
    hdr = f"| query | driver table | {labels[0]} |"
    sep = "|---|---|---|"
    for lab in labels[1:]:
        hdr += f" {lab} | t/t |"
        sep += "---|---|"
    print(hdr)
    print(sep)
    for name, table in QUERIES:
        if skip_knn and name.startswith("knn_"):
            continue
        cells = [run(name, sf) for sf in SFS]
        row = f"| {name} | {table} | {cells[0]:.2f}s |"
        for prev, cur in zip(cells, cells[1:]):
            row += f" {cur:.2f}s | {cur / prev:.1f}x |"
        print(row)
    spark.stop()


if __name__ == "__main__":
    main()
