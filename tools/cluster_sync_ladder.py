"""Cluster-maintenance ladder: does the union-find cluster table follow
the documents table at O(changes), not O(corpus)?

The fixed-delta protocol (index_sync_ladder --mode=fixed): a CONSTANT
change set — 1,500 text mutations + 500 fresh near-dup inserts at ids
that exist at every scale — against corpora growing 100×
(sf0.1 → sf1 → sf10), plus one DELETE window (500 ids) per corpus.
Arms:

* ``sync``    — sync_neardup_index (the pair source must absorb the
  window first; its cost is reported separately) + sync_dedup_clusters.
* ``rebuild`` — build_cluster_table from the table's resolved state:
  full MinHash-LSH pair generation + label-propagation components, the
  batch baseline a no-maintenance deployment pays per refresh.

Gates: the mutation/insert rounds check strict EQUALITY between the
synced view and the rebuild (the regime the equality contract covers);
the delete round checks the operator's actual delete contract —
soundness (every served member live), completeness (every
batch-clustered doc served), coarsening (a batch cluster never splits
across served clusters; conservative merges may linger, pinned
divergence) — because random deletions can sever bridges.

Usage: python tools/cluster_sync_ladder.py [sf_dir ...] [--rounds N]
Prints one markdown row per (sf, round) plus a JSON summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
SFS = ARGS or ["/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10"]
ROUNDS = 2
for a in sys.argv[1:]:
    if a.startswith("--rounds"):
        ROUNDS = int(a.split("=", 1)[1])

DOC_MUT, DOC_FRESH, DOC_DEL = 1500, 500, 500  # fixed absolute deltas


def main() -> None:
    from es_household_retention_spark_job_spark.operators import (
        clusters as C,
        dedup as D,
    )
    from es_household_retention_spark_job_spark.session import get_spark
    from es_household_retention_spark_job_spark.sinks import upsert as U
    from es_household_retention_spark_job_spark.sources.tpch import load_table
    from es_household_retention_spark_job_spark.streaming.index_sync import (
        cdc_stream_id,
        sync_dedup_clusters,
        sync_neardup_index,
    )

    spark = get_spark(
        app_name="cluster_sync_ladder", cpus=32, shuffle_partitions=64
    )

    def view(path):
        return sorted(
            tuple(r)
            for r in C.read_dedup_clusters(spark, path).collect()
        )

    print(
        "| corpus | round | Δdocs | band sync | cluster sync "
        "| rebuild | ratio | equal |"
    )
    print("|---|---|---|---|---|---|---|---|")
    summary = []
    for sf in SFS:
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        n = docs.count()
        root = tempfile.mkdtemp(prefix="cluster_ladder_")
        table = os.path.join(root, "table")
        idx = os.path.join(root, "idx")
        cl = os.path.join(root, "clusters")
        U.write_keyed_table(docs, table, key="doc_id", n_buckets=16)
        v0 = U.current_version(table)
        D.build_neardup_index(U.read_keyed_table(spark, table), idx)
        C.build_cluster_table(
            U.read_keyed_table(spark, table), cl,
            epoch=v0, epoch_stream=cdc_stream_id(table),
        )
        def measure(rnd, gate):
            t0 = time.perf_counter()
            sync_neardup_index(spark, idx, table, from_version=v0)
            t_band = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = sync_dedup_clusters(spark, cl, table, idx, from_version=v0)
            t_sync = time.perf_counter() - t0
            reb = os.path.join(root, f"reb{rnd}")
            t0 = time.perf_counter()
            C.build_cluster_table(U.read_keyed_table(spark, table), reb)
            t_reb = time.perf_counter() - t0
            if gate == "equal":
                ok = view(cl) == view(reb)
            else:  # the delete contract: sound, complete, coarsening
                live = {
                    r.doc_id
                    for r in U.read_keyed_table(spark, table)
                    .select("doc_id")
                    .collect()
                }
                served = {
                    r.doc_id: r.cluster_id
                    for r in C.read_dedup_clusters(spark, cl).collect()
                }
                batch = {d: c for d, c, _ in view(reb)}
                by_batch: dict = {}
                for d, c in batch.items():
                    by_batch.setdefault(c, set()).add(served.get(d))
                ok = (
                    set(served) <= live
                    and set(batch) <= set(served)
                    and all(
                        len(s) == 1 and None not in s
                        for s in by_batch.values()
                    )
                )
            shutil.rmtree(reb, ignore_errors=True)
            row = {
                "sf": os.path.basename(sf),
                "docs": n,
                "round": rnd,
                "delta": out["upserted"] + out["deleted"],
                "gate": gate,
                "band_sync_s": round(t_band, 2),
                "cluster_sync_s": round(t_sync, 2),
                "rebuild_s": round(t_reb, 2),
                "ratio": round(t_reb / max(t_sync, 1e-9), 2),
                "ok": ok,
            }
            summary.append(row)
            print(
                f"| {row['sf']} ({n} docs) | {rnd} ({gate}) "
                f"| {row['delta']} | {t_band:.2f}s | {t_sync:.2f}s "
                f"| {t_reb:.2f}s | {row['ratio']}x | "
                f"{'PASS' if ok else 'FAIL'} |"
            )

        for rnd in range(1, ROUNDS + 1):
            lo = (rnd - 1) * (DOC_MUT + DOC_FRESH)
            # text mutations of DOC_MUT existing ids, plus DOC_FRESH
            # fresh near-dup inserts straddling the corpus
            muts = docs.where(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + DOC_MUT)
            ).withColumn(
                "text",
                F.concat(
                    F.col("text"),
                    F.lit(f" zzsync{rnd} zzsync{rnd}"),
                ),
            )
            fresh = docs.where(
                (F.col("doc_id") >= lo)
                & (F.col("doc_id") < lo + DOC_FRESH)
            ).select(
                (F.col("doc_id") + 90_000_000 + rnd * 1_000_000).alias(
                    "doc_id"
                ),
                "text",
            )
            U.upsert_parquet(
                spark, table, muts.unionByName(fresh), key="doc_id"
            )
            measure(rnd, "equal")
        # delete window: DOC_DEL ids spread across the corpus — random
        # deletions can sever bridges, so the gate is the operator's
        # delete CONTRACT (sound/complete/coarsening), not equality
        dels = docs.where(
            (F.col("doc_id") % 97 == 13)
        ).select("doc_id").limit(DOC_DEL)
        U.delete_keys(spark, table, dels, key="doc_id")
        measure(ROUNDS + 1, "contract")
    print(json.dumps({"cluster_sync_ladder": summary}))


if __name__ == "__main__":
    main()
