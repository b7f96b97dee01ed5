"""SQ8 × IVF composition ladder: bytes + wall-clock evidence for the
round-9 ``knn_sq8_indexed`` plan against its three alternatives on the
same persisted index and a FIXED 40-query batch (the production
adjudication-batch shape, like tools/retrieval_ladder.py):

1. ``knn_sq8`` — full-corpus quantized scan (round 8's plan, the one the
   verdict graded weak);
2. ``knn_ivf_indexed`` — probe-pruned double-precision scoring;
3. ``knn_sq8_indexed`` — probe-pruned code scoring + exact top-R re-rank;
4. ``knn_pq_indexed`` — probe-pruned ADC over the PQ sidecar + the same
   exact re-rank (round 11's third tier; ``add_pq_sidecar`` upgrade cost
   is timed too);
5. ``knn_bruteforce`` — the exact ground truth (recall denominators).

Also reports the on-disk byte ratios cells/ : codes/ : pq/ (what a probe
READS per cell in each representation — parquet dictionary-encodes the
≤255 distinct code values and the ≤ksub PQ nibbles, doubles are
incompressible) and the recall@k of each approximate path vs brute force
on the same queries. Verdicts are STRICT three-way: the route must equal
the measured-cheapest endpoint among every tier the index materializes.

Usage: python tools/sq8_ladder.py [sf_dir ...]   (default sf0.1, /tmp/sf1)
Prints markdown rows for SCALING.md. Warm pass then timed pass per cell
(the repo-wide gen_scaling protocol).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SFS = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1"]
K = 5
FIXED_PRED = lambda c: (F.col(c) % 50 == 0) & (F.col(c) < 2000)  # noqa: E731


def du(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )


def main() -> None:
    from es_household_retention_spark_job_spark.operators import similarity as S
    from es_household_retention_spark_job_spark.session import get_spark

    spark = get_spark(app_name="sq8-ladder", cpus=32, shuffle_partitions=64)

    def timed(fn):
        fn()  # warm
        t0 = time.perf_counter()
        n = fn()
        return time.perf_counter() - t0, n

    for sf_dir in SFS:
        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = embs.where(FIXED_PRED("vec_id"))
        n_corpus = embs.count()
        idx = os.path.join(tempfile.mkdtemp(prefix="sq8_ladder_"), "idx")
        t0 = time.perf_counter()
        S.build_ann_index(embs, idx)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        S.add_pq_sidecar(spark, idx)  # the migration-path cost, measured
        t_pq = time.perf_counter() - t0
        cells_b, codes_b, pq_b = (
            du(f"{idx}/cells"),
            du(f"{idx}/codes"),
            du(f"{idx}/pq"),
        )

        exact = {
            (r.query_id, r.neighbor_id)
            for r in S.knn_bruteforce(embs, queries, k=K).collect()
        }

        rows = {}
        for name, fn in (
            ("knn_sq8 (full scan)", lambda: S.knn_sq8(embs, queries, k=K)),
            (
                "knn_ivf_indexed",
                lambda: S.knn_ivf_indexed(spark, idx, queries, k=K),
            ),
            (
                "knn_sq8_indexed",
                lambda: S.knn_sq8_indexed(spark, idx, queries, k=K),
            ),
            (
                "knn_pq_indexed",
                lambda: S.knn_pq_indexed(spark, idx, queries, k=K),
            ),
        ):
            def run(fn=fn):
                return {
                    (r.query_id, r.neighbor_id) for r in fn().collect()
                }
            dt, got = timed(run)
            rows[name] = (dt, len(got & exact) / len(exact) if exact else 1.0)

        print(f"\n### {sf_dir} — corpus {n_corpus}, |Q| fixed {queries.count()}")
        print(
            f"index build {t_build:.2f}s + pq sidecar {t_pq:.2f}s; "
            f"cells {cells_b/1e6:.2f} MB, codes {codes_b/1e6:.2f} MB "
            f"(ratio {cells_b/codes_b:.2f}x), pq {pq_b/1e6:.2f} MB "
            f"(ratio {cells_b/pq_b:.2f}x)"
        )
        route_s, stats_s, _ = S.choose_ann_route(
            spark, idx, queries, k=K, with_plan=True
        )
        print(f"route (fixed batch): {route_s} (stats {stats_s})")
        print("| path | sec | recall@5 |")
        print("|---|---|---|")
        for name, (dt, rec) in rows.items():
            print(f"| {name} | {dt:.2f}s | {rec:.3f} |")
        # STRICT verdict (r10: a 29% miss was filed as "parity"): the
        # route must equal the measured-cheapest endpoint, all tiers
        cheaper_s = min(
            ("ivf", rows["knn_ivf_indexed"][0]),
            ("sq8", rows["knn_sq8_indexed"][0]),
            ("pq", rows["knn_pq_indexed"][0]),
            key=lambda t: t[1],
        )[0]
        print(
            f"fixed-batch verdict: routed {route_s}, measured-cheaper "
            f"{cheaper_s} -> {'MATCH' if route_s == cheaper_s else 'MISMATCH'}"
        )

        # corpus-fraction regime (round 10): |Q| ~ 10k — the batch size
        # where the round-9 sf1 section showed the SQ8 composition LOSING
        # to plain IVF. knn_ann_auto must route to the measured-cheaper
        # plan, and above SPARK_GRAFT_SQ8_CAND_COLLECT_MAX the SQ8 re-rank
        # keeps candidates distributed (no |Q|-proportional driver
        # collect by construction).
        step = max(n_corpus // 10_000, 1)
        bigq = embs.where(F.col("vec_id") % step == 0)
        n_big = bigq.count()
        route_b, stats_b, _ = S.choose_ann_route(
            spark, idx, bigq, k=K, with_plan=True
        )
        route_b = (route_b, stats_b["cand_pairs"], stats_b["probe_rows"])
        print(f"corpus-fraction route stats: {stats_b}")
        rows_b = {}
        for name, fn in (
            (
                "knn_ivf_indexed",
                lambda: S.knn_ivf_indexed(spark, idx, bigq, k=K),
            ),
            (
                "knn_sq8_indexed (distributed re-rank)",
                lambda: S.knn_sq8_indexed(spark, idx, bigq, k=K),
            ),
            (
                "knn_pq_indexed (distributed re-rank)",
                lambda: S.knn_pq_indexed(spark, idx, bigq, k=K),
            ),
            (
                "knn_ann_auto",  # pq is opt-in (recall-conservative
                # default); the ladder opts in to adjudicate all tiers
                lambda: S.knn_ann_auto(
                    spark, idx, bigq, k=K, tiers=("ivf", "sq8", "pq")
                ),
            ),
        ):
            def run_b(fn=fn):
                return fn().count()
            dt, n_rows = timed(run_b)
            rows_b[name] = (dt, n_rows)
        print(
            f"\n|Q| = {n_big} (corpus-fraction): route = {route_b[0]} "
            f"(cand_pairs {route_b[1]}, probe_rows {route_b[2]})"
        )
        print("| path | sec | out rows |")
        print("|---|---|---|")
        for name, (dt, n_rows) in rows_b.items():
            print(f"| {name} | {dt:.2f}s | {n_rows} |")
        cheaper = min(
            ("ivf", rows_b["knn_ivf_indexed"][0]),
            ("sq8", rows_b["knn_sq8_indexed (distributed re-rank)"][0]),
            ("pq", rows_b["knn_pq_indexed (distributed re-rank)"][0]),
            key=lambda t: t[1],
        )[0]
        print(
            f"auto routed {route_b[0]}; measured-cheaper endpoint: {cheaper} "
            f"({'MATCH' if route_b[0] == cheaper else 'MISMATCH'})"
        )


if __name__ == "__main__":
    main()
