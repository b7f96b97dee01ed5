"""Fixed-|Q| retrieval production ladder + text-index maintenance ladder.

The registered ``hybrid_mlt_search*`` demos derive |Q| as a corpus
fraction (``id % 50 == 0``) because the oracle needs a corpus-determined
query set — which makes their published ladder super-linear BY
CONSTRUCTION. Production retrieval serves a FIXED adjudication batch, so
this tool measures the posture that matters at 100 TB:

1. hybrid retrieval (exact-dense and IVF-dense) with |Q| pinned to the
   same 40 query docs (``id % 50 == 0 AND id < 2000`` — replica 0 of the
   sf1 rehearsal corpus keeps original ids) at sf0.1 and sf1;
2. text-index maintenance: full ``build_text_index`` vs
   ``append_text_index`` of a 10% delta onto a 90% index, same corpora.

Usage: python tools/retrieval_ladder.py [sf_dir ...]   (default sf0.1, /tmp/sf1)
Prints markdown rows for SCALING.md. Steady-state: warm pass then timed
pass per cell (the repo-wide gen_scaling protocol).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SFS = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1"]
K = 5
MLT_MAX_TERMS = 20
FIXED_PRED = lambda c: (F.col(c) % 50 == 0) & (F.col(c) < 2000)  # noqa: E731


def main() -> None:
    from es_household_retention_spark_job_spark.operators import search as SE
    from es_household_retention_spark_job_spark.operators import similarity as S
    from es_household_retention_spark_job_spark.session import get_spark
    from es_household_retention_spark_job_spark.sources.tpch import load_table

    spark = get_spark(app_name="retrieval_ladder", cpus=32, shuffle_partitions=64)

    def timed(df) -> float:
        df.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    ann_idx: dict[str, str] = {}

    def hybrid(sf: str, dense: str):
        docs = load_table(spark, sf, "documents")
        embs = load_table(spark, sf, "embeddings")
        queries = embs.where(FIXED_PRED("vec_id"))
        if dense == "exact":
            d = S.knn_bruteforce(embs, queries, k=K)
        else:
            # persisted IVF index (the registered hybrid_mlt_search_ann
            # form): training amortized across batches, probe-pruned read
            if sf not in ann_idx:
                ann_idx[sf] = os.path.join(
                    tempfile.mkdtemp(prefix="ladder_ann_"), "idx"
                )
                S.build_ann_index(embs, ann_idx[sf])
            d = S.knn_ivf_indexed(spark, ann_idx[sf], queries, k=K)
        d = d.select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
        sp = SE.bm25_more_like_this(
            docs, FIXED_PRED("doc_id"), k=K, max_query_terms=MLT_MAX_TERMS
        ).select("query_id", "doc_id", "rank")
        return SE.rrf_fuse([sp, d], k=K)

    print("| corpus | |Q| | hybrid exact-dense | hybrid IVF-dense |")
    print("|---|---|---|---|")
    for sf in SFS:
        docs = load_table(spark, sf, "documents")
        nq = (
            load_table(spark, sf, "embeddings")
            .where(FIXED_PRED("vec_id"))
            .count()
        )
        te = timed(hybrid(sf, "exact"))
        ti = timed(hybrid(sf, "ivf"))
        print(
            f"| {os.path.basename(sf)} ({docs.count()} docs) | {nq} "
            f"| {te:.2f}s | {ti:.2f}s |"
        )

    print()
    print("| corpus | full build | 10% delta append | ratio |")
    print("|---|---|---|---|")
    for sf in SFS:
        docs = load_table(spark, sf, "documents")
        base = docs.where(F.col("doc_id") % 10 != 0)
        delta = docs.where(F.col("doc_id") % 10 == 0)
        root = tempfile.mkdtemp(prefix="ladder_idx_")
        try:
            t0 = time.perf_counter()
            SE.build_text_index(docs, os.path.join(root, "full"))
            t_full = time.perf_counter() - t0
            SE.build_text_index(base, os.path.join(root, "inc"))
            t0 = time.perf_counter()
            SE.append_text_index(delta, os.path.join(root, "inc"))
            t_app = time.perf_counter() - t0
        finally:
            shutil.rmtree(root, ignore_errors=True)
        print(
            f"| {os.path.basename(sf)} ({docs.count()} docs) "
            f"| {t_full:.2f}s | {t_app:.2f}s | {t_full / t_app:.1f}x |"
        )


if __name__ == "__main__":
    main()
