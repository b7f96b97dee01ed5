"""Emit EXTRA_CORRECTNESS.json — the machine-readable oracle verdict for the
extra (non-driver-slot) query registry, in the SAME row shape the external
driver writes to CORRECTNESS_r{N}.json:

    {name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
            err}}

The external driver correctness-checks only the first 50 registry slots, so
the extra queries (strategy demos, redundant TPC-H shapes, approximate-by-
design ANN paths, the sink's partial/CoW twins) were previously visible only
through a pytest run. This tool makes the whole 100+-query surface
reviewable from committed artifacts alone. Queries with no oracle SQL (approximate ANN) record the driver's
weaker rows-only check: ``hash_match``/``schema_match`` null, ``oracle_rows``
null.

Run from the repo root (defaults mirror the driver: sf0.01):

    python tools/extra_correctness.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def compare_one(spark, duck, fn, sql: str | None, sf_dir: str) -> dict:
    """One registry entry → one driver-shaped result row."""
    from tests.conftest import canon_frame

    row: dict = {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None,
    }
    try:
        got = fn(spark, sf_dir).toPandas()
        row["spark_rows"] = len(got)
        if sql is None:
            # rows-only check. Stricter than the driver's weak path (which
            # accepts any row count): every registered no-oracle query
            # (the approximate ANN paths) is non-empty by construction, so
            # an empty result means the operator broke.
            row["rows_match"] = len(got) > 0 and len(got.columns) > 0
            return row
        want = duck.execute(sql).df()
        row["oracle_rows"] = len(want)
        row["rows_match"] = len(got) == len(want)
        row["schema_match"] = sorted(got.columns) == sorted(want.columns)
        row["hash_match"] = bool(
            row["schema_match"] and canon_frame(got) == canon_frame(want)
        )
    except Exception as e:  # noqa: BLE001 — the artifact must always emit
        row["err"] = f"{type(e).__name__}: {e}"[:500]
    return row


def run_registry(queries: dict, oracles: dict, sf_dir: str) -> dict:
    import duckdb

    from es_household_retention_spark_job_spark.session import get_spark
    from es_household_retention_spark_job_spark.sources.tpch import TABLES

    spark = get_spark(
        app_name="extra-correctness", cpus=8, shuffle_partitions=16
    )
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    results = {
        name: compare_one(spark, duck, fn, oracles.get(name), sf_dir)
        for name, fn in sorted(queries.items())
    }
    # the approximate ANN rows are rows-only by nature; publish their
    # measured quality (recall@k vs the oracle-checked knn_bruteforce,
    # computed by the registered knn_ann_eval query) as an ``info`` field so
    # a reviewer sees approximate-path quality from this artifact alone
    if "knn_ann_eval" in queries:
        try:
            from es_household_retention_spark_job_spark.entry_queries_docs import (
                KNN_K,
            )

            for r in queries["knn_ann_eval"](spark, sf_dir).collect():
                row = results.get(f"knn_{r['method']}")
                if row is not None:
                    row["info"] = {
                        "recall_at_k": r["recall_bp"] / 10000,
                        "k": KNN_K,
                        "n_queries": r["n_queries"],
                        # corpus fraction the probes actually scored — the
                        # cost that bought the recall (1.0 = brute force)
                        "scanned_fraction": r["scanned_bp"] / 10000,
                        "vs": "knn_bruteforce (oracle-checked exact top-k)",
                    }
        except Exception as e:  # noqa: BLE001 — info is best-effort
            results["knn_ann_eval"]["err"] = f"info: {type(e).__name__}: {e}"[:500]
    # the clustered-corpus eval is the sub-linear-pruning evidence (the
    # near-orthogonal numbers above CANNOT show pruning — that regime is
    # linear-scan-hard by construction); publish both methods' measured
    # recall and scanned fraction on the realistic corpus in its own row
    if "knn_ann_eval_clustered" in queries:
        try:
            results["knn_ann_eval_clustered"]["info"] = {
                "corpus": "clustered eval set (operators/evalcorpus.py: "
                "64 clusters x 64 points, intra-cluster cos ~0.90)",
                "gate": "recall >= 0.9 at scanned_fraction <= 0.2 "
                "(pinned in tests/test_docs_pipeline.py)",
                "per_method": {
                    r["method"]: {
                        "recall_at_k": r["recall_bp"] / 10000,
                        "scanned_fraction": r["scanned_bp"] / 10000,
                        "n_queries": r["n_queries"],
                    }
                    for r in queries["knn_ann_eval_clustered"](
                        spark, sf_dir
                    ).collect()
                },
            }
        except Exception as e:  # noqa: BLE001 — info is best-effort
            results["knn_ann_eval_clustered"]["err"] = (
                f"info: {type(e).__name__}: {e}"[:500]
            )
    duck.close()
    return results


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else REPO / "EXTRA_CORRECTNESS.json"

    from es_household_retention_spark_job_spark.entry_queries import (
        EXTRA_ORACLE_SQL,
        EXTRA_QUERIES,
    )

    results = run_registry(EXTRA_QUERIES, EXTRA_ORACLE_SQL, sf_dir)
    out.write_text(json.dumps(results, indent=2) + "\n")
    bad = [
        n
        for n, r in results.items()
        if r["err"] or r["rows_match"] is False or r["hash_match"] is False
    ]
    n_oracled = sum(1 for n in results if n in EXTRA_ORACLE_SQL)
    print(
        f"{len(results)} extra queries ({n_oracled} oracle-backed) -> {out}; "
        f"failures: {bad or 'none'}"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
