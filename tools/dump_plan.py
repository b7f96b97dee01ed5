"""Dump `.explain("formatted")` for named queries to
plans/$SPARK_GRAFT_PLAN_DIR/<q>_<tag>.txt (default plans/r14).

Usage: python tools/dump_plan.py <tag> <query> [<query> ...]
Plans are captured at sf0.001 (plan shape is scale-invariant, same as
tools/gen_plans.py) with expression IDs left intact; exchange counts are
printed to stdout for a quick before/after diff.
"""

import io
import os
import re
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from es_household_retention_spark_job_spark.entry_queries import (
        EXTRA_QUERIES,
        QUERIES,
    )
    from es_household_retention_spark_job_spark.session import get_spark

    spark = get_spark(app_name="dump_plan", cpus=8, shuffle_partitions=16)
    all_queries = {**QUERIES, **EXTRA_QUERIES}
    out_dir = os.path.join(
        os.path.dirname(__file__),
        "..",
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_DIR", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for name in names:
        df = all_queries[name](spark, sf_dir)
        buf = io.StringIO()
        stdout, sys.stdout = sys.stdout, buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        text = buf.getvalue()
        # normalize plan ids so diffs are stable across runs
        text = re.sub(r"plan_id=\d+", "plan_id=N", text)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        n_ex = len(re.findall(r"\n\(\d+\) Exchange\b", text))
        n_bc = len(re.findall(r"\n\(\d+\) BroadcastExchange\b", text))
        print(f"{name}: {n_ex} Exchange, {n_bc} BroadcastExchange -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
