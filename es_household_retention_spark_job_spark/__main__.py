"""CLI entry: ``python -m es_household_retention_spark_job_spark [client source prefix batch]``.

Mirrors the reference's main (HRP:68-131): config from 4 positional args XOR
env vars, stage banners, two-phase run. The person store must be in the
keyed-bucket layout (sinks.upsert.write_keyed_table); encounter is plain
parquet."""

from __future__ import annotations

import logging
import sys

from .clock import resolve_as_of
from .config import load_config
from .pipeline import run_retention
from .session import get_spark


def main(argv: list[str]) -> int:
    cfg = load_config(argv if len(argv) == 4 else None)
    logging.basicConfig(
        level=cfg.log_level, format="%(asctime)s %(name)s %(levelname)s %(message)s"
    )
    log = logging.getLogger("retention.main")
    log.info("-------- PROCESS START")
    for k, v in vars(cfg).items():
        log.info("%s: %s", k, v)

    as_of = resolve_as_of(cfg.as_of)
    spark = get_spark(app_name="HouseholdRetentionProcessing")
    prefix = f"{cfg.table_prefix}_" if cfg.table_prefix else ""
    stats = run_retention(
        spark,
        f"{cfg.source_path}/{prefix}person",
        f"{cfg.source_path}/{prefix}encounter",
        cfg.client_code,
        as_of,
    )
    log.info("run complete: %s", stats)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
