"""C1 — run configuration with the reference's precedence and names
(HRP:42-53,70-87): exactly 4 positional args XOR environment variables XOR
defaults. ES endpoint fields become filesystem paths (the engine's source is
parquet), keeping the same variable names where they still make sense."""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    client_code: str = "DEMO"  # HRP:46
    source_path: str = "/root/testdata/sf0.001"  # replaces esServer/esIndexName
    table_prefix: str = ""  # replaces esIndexName qualifier
    batch_size: int = 10000  # HRP:47 SPARK_PROCESS_BATCH_SIZE
    log_level: str = "INFO"  # HRP:48 LOG_LEVEL
    as_of: str | None = None  # engine addition: pinned now (RETENTION_AS_OF)
    extras: dict = field(default_factory=dict)


def load_config(argv: list[str] | None = None) -> EngineConfig:
    """argv of exactly 4 positionals (client, source, prefix, batch —
    mirroring HRP:82-87) wins; otherwise env vars (HRP:72-81); otherwise
    defaults."""
    cfg = EngineConfig()
    if argv is not None and len(argv) == 4:
        cfg.client_code = argv[0]
        cfg.source_path = argv[1]
        cfg.table_prefix = argv[2]
        cfg.batch_size = int(argv[3])
    else:
        cfg.client_code = os.environ.get("CLIENT_CODE", cfg.client_code)
        cfg.source_path = os.environ.get("SOURCE_PATH", cfg.source_path)
        cfg.table_prefix = os.environ.get("TABLE_PREFIX", cfg.table_prefix)
        cfg.batch_size = int(
            os.environ.get("SPARK_PROCESS_BATCH_SIZE", str(cfg.batch_size))
        )
    cfg.log_level = os.environ.get("LOG_LEVEL", cfg.log_level)
    cfg.as_of = os.environ.get("RETENTION_AS_OF", cfg.as_of)
    return cfg
