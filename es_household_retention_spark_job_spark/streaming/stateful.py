"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.9 stretch goal): a running per-household encounter aggregate —
the kind of semantics (monotone running state across micro-batches) that
built-in streaming aggregations cover only per-window, not per-lifetime.

Shape notes for scale: state is one tiny fixed-width row per household key
(two longs), stored in the state store and sharded by the groupBy key — the
same partitioning as every other household-keyed stage, so no extra
shuffle boundary is introduced beyond the one the groupBy requires. Arrow
batches stream per key-group; nothing is collected."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_encounters", LongType()),
        StructField("last_admit", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("household_id", StringType()),
        StructField("n_encounters", LongType()),
        StructField("last_admit", LongType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, last = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        # malformed-NDJSON rows arrive with null admit_date (the from_json
        # degrade-don't-crash contract) — they are not encounters
        valid = pdf["admit_date"].dropna()
        n += len(valid)
        if len(valid):
            last = max(last, int(valid.max()))
    state.update((n, last))
    yield pd.DataFrame(
        {"household_id": [key[0]], "n_encounters": [n], "last_admit": [last]}
    )


def running_household_state(encounters: DataFrame) -> DataFrame:
    """(household_id, admit_date) stream → one updated state row per
    household per micro-batch."""
    return encounters.groupBy("household_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
