"""Simulates the driver's verify: runs every ``queries()`` entry at the test
scale factor and hash-compares against its ``oracle_sql()`` entry, plus the
``entry()`` smoke check. Keeping this green means CORRECTNESS_r{N}.json will
be green."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

from .conftest import SF_DIR, assert_matches_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert len(df.schema.fields) == 7
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    if name in ORACLES:
        assert_matches_oracle(df, duck, ORACLES[name])
    else:
        # rows-only check, mirroring the driver's weaker path
        assert df.count() >= 0 and len(df.schema.fields) > 0
