"""Skew-mitigation joins (SURVEY §4 "band-join efficiency ... skew risk for
mega-households").

AQE's skew-join splitting (enabled in session.py) handles sort-merge skew
at runtime; this module is the *static* salting fallback for the cases AQE
can't fix — e.g. a broadcast-ineligible small side joined against a key
where one value holds 30% of all rows (one reducer gets 30 TB at 100 TB
scale).

``salted_join`` fans the hot keys out across ``n_salt`` sub-partitions:
the big side gets a deterministic salt derived from a high-cardinality
column; the small side is replicated ``n_salt``× (array+explode, no driver
loop). Result is identical to the plain join (asserted in
tests/test_skew.py); the shuffle key becomes (key, salt), so no single
reducer sees a whole hot key."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_from: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to skew in ``big``'s join-key distribution.

    ``salt_from``: a (high-cardinality) column of ``big`` the salt is
    hashed from — deterministic, so retries/replays place rows identically
    (never use rand(): a task retry would re-salt and drop/duplicate rows).

    Only join types that never emit unmatched SMALL-side rows are allowed:
    with the small side replicated ``n_salt``×, a right/full outer join
    would surface each unmatched small row ``n_salt`` times.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; {how!r} would duplicate "
            "unmatched replicated small-side rows"
        )
    on = list(on)
    b = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salt)).cast("int")
    )
    s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return b.join(s, [*on, SALT_COL], how).drop(SALT_COL)
