"""Pinned-now clock.

The reference resolves "now" independently several times per run — joda in
the month grid (HRP:486), SQL interpolation of the max month (HRP:556),
commons-lang in the phase-2 bounds (HRP:753), and ES-side ``now-4y/now-5y``
date math (HRP:188,361). That is a latent midnight-boundary race. The engine
resolves ``as_of`` ONCE per run and threads it through every operator, which
also makes results reproducible (FIXTURES.md pins it for the oracle).
"""

from __future__ import annotations

import os
from datetime import date, datetime, timezone

# Pinned default for the driver-generated testdata: orders span
# 1995-01-01 .. 2001-08-01, so the 49-month grid is 1997-08-01 .. 2001-08-01.
TESTDATA_AS_OF = datetime(2001, 8, 1, 0, 0, 0, tzinfo=timezone.utc)


def resolve_as_of(value: datetime | date | str | None = None) -> datetime:
    """Resolve the run's single "now". Precedence: explicit arg,
    ``$RETENTION_AS_OF`` (ISO format), wall clock."""
    if value is None:
        env = os.environ.get("RETENTION_AS_OF")
        if env:
            value = env
        else:
            return datetime.now(timezone.utc)
    if isinstance(value, str):
        value = datetime.fromisoformat(value.replace("Z", "+00:00"))
    if isinstance(value, date) and not isinstance(value, datetime):
        value = datetime(value.year, value.month, value.day)
    if value.tzinfo is None:
        value = value.replace(tzinfo=timezone.utc)
    return value.astimezone(timezone.utc)


def month_floor(ts: datetime) -> datetime:
    """First instant of ts's month (HRP:486 ``withDayOfMonth(1)``,
    HRP:753 ``DateUtils.truncate(MONTH)``)."""
    return ts.replace(day=1, hour=0, minute=0, second=0, microsecond=0)


def add_years(ts: datetime, years: int) -> datetime:
    """Calendar-year shift (HRP:487 ``plusYears``, HRP:754-755 ``addYears``).
    Feb 29 clamps to Feb 28 in non-leap targets (joda/commons-lang do the
    same; a bare ``replace(year=...)`` would raise on leap days)."""
    target = ts.year + years
    try:
        return ts.replace(year=target)
    except ValueError:  # Feb 29 -> non-leap year
        return ts.replace(year=target, day=28)


def epoch_ms(ts: datetime) -> int:
    return int(ts.timestamp() * 1000)
