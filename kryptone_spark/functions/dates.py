"""Date scalar functions (reference: kryptone/utils/date_functions.py:6-50)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_expired(ts: Column, days: int = 30) -> Column:
    """date_functions.py:40-50 — older than `days` relative to now."""
    return ts < F.current_timestamp() - F.expr(f"INTERVAL {int(days)} DAYS")


def weekday(ts: Column) -> Column:
    """Monday=0 like datetime.weekday() (date_functions.py:18-23);
    Spark dayofweek is Sunday=1."""
    return (F.dayofweek(ts) + 5) % 7


def month(ts: Column) -> Column:
    return F.month(ts)
