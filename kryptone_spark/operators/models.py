"""Scraped-item model shaping: the reference's dataclass field-cleaner
hooks re-expressed declaratively.

The reference runs ``clean_<field>(value)`` methods on each model
instance before persisting (base.py:527-534 calls every ``clean_*``
hook found on the dataclass; contrib/models.py:59-121 defines the
Product shape those hooks operate on). Per-instance Python is the
slow path here; the engine form is a cleaner *spec* — one expression
(or Column-returning callable) per field — compiled into a single
``withColumns`` projection, so every cleaner runs JVM-side in one
whole-stage-codegen span regardless of how many fields are cleaned.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from typing import Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# NOT `Column | Callable`: that would *evaluate* Column.__or__ at
# import time (this alias line is runtime code, unlike annotations).
Cleaner = Union[Column, Callable[[Column], Column]]


def apply_cleaners(df: DataFrame, cleaners: Mapping[str, Cleaner]) -> DataFrame:
    """Apply per-field cleaners, mirroring the reference's
    ``clean_<field>`` dispatch: each key must name an existing column
    (the reference only discovers hooks for declared dataclass fields),
    each value is either a ready Column expression or a callable
    receiving the field's Column. All cleaners land in ONE projection —
    order-independent, like the reference's (each hook sees the
    original parsed value, not another hook's output).
    """
    missing = [c for c in cleaners if c not in df.columns]
    if missing:
        raise ValueError(f"cleaner fields not in DataFrame: {missing}")
    return df.withColumns(
        {
            field: (fn(F.col(field)) if callable(fn) else fn)
            for field, fn in cleaners.items()
        }
    )
