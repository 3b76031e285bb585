"""Shared helpers for query builders."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table

T = load_table  # short alias used throughout the query modules


def scratch_dir(name: str) -> str:
    """Stable per-process scratch path for sink/round-trip queries."""
    base = os.path.join(tempfile.gettempdir(), "ps_datalake_spark_scratch")
    os.makedirs(base, exist_ok=True)
    return os.path.join(base, name)


def ordered(df: DataFrame, *cols: str) -> DataFrame:
    """Total ORDER BY for deterministic output (FIXTURES.md conventions)."""
    return df.orderBy(*cols)


def dround(col, scale: int = 0):
    """round() matching DuckDB's double semantics.

    Spark's ``F.round`` applies HALF_UP to the shortest decimal representation
    of the double, while DuckDB scales the double by 10^n and rounds
    half-away-from-zero on the *scaled* value (so 37704.575 → 37704.57 because
    37704.575*100 == 3770457.4999…). Reproduce DuckDB: scale → round(…, 0) →
    unscale. The inner round-at-zero agrees between HALF_UP-on-decimal-string
    and C's round() for every double.
    """
    from pyspark.sql import functions as F

    if isinstance(col, str):
        col = F.col(col)
    p = float(10**scale)
    return F.round(col * F.lit(p), 0) / F.lit(p)
