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


def tiny_sort(df: DataFrame, *cols) -> DataFrame:
    """ORDER BY for a result of BOUNDED cardinality (grouped aggregates whose
    group count is fixed by the schema — return flags, nations, windows — not
    by the data volume).

    A plain orderBy plans Exchange rangepartitioning, whose boundary SAMPLING
    job re-executes the entire upstream plan a second time — doubling every
    scan/join/agg below it (measured: TPC-H Q1 runs 4 jobs, Q5 ten, at sf0.1
    half the wall clock).  Coalescing the handful of post-aggregate partitions
    to one lets the single-partition sort satisfy the ordering requirement
    with no exchange and no sampling pass, at ANY scale — the final aggregate
    output is bounded, so the one-task sort is O(bounded · log bounded).
    Callers with data-proportional output (per-event, per-doc rows) must keep
    the distributed range sort instead."""
    return df.coalesce(1).orderBy(*cols)


def dim(df: DataFrame, sf_dir: str, table: str, threshold: int = 64 << 20) -> DataFrame:
    """Broadcast-hint a dimension table iff its on-disk parquet is small.

    Catalyst's auto-broadcast picks the build side purely by estimated size,
    which at small scale factors can select the FACT table (e.g. a 25 MB
    lineitem) as the broadcast side — a shape that inverts at scale and
    wastes time building a huge hash relation at any scale.  Declaring the
    dimension side explicitly — but only when its bytes justify it — keeps
    the fact table as the probe stream here AND at 1000×, where an oversized
    dimension simply stops being hinted and falls back to a shuffle join.
    """
    from pyspark.sql import functions as F

    size = table_bytes(sf_dir, table)
    if size is None:
        return df
    return F.broadcast(df) if size < threshold else df


def table_bytes(sf_dir: str, table: str) -> int | None:
    """On-disk bytes of a fixture table (None if unknown). For directory
    datasets, sums the part files — the directory inode's own size (~4KB)
    would broadcast-hint any table (ADVICE r3)."""
    try:
        path = os.path.join(sf_dir, f"{table}.parquet")
        if os.path.isdir(path):
            return sum(e.stat().st_size for e in os.scandir(path) if e.is_file())
        return os.path.getsize(path)
    except OSError:
        return None


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


def dumps_by_value(fn) -> bytes:
    """cloudpickle a module-level function BY VALUE (not by import path).

    The executor's fresh Python worker cannot import ps_datalake_spark when
    the driver runs from outside the repo (the driver contract adds the repo
    to the DRIVER's sys.path only; the worker zip covers module-level
    references but closures built per-query want self-contained payloads).
    register_pickle_by_value scoped to the dumps call forces the function
    body into the serialized task; the UDF unpickles it with stdlib pickle.
    """
    import sys

    from pyspark import cloudpickle as cp

    mod = sys.modules[fn.__module__]
    cp.register_pickle_by_value(mod)
    try:
        return cp.dumps(fn)
    finally:
        cp.unregister_pickle_by_value(mod)
