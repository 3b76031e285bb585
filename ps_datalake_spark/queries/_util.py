"""Shared helpers for query builders."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

T = load_table  # short alias used throughout the query modules


def scratch_dir(name: str) -> str:
    """Stable per-process scratch path for sink/round-trip queries."""
    base = os.path.join(tempfile.gettempdir(), "ps_datalake_spark_scratch")
    os.makedirs(base, exist_ok=True)
    return os.path.join(base, name)


from ..plandump import dump_plan  # noqa: F401 — re-export (query modules
# import it from here; implementation lives outside the queries package so
# operators/lake can import it without a circular import)


def sweep_stale_scratch(max_age_sec: int = 3600) -> int:
    """Remove per-run scratch dirs (UUID-named checkpoints/indexes) older
    than ``max_age_sec`` from the scratch root.

    Per-run dirs are cleaned by try/finally on every normal exit path, but a
    SIGKILL (the driver's low-core bench timeout, r12) can strand a full set
    — /tmp then accumulates one orphan set per killed run.  Only prefixes
    that are per-run by construction (fresh UUID names every invocation) are
    swept; content-keyed caches (scaled corpora, staged stream files, stable
    stores) are never touched.  The age guard keeps a concurrently running
    session's live dirs safe."""
    import shutil
    import time as _time

    per_run_prefixes = (
        "incr_nd_idx_", "incr_nd_sig_", "incr_nd_pairs_", "incr_nd_ckpt_",
        "docs_stream_cp_", "ckpt_stream_sink_", "q_wf_a_", "q_wf_b_",
        "q_store_dedup_run_",
    )
    base = os.path.join(tempfile.gettempdir(), "ps_datalake_spark_scratch")
    removed = 0
    try:
        entries = list(os.scandir(base))
    except OSError:
        return 0
    now = _time.time()
    for e in entries:
        if not e.name.startswith(per_run_prefixes):
            continue
        try:
            if now - e.stat().st_mtime > max_age_sec:
                shutil.rmtree(e.path, ignore_errors=True)
                removed += 1
        except OSError:
            continue
    return removed


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


def stage_stream_files(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    cols: tuple[str, ...],
    key_col: str,
    prefix: str,
    n_groups: int = 4,
    transform=None,
) -> str:
    """Stage one fixture table as ``n_groups`` deterministic parquet files
    for a readStream (maxFilesPerTrigger=1) — shared by the streaming
    maintenance queries (b89/b90/b91/b92).

    Grouping uses ``pmod`` so a negative key still lands in a group, and the
    staged group counts are ASSERTED to sum to the source row count at
    staging time: a NULL-key row (pmod → NULL, matches no group) fails
    loudly here instead of silently falling out of the stream while the
    full-recompute witness and the DuckDB oracle still count it (r11
    advisor items 1-2 — the same NULL-population bug class b86/b87 fixed).

    The stage is cache-keyed by source-file identity (size+mtime), so a
    regenerated fixture re-stages; stale same-prefix siblings left by older
    fixtures are swept so /tmp does not accumulate one copy per
    regeneration (advisor item 3).  Staging exists only because the fixture
    is one parquet file — a production deployment points the same
    foreachBatch at a real source.
    """
    import hashlib
    import shutil

    st = os.stat(os.path.join(sf_dir, f"{table}.parquet"))
    ident = f"{sf_dir}:{st.st_size}:{st.st_mtime_ns}"
    token = hashlib.md5(ident.encode()).hexdigest()[:8]
    stage = scratch_dir(f"{prefix}_{token}")
    parent, base = os.path.dirname(stage), os.path.basename(stage)
    for sib in os.listdir(parent):
        if sib.startswith(f"{prefix}_") and sib != base:
            shutil.rmtree(os.path.join(parent, sib), ignore_errors=True)
    marker = os.path.join(stage, "_STAGED")
    if os.path.exists(marker):
        return stage
    os.makedirs(stage, exist_ok=True)
    src = T(spark, sf_dir, table)
    # ``transform`` derives the staged corpus from the loaded table (e.g.
    # b92's planted near-dup union) — it is deterministic CODE, so the
    # source-identity cache key stays valid; a transform change must bump
    # ``prefix``.
    if transform is not None:
        src = transform(src)
    src = src.select(*cols)
    total = src.count()
    staged = 0
    for g in range(n_groups):
        tmp = stage + f".g{g}.tmp"
        (
            src.where(F.pmod(F.col(key_col), F.lit(n_groups)) == g)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        staged += spark.read.parquet(tmp).count()
        part = next(f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet"))
        os.replace(os.path.join(tmp, part), os.path.join(stage, f"g{g}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)
    if staged != total:
        shutil.rmtree(stage, ignore_errors=True)
        raise ValueError(
            f"stream staging dropped rows: {table} has {total}, the "
            f"{n_groups} staged groups hold {staged} (NULL {key_col}?)"
        )
    open(marker, "w").close()
    return stage
