"""Every registered query must match its DuckDB oracle (driver emulation)."""

from __future__ import annotations

import pytest

from ps_datalake_spark.registry import all_queries

from .oracle_harness import compare

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_oracle_match(name, spark, sf_dir):
    spec = SPECS[name]
    problems = compare(spec, spark, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_registry_nonempty():
    assert len(SPECS) >= 10


def test_every_query_runs(spark, sf_dir):
    # queries without oracles still must build and return rows>=0
    for name, spec in SPECS.items():
        if spec.oracle is None:
            df = spec.build(spark, sf_dir)
            assert df.count() >= 0, name


def test_no_complex_result_columns(spark, sf_dir):
    """The driver's pandas canonicalizer crashes sorting ndarray/dict cells
    (round-1 red rows b10_collect_agg / b25_array_setops).  Every query must
    serialize array/map/struct results to strings in its final projection."""
    import pyspark.sql.types as Ty

    offenders = {}
    for name, spec in SPECS.items():
        df = spec.build(spark, sf_dir)
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (Ty.ArrayType, Ty.MapType, Ty.StructType))
        ]
        if complex_cols:
            offenders[name] = complex_cols
    assert not offenders, f"complex-typed result columns: {offenders}"


def test_driver_window_covers_unchecked_queries():
    """Round-3 window invariant: the driver's 50-slot CORRECTNESS window must
    hold (in priority order) queries converted to oracle-checked this round +
    brand-new round-3 queries, then the 18 round-2-registered queries the
    driver has never hash-verified, with the leftover slots refilled by the
    OLDEST green evidence (round-1 greens, two-round-old) — never by round-2
    greens or already-recorded rows-only queries."""
    from ps_datalake_spark.registry import (
        _CHECKED_R02_ROWS_ONLY,
        _CONVERTED_IN_R03,
        _DRIVER_GREEN_R02,
        _NEW_IN_R02,
    )

    names = list(SPECS)
    window = set(names[:50])
    assert _CONVERTED_IN_R03 <= window, "converted queries need a fresh driver row"
    assert _NEW_IN_R02 <= window, "never-hash-verified r2 queries must be in the window"
    assert not (window & _DRIVER_GREEN_R02), "fresh r2 greens must rotate to the back"
    assert not (window & _CHECKED_R02_ROWS_ONLY), "recorded rows-only rotate to the back"
