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
    """Round-10 window invariant: the driver's 50-slot CORRECTNESS window must
    hold (in priority order) anything new/retuned this round, then the OLDEST
    surviving evidence — after r9 refreshed the stale r4/r5-evidence rows, the
    stalest survivors are the remaining round-5-evidence queries, then round-6
    filling the remaining slots; everything r7/r8/r9-verified rotates to the
    back."""
    from ps_datalake_spark.registry import (
        _DRIVER_GREEN_R01,
        _DRIVER_GREEN_R02,
        _DRIVER_GREEN_R03,
        _DRIVER_GREEN_R04,
        _DRIVER_GREEN_R05,
        _DRIVER_GREEN_R06,
        _DRIVER_GREEN_R07,
        _DRIVER_GREEN_R08,
        _DRIVER_GREEN_R09,
        _RETUNED_IN_R10,
    )

    names = list(SPECS)
    window = set(names[:50])
    ever_green = (
        _DRIVER_GREEN_R01
        | _DRIVER_GREEN_R02
        | _DRIVER_GREEN_R03
        | _DRIVER_GREEN_R04
        | _DRIVER_GREEN_R05
        | _DRIVER_GREEN_R06
        | _DRIVER_GREEN_R07
        | _DRIVER_GREEN_R08
        | _DRIVER_GREEN_R09
    )
    # rank 0: queries with no green driver row (never checked, or retuned
    # this round).  Once MORE than 50 rank-0 queries exist, overflow is
    # unavoidable — but then every window slot must hold a rank-0 entry:
    # nothing with existing green evidence may displace an unverified query.
    rank0 = (set(names) - ever_green) | _RETUNED_IN_R10
    if len(rank0) <= 50:
        assert rank0 <= window, (
            f"never-verified queries outside window: {sorted(rank0 - window)}"
        )
    else:
        assert window <= rank0, (
            f"evidence-bearing queries inside an overflowing window: "
            f"{sorted(window - rank0)}"
        )
    assert not (window & (_DRIVER_GREEN_R09 - _RETUNED_IN_R10)), (
        "fresh r9 greens must rotate to the back"
    )
    # queries whose newest evidence is round 4 or older (if any remain) fill
    # the next slots, then round-5 evidence; fresher r6-r9 evidence must
    # never displace them.
    newer_than_r4 = (
        _DRIVER_GREEN_R05
        | _DRIVER_GREEN_R06
        | _DRIVER_GREEN_R07
        | _DRIVER_GREEN_R08
        | _DRIVER_GREEN_R09
    )
    r4_or_older_only = (
        _DRIVER_GREEN_R04
        | _DRIVER_GREEN_R03
        | _DRIVER_GREEN_R02
        | _DRIVER_GREEN_R01
    ) - newer_than_r4
    outside = r4_or_older_only - window
    if outside:
        assert len(rank0) + len(r4_or_older_only) > 50, (
            f"stale r4-or-older evidence outside a non-full window: "
            f"{sorted(outside)}"
        )
    fresher = (
        _DRIVER_GREEN_R06
        | _DRIVER_GREEN_R07
        | _DRIVER_GREEN_R08
        | _DRIVER_GREEN_R09
    ) - _RETUNED_IN_R10
    r5_only = _DRIVER_GREEN_R05 - fresher
    if len(rank0 | r4_or_older_only | r5_only) >= 50:
        assert not (window & fresher), (
            "r6/r7/r8/r9-verified queries occupy slots while stale evidence "
            "waits"
        )


def test_converted_queries_have_oracles():
    """Every query declared converted-in-r5 must actually carry oracle SQL."""
    from ps_datalake_spark.registry import _CONVERTED_IN_R04, _CONVERTED_IN_R05

    for conv in (_CONVERTED_IN_R04, _CONVERTED_IN_R05):
        still_rows_only = {n for n in conv if SPECS[n].oracle is None}
        assert not still_rows_only, f"declared converted but oracle-less: {still_rows_only}"
