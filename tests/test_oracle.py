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
    """Round-11 window invariant: the driver's 50-slot CORRECTNESS window
    must hold (in priority order) anything new/retuned this round, then the
    queries whose freshest green driver evidence is OLDEST (after r10
    refreshed the r5/r6-evidence rows, the stalest survivors are the
    r7-last-green rows); freshest evidence rotates to the back.

    Stated as one invariant instead of per-round set algebra: no query
    OUTSIDE the window may have staler evidence than any non-rank-0 query
    INSIDE it."""
    import ps_datalake_spark.registry as reg

    names = list(SPECS)
    window = set(names[:50])
    green_rounds = {
        r: getattr(reg, f"_DRIVER_GREEN_R{r:02d}") for r in range(1, 11)
    }
    ever_green = frozenset().union(*green_rounds.values())

    def last_green(n: str) -> int:
        return max((r for r, s in green_rounds.items() if n in s), default=0)

    # rank 0: queries with no green driver row (never checked, or retuned
    # this round).  Once MORE than 50 rank-0 queries exist, overflow is
    # unavoidable — but then every window slot must hold a rank-0 entry:
    # nothing with existing green evidence may displace an unverified query.
    rank0 = (set(names) - ever_green) | reg._RETUNED_IN_R11
    if len(rank0) <= 50:
        assert rank0 <= window, (
            f"never-verified queries outside window: {sorted(rank0 - window)}"
        )
    else:
        assert window <= rank0, (
            f"evidence-bearing queries inside an overflowing window: "
            f"{sorted(window - rank0)}"
        )
    assert not (window & (green_rounds[10] - reg._RETUNED_IN_R11)), (
        "fresh r10 greens must rotate to the back"
    )
    # Oldest-evidence priority, the general form: every non-rank-0 window
    # occupant must carry evidence no fresher than every query left outside.
    inside_evidence = [last_green(n) for n in window - rank0]
    outside_evidence = [last_green(n) for n in set(names) - window]
    if inside_evidence and outside_evidence:
        assert max(inside_evidence) <= min(outside_evidence), (
            "a fresher-evidence query occupies a window slot while staler "
            "evidence waits outside"
        )


def test_converted_queries_have_oracles():
    """Every query declared converted-in-r5 must actually carry oracle SQL."""
    from ps_datalake_spark.registry import _CONVERTED_IN_R04, _CONVERTED_IN_R05

    for conv in (_CONVERTED_IN_R04, _CONVERTED_IN_R05):
        still_rows_only = {n for n in conv if SPECS[n].oracle is None}
        assert not still_rows_only, f"declared converted but oracle-less: {still_rows_only}"
