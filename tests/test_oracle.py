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
    """Window invariant: the driver's 50-slot CORRECTNESS window must hold
    (in priority order) anything new/retuned this round, then the queries
    whose freshest green driver evidence is OLDEST; freshest evidence
    rotates to the back.

    Test and registry share ONE ordering — registry.evidence_rank, built
    from registry.GREEN_ROUNDS — so a tie-rank boundary can never split
    differently here than in all_queries() (r11 advisor item 4)."""
    import ps_datalake_spark.registry as reg

    names = list(SPECS)
    window = set(names[:50])
    ever_green = frozenset().union(*reg.GREEN_ROUNDS.values())
    latest_round = max(reg.GREEN_ROUNDS)

    # rank 0: queries with no green driver row (never checked, or retuned
    # this round).  Once MORE than 50 rank-0 queries exist, overflow is
    # unavoidable — but then every window slot must hold a rank-0 entry:
    # nothing with existing green evidence may displace an unverified query.
    rank0 = {n for n in names if reg.evidence_rank(n) == 0}
    assert (set(names) - ever_green) | reg.RETUNED_CURRENT == rank0
    if len(rank0) <= 50:
        assert rank0 <= window, (
            f"never-verified queries outside window: {sorted(rank0 - window)}"
        )
    else:
        assert window <= rank0, (
            f"evidence-bearing queries inside an overflowing window: "
            f"{sorted(window - rank0)}"
        )
    assert not (window & (reg.GREEN_ROUNDS[latest_round] - reg.RETUNED_CURRENT)), (
        f"fresh r{latest_round} greens must rotate to the back"
    )
    # Oldest-evidence priority, the general form: every non-rank-0 window
    # occupant must carry rank no fresher than every query left outside.
    inside_evidence = [reg.evidence_rank(n) for n in window - rank0]
    outside_evidence = [reg.evidence_rank(n) for n in set(names) - window]
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
