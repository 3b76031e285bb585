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
