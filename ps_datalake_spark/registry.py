"""Query registry: the single source of truth for the declared operator
inventory (SURVEY.md §2).

Each operator is registered once with a Spark DataFrame builder and (when
SQL-expressible) the equivalent DuckDB oracle SQL. ``__spark_entry__.py``
exposes this registry to the driver; the local test harness
(tests/test_oracle.py) replays the same comparison the driver performs.

Conventions (FIXTURES.md "determinism"):
  * every query ends in a total ORDER BY over its output columns;
  * aggregate/computed columns are aliased identically on both sides;
  * ambiguous result types are cast explicitly (BIGINT/DOUBLE) on both sides;
  * doubles that sum many terms are rounded (2dp) on both sides so the
    driver's 6dp canonical rounding can never straddle an ulp.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # None → driver does a rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    """Decorator registering a query builder under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, build=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules on first access so the registry is populated.
    from . import queries as _  # noqa: F401

    return dict(_REGISTRY)
