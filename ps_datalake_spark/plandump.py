"""Builder-job plan capture (r12 verdict #4).

Checkpointed pipelines commit only a ``Scan ExistingRDD`` stub as their
final plan, so the plan evidence for the jobs that do the real work — the
pre-``localCheckpoint``/persist builder stages — was previously
uncapturable.  Call :func:`dump_plan` immediately before each checkpoint/
materialization barrier; ``tools/dump_builder_plans.py`` sets
``$PSDL_PLAN_DUMP`` and collects the files.  Cost when the env var is
unset: one ``os.environ`` lookup.

Lives outside the ``queries`` package so operators and the lake can import
it at module level without a circular import (``queries/__init__`` imports
every query module, and query modules import operators).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def dump_plan(df: DataFrame, name: str) -> None:
    """Write ``explain('formatted')`` of a builder-job DataFrame to
    ``$PSDL_PLAN_DUMP/<name>.txt`` when that env var is set (no-op
    otherwise)."""
    out = os.environ.get("PSDL_PLAN_DUMP")
    if not out:
        return
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, f"{name}.txt"), "w") as f:
        f.write(buf.getvalue())
