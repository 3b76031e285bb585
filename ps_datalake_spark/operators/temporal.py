"""Temporal joins Spark lacks as built-ins: the as-of join.

For each left row, match the most recent right row with right.ts <= left.ts
(per key). Implemented as the union-tag-sort composition — one shuffle+sort
on (key, ts), then last-non-null propagation — NOT a range join: the range
formulation explodes to |left|×|right-per-key| intermediates, while this
stays O(|left|+|right|) through a single window pass, which is what survives
a 100 TB event table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    tolerance_expr: str | None = None,
) -> DataFrame:
    """As-of join: left rows enriched with the latest right row at-or-before
    their timestamp (per `on` key). Right-side values arrive as
    `asof_<col>` (+ `asof_ts`); unmatched lefts keep NULLs.

    tolerance_expr (e.g. "INTERVAL 30 MINUTES") drops matches older than
    left_ts - tolerance, like pandas merge_asof's tolerance.
    """
    from pyspark.sql.window import Window

    lcols = left.columns
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__left"),
        F.lit(None).cast("timestamp_ntz").alias("__r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l.schema["__left"].dataType).alias("__left"),
        F.col(right_ts).cast("timestamp_ntz").alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    u = l.unionByName(r)
    # right rows sort before left rows at equal ts (__is_left ascending), so a
    # right row AT the left timestamp is visible to it ("at or before")
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "__is_left",
        "__left",
        "__ts",
        F.last("__r_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    ).where(F.col("__is_left") == 1)
    if tolerance_expr is not None:
        in_tol = F.col("asof_ts") >= F.col("__ts").cast("timestamp_ntz") - F.expr(
            tolerance_expr
        )
        filled = filled.select(
            "__left",
            F.when(in_tol, F.col("asof_ts")).alias("asof_ts"),
            *[F.when(in_tol, F.col(f"asof_{c}")).alias(f"asof_{c}") for c in right_cols],
        )
    else:
        filled = filled.select("__left", "asof_ts", *[f"asof_{c}" for c in right_cols])
    return filled.select(
        *[F.col("__left").getField(c).alias(c) for c in lcols],
        "asof_ts",
        *[f"asof_{c}" for c in right_cols],
    )
