"""Partitioning strategies for 100 TB-scale joins: bucketed co-located joins
(no exchange at read time) and salted joins for skewed keys.

These are the two levers the brief calls out beyond AQE's automatics:
bucketing pre-pays the shuffle once at write time and every subsequent join
on the bucket key is exchange-free; salting spreads one hot key over
`salt` subkeys when even AQE's skew splitting can't help (e.g. a single
pathological key inside one partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def save_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (+optionally sorted) managed table.

    Joins/aggregations on `bucket_col` between tables bucketed the same way
    plan without an Exchange — the shuffle was paid once, at write time.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed saved tables (exchange-free on the bucket key)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over `salt` subkeys.

    The big side gets a deterministic salt from a row hash; the small side is
    replicated `salt` times (explode) so every (key, salt) pair still meets
    its match. Output columns equal a plain `big.join(small, on, how)`.

    Use when one key's row count dwarfs the rest so a single shuffle
    partition becomes the straggler; costs `salt`× replication of the small
    side, so keep the small side small (dimension-sized).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt_col = "__salt"
    big_s = big.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    small_s = small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<bigint>"))
    )
    out = big_s.join(small_s, [on, salt_col], how)
    return out.drop(salt_col)


def zorder2(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two non-negative int columns — the
    multi-dimensional clustering key a 100 TB lake sorts on so parquet
    min/max stats prune on BOTH dimensions at once (1-D sorting only skips
    on its own column). Pure JVM bitwise expressions (2*bits shift/or terms,
    whole-stage-codegen friendly); callers mask inputs to `bits` bits."""
    acc = F.lit(0).cast("long")
    for i in range(bits):
        acc = acc.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(x, i).bitwiseAND(F.lit(1)).cast("long"), 2 * i)
        )
        acc = acc.bitwiseOR(
            F.shiftleft(
                F.shiftrightunsigned(y, i).bitwiseAND(F.lit(1)).cast("long"), 2 * i + 1
            )
        )
    return acc
