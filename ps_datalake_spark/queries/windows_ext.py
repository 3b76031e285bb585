"""Window-function and generator extensions: percent_rank/cume_dist/nth_value,
trigonometric battery, outer explode with nulls."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ._util import T, dround


@query(
    "b14_rank_ext",
    oracle="""
    SELECT o_orderkey,
           round(percent_rank() OVER w, 6) AS prank,
           round(cume_dist() OVER w, 6) AS cdist,
           round(nth_value(o_totalprice, 2) OVER w2, 2) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
           w2 AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_orderkey
    """,
    tags=("B14",),
    doc="percent_rank / cume_dist / nth_value analytic windows.",
)
def b14_rank_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        dround(F.percent_rank().over(w), 6).alias("prank"),
        dround(F.cume_dist().over(w), 6).alias("cdist"),
        dround(F.nth_value("o_totalprice", 2).over(w2), 2).alias("second_price"),
    ).orderBy("o_orderkey")


@query(
    "b23_trig",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sin(l_discount), 6) AS s,
           round(cos(l_tax), 6) AS c,
           round(tan(l_discount), 6) AS t,
           round(atan2(l_discount, l_tax + 0.01), 6) AS at2,
           round(degrees(l_discount), 6) AS deg,
           round(radians(l_quantity), 6) AS rad,
           round(sign(l_discount - 0.05), 1) AS sgn,
           round(cbrt(l_quantity), 6) AS cb
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    tags=("B23",),
    doc="Trigonometric + sign/cbrt math battery.",
)
def b23_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(F.sin("l_discount"), 6).alias("s"),
        dround(F.cos("l_tax"), 6).alias("c"),
        dround(F.tan("l_discount"), 6).alias("t"),
        dround(F.atan2(F.col("l_discount"), F.col("l_tax") + 0.01), 6).alias("at2"),
        dround(F.degrees("l_discount"), 6).alias("deg"),
        dround(F.radians("l_quantity"), 6).alias("rad"),
        dround(F.signum(F.col("l_discount") - 0.05), 1).alias("sgn"),
        dround(F.cbrt("l_quantity"), 6).alias("cb"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "b25_explode_outer",
    oracle="""
    SELECT n_nationkey, u AS val
    FROM (SELECT n_nationkey,
                 CASE WHEN n_nationkey % 5 = 0 THEN NULL
                      ELSE [n_nationkey, n_regionkey] END AS arr
          FROM nation) t
    LEFT JOIN LATERAL (SELECT unnest(arr) AS u) s ON true
    ORDER BY n_nationkey, val NULLS FIRST
    """,
    tags=("B25",),
    doc="explode_outer: null/empty arrays keep their row (NULL value).",
)
def b25_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = T(spark, sf_dir, "nation")
    arr = F.when(
        F.pmod(F.col("n_nationkey"), F.lit(5)) == 0, F.lit(None).cast("array<int>")
    ).otherwise(F.array("n_nationkey", "n_regionkey"))
    return (
        n.select("n_nationkey", arr.alias("arr"))
        .select("n_nationkey", F.explode_outer("arr").alias("val"))
        .orderBy("n_nationkey", F.col("val").asc_nulls_first())
    )
