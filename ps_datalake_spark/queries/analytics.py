"""Classic analytics workloads over the events/orders tables: histograms,
funnel analysis, cohort retention. All oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ._util import T, dround


@query(
    "b45_histogram",
    oracle="""
    SELECT CAST(least(floor(o_totalprice / 50000), 9) AS BIGINT) AS bin,
           count(*) AS cnt,
           round(min(o_totalprice), 2) AS bin_min,
           round(max(o_totalprice), 2) AS bin_max
    FROM orders
    GROUP BY 1 ORDER BY 1
    """,
    tags=("B45",),
    doc="Fixed-width histogram (50k bins, top-coded at bin 9).",
)
def b45_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    bin_ = F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9)).cast("bigint")
    return (
        o.groupBy(bin_.alias("bin"))
        .agg(
            F.count("*").alias("cnt"),
            dround(F.min("o_totalprice"), 2).alias("bin_min"),
            dround(F.max("o_totalprice"), 2).alias("bin_max"),
        )
        .orderBy("bin")
    )


@query(
    "b45_funnel",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts::TIMESTAMP END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts::TIMESTAMP END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts::TIMESTAMP END) AS t_buy
      FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_view,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                THEN 1 ELSE 0 END) AS BIGINT) AS step_click,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_buy > t_click
                THEN 1 ELSE 0 END) AS BIGINT) AS step_buy
    FROM firsts
    """,
    tags=("B45",),
    doc="Ordered funnel: users whose first view precedes first click precedes "
    "first purchase (conditional aggregation, one pass).",
)
def b45_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("step_view"),
        F.sum(
            F.when(F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("step_click"),
        F.sum(
            F.when(
                F.col("t_view").isNotNull()
                & (F.col("t_click") > F.col("t_view"))
                & (F.col("t_buy") > F.col("t_click")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("step_buy"),
    )


@query(
    "b45_cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts::TIMESTAMP))::DATE AS cohort
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts::TIMESTAMP)::DATE AS wk
      FROM events
    )
    SELECT cohort,
           CAST(datediff('week', cohort, wk) AS BIGINT) AS week_n,
           CAST(count(*) AS BIGINT) AS active_users
    FROM first_seen JOIN activity USING (user_id)
    GROUP BY cohort, week_n
    ORDER BY cohort, week_n
    """,
    tags=("B45",),
    doc="Cohort retention: users grouped by first-seen week × weeks since.",
)
def b45_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    j = first_seen.join(activity, "user_id")
    week_n = (F.datediff(F.col("wk"), F.col("cohort")) / 7).cast("bigint")
    return (
        j.groupBy("cohort", week_n.alias("week_n"))
        .agg(F.count("*").cast("bigint").alias("active_users"))
        .orderBy("cohort", "week_n")
    )
