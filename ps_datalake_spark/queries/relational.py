"""Relational operator surface: SURVEY.md §2B B1–B24.

Every query is declarative DataFrame API — Catalyst handles pushdown, pruning,
join strategy (AQE), and codegen. Small dimension joins are explicitly
broadcast. Each query carries the equivalent DuckDB oracle SQL with types and
rounding aligned per the conventions in ``ps_datalake_spark.registry``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import query
from ._util import T, dround, scratch_dir, tiny_sort


# ---------------------------------------------------------------------------
# B1 — sources: parquet scan, csv + json round-trips
# ---------------------------------------------------------------------------

@query(
    "b01_scan_parquet",
    oracle="SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    tags=("B1",),
    doc="Full parquet scan of the region table.",
)
def b01_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T(spark, sf_dir, "region").select("r_regionkey", "r_name").orderBy("r_regionkey")


@query(
    "b01_scan_csv_roundtrip",
    oracle="""
    SELECT count(*) AS cnt,
           CAST(sum(c_custkey) AS BIGINT) AS sum_key,
           round(sum(round(c_acctbal, 2)), 2) AS sum_bal,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_seg
    FROM customer
    """,
    tags=("B1",),
    doc="Write customer as CSV, read it back with an explicit schema, aggregate.",
)
def b01_scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = scratch_dir("csv_roundtrip")
    cust = T(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        dround("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    )
    cust.write.mode("overwrite").option("header", True).csv(path)
    schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    )
    back = spark.read.schema(schema).option("header", True).csv(path)
    return back.agg(
        F.count("*").alias("cnt"),
        F.sum("c_custkey").alias("sum_key"),
        dround(F.sum("c_acctbal"), 2).alias("sum_bal"),
        F.countDistinct("c_mktsegment").alias("n_seg"),
    )


@query(
    "b01_scan_json_roundtrip",
    oracle="""
    SELECT count(*) AS cnt,
           CAST(sum(user_id) AS BIGINT) AS sum_user,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events
    """,
    tags=("B1",),
    doc="Write events (sans timestamp) as JSON lines, read back, aggregate.",
)
def b01_scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = scratch_dir("json_roundtrip")
    ev = T(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "props")
    ev.write.mode("overwrite").json(path)
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("props", StringType()),
        ]
    )
    back = spark.read.schema(schema).json(path)
    return back.agg(
        F.count("*").alias("cnt"),
        F.sum("user_id").alias("sum_user"),
        F.countDistinct("event_type").alias("n_types"),
    )


# ---------------------------------------------------------------------------
# B2 — partitioned parquet sink
# ---------------------------------------------------------------------------

@query(
    "b02_sink_parquet_partitioned",
    oracle="""
    SELECT substr(sha256(text), 1, 2) AS hash_prefix,
           count(*) AS cnt,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY 1 ORDER BY 1
    """,
    tags=("B2",),
    doc="Hash-partitioned parquet sink (the lake's chunk layout), read back and re-aggregated.",
)
def b02_sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = scratch_dir("partitioned_sink")
    docs = T(spark, sf_dir, "documents").select(
        F.sha2(F.col("text").cast("binary"), 256).alias("hash"),
        "doc_id",
        "n_chars",
    )
    docs = docs.withColumn("hash_prefix", F.substring("hash", 1, 2))
    docs.write.mode("overwrite").partitionBy("hash_prefix").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.groupBy("hash_prefix")
        .agg(F.count("*").alias("cnt"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("hash_prefix")
    )


@query(
    "b01_orc_roundtrip",
    oracle="""
    SELECT count(*) AS cnt,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
           CAST(count(DISTINCT n_regionkey) AS BIGINT) AS n_regions
    FROM nation
    """,
    tags=("B1",),
    doc="ORC source/sink roundtrip: nation written as ORC, read back, "
    "re-aggregated — third columnar format beside parquet and csv/json.",
)
def b01_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = scratch_dir("orc_roundtrip")
    T(spark, sf_dir, "nation").write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.agg(
        F.count("*").alias("cnt"),
        F.sum("n_nationkey").cast("bigint").alias("key_sum"),
        F.countDistinct("n_regionkey").cast("bigint").alias("n_regions"),
    )


def _bucketed_join_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer with BOTH sides bucketed on the join key (8 buckets):
    the bucketed scans already satisfy the join's distribution, so the plan
    has no shuffle exchange feeding the sort-merge join (asserted in
    tests/test_plans.py). This is the canonical 100 TB co-located-join
    layout — pay the shuffle once at write time, never again per query."""
    from ._util import scratch_dir as _sd

    wh = _sd("bucketed_warehouse")
    for tbl, src, key in (
        ("b48_orders", "orders", "o_custkey"),
        ("b48_customer", "customer", "c_custkey"),
    ):
        df = T(spark, sf_dir, src)
        (
            df.write.mode("overwrite")
            .format("parquet")
            .option("path", f"{wh}/{tbl}")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(tbl)
        )
    o = spark.table("b48_orders").select("o_custkey", "o_totalprice")
    c = spark.table("b48_customer").select("c_custkey", "c_mktsegment")
    return o.join(c, o.o_custkey == c.c_custkey)


@query(
    "b48_bucketed_join",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("B2", "B5"),
    doc="Shuffle-free co-located join over bucketed tables: orders and "
    "customer both written bucketBy(8, custkey) + sortBy, joined without an "
    "exchange on either side (plan-asserted), then aggregated per segment.",
)
def b48_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    joined = _bucketed_join_tables(spark, sf_dir)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            dround(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "b48_salted_skew_join",
    oracle="""
    WITH ev AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE user_id END AS k, value
      FROM events
    ),
    dim AS (SELECT DISTINCT k, k % 10 AS cohort FROM ev)
    SELECT cohort,
           count(*) AS cnt,
           round(sum(ev.value), 2) AS sum_val
    FROM ev JOIN dim USING (k)
    GROUP BY cohort ORDER BY cohort
    """,
    tags=("B5", "skew"),
    doc="Salted join under synthetic skew: half of all events are remapped "
    "to one pathological user, then joined to a dimension through "
    "operators/partitioning.salted_join — the hot key spreads over 8 "
    "(key, salt) subkeys so no single shuffle partition becomes the "
    "straggler; the dimension replicates 8x (explode) to meet every salt. "
    "Salting affects only partitioning, so the plain-join oracle matches "
    "exactly.",
)
def b48_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import salted_join

    ev = T(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 2 == 0, F.lit(1))
        .otherwise(F.col("user_id"))
        .alias("k"),
        "value",
    )
    dim = ev.select("k").distinct().withColumn("cohort", F.col("k") % 10)
    joined = salted_join(ev, dim, on="k", salt=8)
    return (
        joined.groupBy("cohort")
        .agg(F.count("*").alias("cnt"), dround(F.sum("value"), 2).alias("sum_val"))
        .orderBy("cohort")
    )


@query(
    "b50_clustered_skip",
    oracle="""
    SELECT event_type,
           count(*) AS cnt,
           round(sum(value), 2) AS sum_val
    FROM events
    WHERE ts::TIMESTAMP >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts::TIMESTAMP <  TIMESTAMP '2024-01-12 00:00:00'
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("B2", "B4", "skip"),
    doc="Clustered write + data skipping: events are range-partitioned and "
    "sorted by ts into parquet (the layout a 100 TB event lake clusters on "
    "its query key), then a 2-day slice is aggregated from the clustered "
    "copy. Because each file covers a narrow ts range, the pushed-down range "
    "predicate (plan-asserted) lets the scan skip all non-overlapping "
    "files/row-groups via parquet min/max stats — the same rows come back "
    "as from the unclustered oracle scan, proving the rewrite is "
    "organization-only.",
)
def b50_clustered_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = scratch_dir("clustered_events")
    ev = T(spark, sf_dir, "events").select("ts", "event_type", "value")
    (
        ev.repartitionByRange(8, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(path)
    )
    clustered = spark.read.parquet(path)
    lo = F.lit("2024-01-10 00:00:00").cast("timestamp_ntz")
    hi = F.lit("2024-01-12 00:00:00").cast("timestamp_ntz")
    return (
        clustered.where((F.col("ts") >= lo) & (F.col("ts") < hi))
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"), dround(F.sum("value"), 2).alias("sum_val"))
        .orderBy("event_type")
    )


@query(
    "b52_zorder_skip",
    oracle="""
    SELECT event_type,
           count(*) AS cnt,
           CAST(sum(user_id) AS BIGINT) AS user_sum
    FROM events
    WHERE user_id BETWEEN 100 AND 140
      AND ts::TIMESTAMP >= TIMESTAMP '2024-01-08 00:00:00'
      AND ts::TIMESTAMP <  TIMESTAMP '2024-01-15 00:00:00'
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("B2", "B4", "skip"),
    doc="Z-order (Morton) clustering + 2-D data skipping: events are "
    "range-partitioned and sorted on the bit-interleave of (user_id, "
    "ts-minute), then a query selective on BOTH dimensions reads the "
    "clustered copy. Unlike 1-D sorting (b50), the Morton layout keeps "
    "min/max file stats tight on the two dimensions simultaneously, so the "
    "pushed-down conjunction (plan-asserted) prunes on user AND time. "
    "Clustering is organization-only — the plain-scan oracle matches "
    "exactly.",
)
def b52_zorder_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import zorder2

    path = scratch_dir("zorder_events")
    ev = T(spark, sf_dir, "events").select("ts", "event_type", "user_id")
    z = zorder2(
        F.col("user_id").bitwiseAND(F.lit(0xFFFF)),
        (F.unix_timestamp(F.col("ts").cast("timestamp")) / 60).cast("long").bitwiseAND(
            F.lit(0xFFFF)
        ),
    )
    (
        ev.withColumn("_z", z)
        .repartitionByRange(8, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    clustered = spark.read.parquet(path)
    lo = F.lit("2024-01-08 00:00:00").cast("timestamp_ntz")
    hi = F.lit("2024-01-15 00:00:00").cast("timestamp_ntz")
    return (
        clustered.where(
            F.col("user_id").between(100, 140) & (F.col("ts") >= lo) & (F.col("ts") < hi)
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"), F.sum("user_id").cast("bigint").alias("user_sum"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# B3 / B4 — projection + filters
# ---------------------------------------------------------------------------

@query(
    "b03_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 2) AS revenue,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charge,
           CAST(l_quantity AS BIGINT) AS qty_int,
           l_returnflag || '/' || l_linestatus AS flag_status
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("B3",),
)
def b03_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue"),
        dround(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 2
        ).alias("charge"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.concat(F.col("l_returnflag"), F.lit("/"), F.col("l_linestatus")).alias("flag_status"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "b04_filter_battery",
    oracle="""
    SELECT count(*) AS cnt,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_rev
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND l_linestatus LIKE 'F%'
      AND (l_discount IS NOT DISTINCT FROM 0.05 OR l_tax > 0.06)
      AND l_shipdate IS NOT NULL
    """,
    tags=("B4",),
    doc="BETWEEN, IN, LIKE, null-safe equality, boolean algebra, null check.",
)
def b04_filter_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    cond = (
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_linestatus").like("F%")
        & (F.col("l_discount").eqNullSafe(0.05) | (F.col("l_tax") > 0.06))
        & F.col("l_shipdate").isNotNull()
    )
    return li.where(cond).agg(
        F.count("*").alias("cnt"),
        dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_rev"),
    )


# ---------------------------------------------------------------------------
# B5 / B6 — joins
# ---------------------------------------------------------------------------

@query(
    "b05_join_inner_4way",
    oracle="""
    SELECT r_name, n_name,
           count(*) AS order_cnt,
           round(sum(o_totalprice), 2) AS total_spend
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
    tags=("B5",),
    doc="4-way inner equi-join over the star schema; dims broadcast.",
)
def b05_join_inner_4way(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = F.broadcast(T(spark, sf_dir, "nation"))
    r = F.broadcast(T(spark, sf_dir, "region"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("order_cnt"),
            dround(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
        .transform(tiny_sort, "r_name", "n_name")  # ≤ |nation| = 25 groups
    )


@query(
    "b05_join_left",
    oracle="""
    SELECT c_custkey,
           count(o_orderkey) AS order_cnt,
           round(coalesce(sum(o_totalprice), 0.0), 2) AS spend
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
    tags=("B5",),
)
def b05_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            dround(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("spend"),
        )
        .orderBy("c_custkey")
    )


@query(
    "b05_join_full",
    oracle="""
    SELECT count(*) AS cnt,
           CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cust,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_order
    FROM (SELECT * FROM customer WHERE c_acctbal > 0) c
    FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 50000) o
      ON o.o_custkey = c.c_custkey
    """,
    tags=("B5",),
    doc="Full outer join with nulls manufactured on both sides.",
)
def b05_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0)
    o = T(spark, sf_dir, "orders").where(F.col("o_totalprice") > 50000)
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.agg(
        F.count("*").alias("cnt"),
        F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).cast("bigint").alias("null_cust"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).cast("bigint").alias("null_order"),
    )


@query(
    "b06_broadcast_join",
    oracle="""
    SELECT n_name,
           count(*) AS cust_cnt,
           round(avg(c_acctbal), 4) AS avg_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
    tags=("B6",),
    doc="Explicit broadcast hint on the nation dim (25 rows).",
)
def b06_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    n = F.broadcast(T(spark, sf_dir, "nation"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("cust_cnt"), dround(F.avg("c_acctbal"), 4).alias("avg_bal"))
        .orderBy("n_name")
    )


@query(
    "b07_semi_join",
    oracle="""
    SELECT count(*) AS cnt, CAST(sum(c_custkey) AS BIGINT) AS sum_key
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
    tags=("B7",),
)
def b07_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count("*").alias("cnt"), F.sum("c_custkey").alias("sum_key")
    )


@query(
    "b07_anti_join",
    oracle="""
    SELECT count(*) AS cnt, CAST(coalesce(sum(c_custkey), 0) AS BIGINT) AS sum_key
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("B7",),
)
def b07_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count("*").alias("cnt"),
        F.coalesce(F.sum("c_custkey"), F.lit(0)).cast("bigint").alias("sum_key"),
    )


@query(
    "b08_range_join",
    oracle="""
    SELECT count(*) AS pair_cnt,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS users
    FROM (SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events) a
    JOIN (SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events) b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 2 MINUTE
    """,
    tags=("B8",),
    doc="Range self-join aggregate: event pairs per user within a 2-minute "
    "window. Because only per-left-row counts are needed, the join is "
    "rewritten as a RANGE-frame window over (user_id, ts-micros): one scan, "
    "one shuffle, no join at all — ~13x faster than the equi-key theta-join "
    "at sf0.1 and shuffle-bounded at any scale. The general pair-producing "
    "range join (bin-bucketed, skew-capped) is b08_range_join_pairs.",
)
def b08_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = T(spark, sf_dir, "events").select(
        "user_id",
        # exact epoch micros; NTZ interpreted as UTC so the value is
        # session-timezone- and DST-independent
        F.expr("unix_micros(to_utc_timestamp(ts, 'UTC'))").alias("us"),
    )
    # count events of the same user in (ts, ts + 2 min]: integer micros make
    # the strict lower bound exact (1 FOLLOWING)
    w = Window.partitionBy("user_id").orderBy("us").rangeBetween(1, 120_000_000)
    return (
        ev.withColumn("cnt", F.count("*").over(w))
        .agg(
            F.sum("cnt").alias("pair_cnt"),
            F.count_distinct(F.when(F.col("cnt") > 0, F.col("user_id"))).alias("users"),
        )
    )


@query(
    "b08_range_join_pairs",
    oracle="""
    SELECT a.user_id AS user_id, a.event_id AS id_a, b.event_id AS id_b
    FROM (SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events) a
    JOIN (SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events) b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 2 MINUTE
    ORDER BY a.user_id, id_a, id_b
    """,
    tags=("B8",),
    doc="Pair-producing range self-join, bin-bucketed: each left row is "
    "exploded to its 120 s bin and the next (any pair within 2 min lands in "
    "exactly one of the two), so the join key is (user_id, bin) and per-key "
    "comparisons are bounded by events-per-2-minutes instead of "
    "events-per-user — capping skew for hot users at 100 TB. The exact range "
    "predicate filters post-join; no cartesian/nested-loop node (asserted in "
    "tests/test_plans.py).",
)
def b08_range_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        # 2-minute bins on exact microseconds, UTC-interpreted (DST-free)
        F.expr("unix_micros(to_utc_timestamp(ts, 'UTC')) div 120000000").alias("bin"),
    )
    # b.ts in (a.ts, a.ts + 2 min] implies bin(b) in {bin(a), bin(a)+1};
    # the two exploded bins are distinct, so each qualifying pair matches once.
    a = ev.select(
        F.col("user_id"),
        F.col("event_id"),
        F.col("ts"),
        F.explode(F.array(F.col("bin"), F.col("bin") + 1)).alias("bin"),
    ).alias("a")
    b = ev.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.bin") == F.col("b.bin"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 2 MINUTES")),
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_id").alias("id_a"),
            F.col("b.event_id").alias("id_b"),
        )
        .orderBy("user_id", "id_a", "id_b")
    )


@query(
    "b09_cross_join",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name
    """,
    tags=("B9",),
)
def b09_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = T(spark, sf_dir, "region").select("r_name")
    n = T(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n).orderBy("r_name", "n_name")


# ---------------------------------------------------------------------------
# B10–B13 — aggregation
# ---------------------------------------------------------------------------

@query(
    "b10_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("B10", "flagship"),
    doc="TPC-H Q1 pricing summary — the flagship hash-aggregation query.",
)
def b10_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dround(F.sum("l_quantity"), 2).alias("sum_qty"),
            dround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            dround(F.sum(disc_price), 2).alias("sum_disc_price"),
            dround(F.sum(charge), 2).alias("sum_charge"),
            dround(F.avg("l_quantity"), 4).alias("avg_qty"),
            dround(F.avg("l_extendedprice"), 4).alias("avg_price"),
            dround(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .transform(tiny_sort, "l_returnflag", "l_linestatus")  # ≤ 6 groups
    )


@query(
    "b10_agg_minmax",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS cnt,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("B10",),
)
def b10_agg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("cnt"),
            dround(F.min("o_totalprice"), 2).alias("min_price"),
            dround(F.max("o_totalprice"), 2).alias("max_price"),
            dround(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "b10_stats_agg",
    oracle="""
    SELECT round(stddev_samp(o_totalprice), 4) AS sd_price,
           round(var_samp(o_totalprice), 2) AS var_price,
           round(corr(o_totalprice, o_custkey), 6) AS corr_pc,
           round(median(o_totalprice), 4) AS med_price
    FROM orders
    """,
    tags=("B10",),
    doc="Statistical aggregates: stddev/variance/corr/median.",
)
def b10_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.agg(
        dround(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
        dround(F.var_samp("o_totalprice"), 2).alias("var_price"),
        dround(F.corr("o_totalprice", "o_custkey"), 6).alias("corr_pc"),
        dround(F.median("o_totalprice"), 4).alias("med_price"),
    )


@query(
    "b11_distinct",
    oracle="SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    tags=("B11",),
)
def b11_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T(spark, sf_dir, "customer").select("c_mktsegment").distinct().orderBy("c_mktsegment")


@query(
    "b11_count_distinct",
    oracle="""
    SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prio,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_status
    FROM orders
    """,
    tags=("B11",),
)
def b11_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
        F.countDistinct("o_orderstatus").alias("n_status"),
    )


@query(
    "b12_approx_count_distinct",
    oracle="""
    SELECT true AS within_tol,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_cnt
    FROM events
    """,
    tags=("B12",),
    doc="approx_count_distinct checked against the exact count within 5% rel. "
    "error (tolerance check folded into the result so it hash-matches).",
)
def b12_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    agg = ev.agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_cnt"),
        F.countDistinct("user_id").alias("exact_cnt"),
    )
    return agg.select(
        (
            F.abs(F.col("approx_cnt") - F.col("exact_cnt")) / F.col("exact_cnt") <= 0.05
        ).alias("within_tol"),
        "exact_cnt",
    )


@query(
    "b13_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
           count(*) AS cnt,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("B13",),
)
def b13_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ROLLUP applied to the BASE AGGREGATE, not the fact table: rollup()
    # directly on lineitem Expands the INPUT (one replica per grouping set)
    # before the partial aggregate — 180M generated rows at the 100x probe
    # (measured 4.5x DuckDB).  Aggregating the detail level first (6 groups
    # by schema) and rolling THAT up is algebraically exact for sum/count
    # (l_quantity sums are integer-valued doubles — associativity loses
    # nothing): one pass over the fact table, then native rollup semantics
    # (grouping_id, NULL fill, empty-input grand total) over six rows.
    # A/B at 100x: 0.64 s vs 0.79 s for the hand-unioned re-aggregation and
    # ~1.1 s for the native full-input rollup.  The same partial-reaggregate
    # shape is what a 100 TB rollup needs — Expand's input multiplication is
    # the known scale bottleneck.
    li = T(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt_p"), F.sum("l_quantity").alias("qty_p")
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.coalesce(F.sum("cnt_p"), F.lit(0)).alias("cnt"),
            dround(F.sum("qty_p"), 2).alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "cnt", "sum_qty")
        .transform(
            tiny_sort,  # ≤ 6 + 3 + 1 rows across the three grouping levels
            "gid",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "b13_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
           count(*) AS cnt
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("B13",),
)
def b13_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.grouping_id().cast("bigint").alias("gid"), F.count("*").alias("cnt"))
        .select("l_returnflag", "l_linestatus", "gid", "cnt")
        .orderBy(
            "gid",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# B14–B16 — window functions
# ---------------------------------------------------------------------------

@query(
    "b14_rank_windows",
    oracle="""
    SELECT o_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER w AS BIGINT) AS tile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_orderkey
    """,
    tags=("B14",),
)
def b14_rank_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("tile"),
    ).orderBy("o_orderkey")


@query(
    "b15_lag_lead",
    oracle="""
    SELECT event_id,
           round(lag(value) OVER w, 6) AS prev_val,
           round(lead(value) OVER w, 6) AS next_val,
           round(first_value(value) OVER w2, 6) AS first_val,
           round(last_value(value) OVER w2, 6) AS last_val
    FROM (SELECT event_id, user_id, ts::TIMESTAMP AS ts, value FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
           w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY event_id
    """,
    tags=("B15",),
)
def b15_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        dround(F.lag("value").over(w), 6).alias("prev_val"),
        dround(F.lead("value").over(w), 6).alias("next_val"),
        dround(F.first("value").over(w2), 6).alias("first_val"),
        dround(F.last("value").over(w2), 6).alias("last_val"),
    ).orderBy("event_id")


@query(
    "b16_window_frames",
    oracle="""
    SELECT o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3,
           count(*) OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice
                 RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS near_cnt
    FROM orders
    """,
    tags=("B16",),
    doc="Aggregate windows with ROWS and RANGE frames: running sum, moving "
    "avg, range count. Data-proportional output: final sort omitted on both "
    "sides (sorted-multiset comparison — see b37_token_stats).",
)
def b16_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = T(spark, sf_dir, "orders")
    w_rows = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_mov = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    w_range = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        dround(F.sum("o_totalprice").over(w_rows), 2).alias("running_spend"),
        dround(F.avg("o_totalprice").over(w_mov), 4).alias("moving_avg3"),
        F.count("*").over(w_range).alias("near_cnt"),
    )


# ---------------------------------------------------------------------------
# B17–B20 — sort, limit/top-k, set ops
# ---------------------------------------------------------------------------

@query(
    "b17_sort_nulls",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderpriority, '1-URGENT') AS prio,
           round(o_totalprice, 2) AS price
    FROM orders
    ORDER BY prio ASC NULLS FIRST, price DESC NULLS LAST, o_orderkey
    """,
    tags=("B17",),
    doc="Multi-key sort with explicit NULLS FIRST / NULLS LAST.",
)
def b17_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio"),
        dround("o_totalprice", 2).alias("price"),
    ).orderBy(
        F.col("prio").asc_nulls_first(), F.col("price").desc_nulls_last(), F.col("o_orderkey")
    )


@query(
    "b18_topk",
    oracle="""
    SELECT c_custkey, round(sum(o_totalprice), 2) AS revenue
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
    tags=("B18",),
    doc="Global top-k: Spark plans TakeOrderedAndProject (no full sort).",
)
def b18_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Aggregate BELOW the join: revenue-per-custkey only needs orders;
    # customer (c_custkey is its primary key, so join-then-sum ≡ sum-then-
    # join) merely filters to existing customers.  Joining first shuffles the
    # full fact table (15M rows at the 100x probe, measured 10x DuckDB);
    # aggregating first shuffles 1.5M partially-combined groups and the join
    # reuses that hash partitioning for one side.  The orderBy+limit still
    # plans TakeOrderedAndProject (asserted in tests/test_plans.py) — no
    # global sort at any scale.
    c = T(spark, sf_dir, "customer").select("c_custkey")
    rev = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(dround(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    # Size-gated join strategy: customer is ~the same cardinality as the
    # aggregated revenue side, so past a few MB a broadcast would collect
    # millions of keys to the driver per run (measured at the 100x probe:
    # shuffle-hash 1.04 s vs broadcast 1.52 s vs unhinted 1.74 s); under the
    # gate the broadcast is the usual free small-dim win.
    from ._util import table_bytes

    cust_bytes = table_bytes(sf_dir, "customer")
    if cust_bytes is not None and cust_bytes < 8 << 20:
        c = F.broadcast(c)
    else:
        # Past the gate, ALSO pre-partition orders by the group key before
        # the aggregate: each custkey's ~10 orders scatter across every scan
        # partition, so the default partial aggregate reduces only ~1.3x
        # while paying for a multi-million-entry hash map per task — after
        # an explicit hash repartition the keys are co-located and the agg
        # reduces fully in one pass.  A/B at the probes: 1000x 11.2 s ->
        # 7.7 s, 100x/10x parity (the narrow-row shuffle costs what the
        # partial-agg shuffle did).  The adaptive top-k pushdown (top-N of
        # rev + pushed-down IN verification against customer) was ALSO
        # measured and REJECTED: the agg dominates at every scale, so
        # removing the customer exchange saved less than the extra probe
        # jobs cost (PLANS.md round-6 section).
        rev = (
            T(spark, sf_dir, "orders")
            .select("o_custkey", "o_totalprice")
            .repartition(F.col("o_custkey"))
            .groupBy("o_custkey")
            .agg(dround(F.sum("o_totalprice"), 2).alias("revenue"))
        )
        c = c.hint("shuffle_hash")
    return (
        c.join(rev, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )


@query(
    "b18_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_orderpriority, o_orderkey,
             CAST(row_number() OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
             round(o_totalprice, 2) AS price
      FROM orders)
    WHERE rn <= 3
    ORDER BY o_orderpriority, rn
    """,
    tags=("B18",),
)
def b18_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            F.row_number().over(w).cast("bigint").alias("rn"),
            dround("o_totalprice", 2).alias("price"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("o_orderpriority", "rn")
    )


@query(
    "b19_union",
    oracle="""
    SELECT count(*) AS cnt,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100000
    )
    """,
    tags=("B19",),
    doc="union (ALL semantics) of two order slices — overlap intentionally "
    "double-counted. The price total sums as DECIMAL(18,2) (exact, "
    "order-independent — the b56 discipline): at the 10x sweep the "
    "double-sum of 1.5M prices straddled a 2dp rounding boundary between "
    "engines.",
)
def b19_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey", "o_totalprice")
    b = o.where(F.col("o_totalprice") > 100000).select("o_totalprice", "o_orderkey")
    u = a.unionByName(b)  # column-name resolution, not positional
    return u.agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


@query(
    "b20_setops",
    oracle="""
    SELECT
      (SELECT count(*) FROM (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
                             INTERSECT
                             SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')) AS i_cnt,
      (SELECT count(*) FROM (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
                             INTERSECT ALL
                             SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')) AS ia_cnt,
      (SELECT count(*) FROM (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
                             EXCEPT
                             SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')) AS e_cnt,
      (SELECT count(*) FROM (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
                             EXCEPT ALL
                             SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')) AS ea_cnt
    """,
    tags=("B20",),
)
def b20_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    # All four set ops stay distributed; the four scalar aggregates are
    # combined with 1-row cross joins (no driver-side collect).
    i_cnt = f.intersect(op).agg(F.count("*").alias("i_cnt"))
    ia_cnt = f.intersectAll(op).agg(F.count("*").alias("ia_cnt"))
    e_cnt = f.subtract(op).agg(F.count("*").alias("e_cnt"))
    ea_cnt = f.exceptAll(op).agg(F.count("*").alias("ea_cnt"))
    return i_cnt.crossJoin(ia_cnt).crossJoin(e_cnt).crossJoin(ea_cnt)


# ---------------------------------------------------------------------------
# B21–B24 — scalar function batteries
# ---------------------------------------------------------------------------

@query(
    "b21_strings",
    oracle="""
    SELECT p_partkey,
           p_brand || '#' || p_type AS brand_type,
           substr(p_name, 1, 10) AS name10,
           lower(p_name) AS lname,
           upper(p_brand) AS ubrand,
           trim(p_name) AS tname,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS psize4,
           split_part(p_name, ' ', 1) AS first_word,
           regexp_extract(p_name, '[a-z]+') AS first_alpha,
           regexp_replace(p_type, '[aeiou]', '', 'g') AS novowel,
           CAST(length(p_name) AS BIGINT) AS name_len,
           CAST(instr(p_name, 'a') AS BIGINT) AS a_pos
    FROM part ORDER BY p_partkey
    """,
    tags=("B21",),
)
def b21_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.substring("p_name", 1, 10).alias("name10"),
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.trim("p_name").alias("tname"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("psize4"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.regexp_extract(F.col("p_name"), "[a-z]+", 0).alias("first_alpha"),
        F.regexp_replace(F.col("p_type"), "[aeiou]", "").alias("novowel"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.instr(F.col("p_name"), "a").cast("bigint").alias("a_pos"),
    ).orderBy("p_partkey")


@query(
    "b22_dates",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(day(o_orderdate) AS BIGINT) AS dom,
           o_orderdate::DATE + 30 AS plus30,
           CAST(datediff('day', DATE '1995-01-01', o_orderdate::DATE) AS BIGINT) AS days_since,
           date_trunc('month', o_orderdate)::TIMESTAMP AS month_start,
           o_orderdate::DATE AS odate,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders ORDER BY o_orderkey
    """,
    tags=("B22",),
)
def b22_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("yr"),
        F.month(d).cast("bigint").alias("mo"),
        F.dayofmonth(d).cast("bigint").alias("dom"),
        F.date_add(d.cast("date"), 30).alias("plus30"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).cast("bigint").alias(
            "days_since"
        ),
        F.date_trunc("month", d).cast("timestamp_ntz").alias("month_start"),
        d.cast("date").alias("odate"),
        F.unix_timestamp(d.cast("timestamp")).alias("epoch_s"),
    ).orderBy("o_orderkey")


@query(
    "b23_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price1,
           CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
           CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct,
           round(abs(l_tax - 0.04), 6) AS tax_dev,
           round(sqrt(l_quantity), 6) AS sqrt_qty,
           round(exp(l_discount), 6) AS exp_disc,
           round(ln(l_quantity + 1), 6) AS log_qty,
           round(pow(l_quantity, 2), 2) AS qty_sq,
           CAST(((l_orderkey % 7) + 7) % 7 AS BIGINT) AS key_mod,
           to_hex(l_orderkey) AS key_hex
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    tags=("B23",),
)
def b23_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround("l_extendedprice", 1).alias("price1"),
        F.floor(F.col("l_discount") * 100).cast("bigint").alias("disc_pct"),
        F.ceil(F.col("l_tax") * 100).cast("bigint").alias("tax_pct"),
        dround(F.abs(F.col("l_tax") - 0.04), 6).alias("tax_dev"),
        dround(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        dround(F.exp("l_discount"), 6).alias("exp_disc"),
        dround(F.log(F.col("l_quantity") + 1), 6).alias("log_qty"),
        dround(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("bigint").alias("key_mod"),
        F.conv(F.col("l_orderkey").cast("string"), 10, 16).alias("key_hex"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "b24_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
           round(greatest(o_totalprice, 150000.0), 2) AS at_least,
           round(least(o_totalprice, 150000.0), 2) AS at_most
    FROM orders ORDER BY o_orderkey
    """,
    tags=("B24",),
)
def b24_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        dround(F.greatest(F.col("o_totalprice"), F.lit(150000.0)), 2).alias("at_least"),
        dround(F.least(F.col("o_totalprice"), F.lit(150000.0)), 2).alias("at_most"),
    ).orderBy("o_orderkey")


@query(
    "b48_skew_report",
    oracle="""
    WITH keyed AS (
      SELECT 'events.user_id' AS rel, CAST(user_id AS VARCHAR) AS k FROM events
      UNION ALL
      SELECT 'orders.o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
      UNION ALL
      SELECT 'lineitem.l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
    ),
    per_key AS (
      SELECT rel, k, count(*) AS c FROM keyed GROUP BY rel, k
    ),
    ranked AS (
      SELECT rel, c,
             row_number() OVER (PARTITION BY rel ORDER BY c, k) AS rn,
             count(*) OVER (PARTITION BY rel) AS ndv,
             sum(c) OVER (PARTITION BY rel) AS n
      FROM per_key
    )
    SELECT rel,
           CAST(max(n) AS BIGINT) AS n_rows,
           CAST(max(ndv) AS BIGINT) AS ndv,
           round(CAST(max(c) AS DOUBLE) / max(n) * 1000000) / 1000000
             AS top_share,
           round(CAST(max(CASE WHEN rn = (99 * ndv + 99) // 100 THEN c END)
                      AS DOUBLE) / (CAST(max(n) AS DOUBLE) / max(ndv))
                 * 10000) / 10000 AS p99_over_mean
    FROM ranked
    GROUP BY rel ORDER BY rel
    """,
    tags=("B48", "partitioning"),
    doc="Join-key skew diagnosis (the analysis a pipeline runs BEFORE "
    "choosing salting / AQE skew thresholds at 100 TB): for each "
    "candidate shuffle key, one pass computes row count, exact NDV, the "
    "hottest key's row share, and the nearest-rank p99 per-key count "
    "over the mean — the two numbers that decide whether a key needs "
    "salting (b48_salted_skew_join) or survives a plain hash shuffle. "
    "Per-key counts aggregate with map-side partials; the percentile is "
    "the b57 integer nearest-rank (no float interpolation).",
)
def b48_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    keyed = (
        T(spark, sf_dir, "events")
        .select(F.lit("events.user_id").alias("rel"), F.col("user_id").cast("string").alias("k"))
        .unionByName(
            T(spark, sf_dir, "orders").select(
                F.lit("orders.o_custkey").alias("rel"),
                F.col("o_custkey").cast("string").alias("k"),
            )
        )
        .unionByName(
            T(spark, sf_dir, "lineitem").select(
                F.lit("lineitem.l_suppkey").alias("rel"),
                F.col("l_suppkey").cast("string").alias("k"),
            )
        )
    )
    per_key = keyed.groupBy("rel", "k").agg(F.count("*").alias("c"))
    wr = Window.partitionBy("rel").orderBy("c", "k")
    wp = Window.partitionBy("rel")
    ranked = per_key.select(
        "rel",
        "c",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wp).alias("ndv"),
        F.sum("c").over(wp).alias("n"),
    )
    p99_c = F.max(F.when(F.col("rn") == F.expr("(99 * ndv + 99) div 100"), F.col("c")))
    out = ranked.groupBy("rel").agg(
        F.max("n").cast("bigint").alias("n_rows"),
        F.max("ndv").cast("bigint").alias("ndv"),
        dround(F.max("c").cast("double") / F.max("n"), 6).alias("top_share"),
        dround(
            p99_c.cast("double") / (F.max("n").cast("double") / F.max("ndv")), 4
        ).alias("p99_over_mean"),
    )
    return tiny_sort(out, "rel")
