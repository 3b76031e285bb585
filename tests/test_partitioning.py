"""Bucketed co-located joins (exchange-free) + salted skew joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from ps_datalake_spark.io import load_table
from ps_datalake_spark.operators.partitioning import bucketed_join, salted_join, save_bucketed


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    # managed tables land in the session's spark-warehouse; dropped below
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    save_bucketed(orders, "orders_bkt", "o_custkey", n_buckets=8)
    save_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "customer_bkt", "o_custkey", 8
    )
    # disable auto-broadcast so the join would otherwise need a shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "orders_bkt", "customer_bkt", "o_custkey")
        plan = _physical_plan(j)
        assert "Exchange" not in plan, plan
        # and it's still correct
        expect = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert j.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS customer_bkt")


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = orders.join(customer, "o_custkey")
    salted = salted_join(orders, customer, "o_custkey", salt=4)
    assert salted.count() == plain.count()
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.select(*plain.columns).collect()}
    assert a == b
