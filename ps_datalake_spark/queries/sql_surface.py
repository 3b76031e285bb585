"""SQL-text entry point (SURVEY.md §3.4 lifecycle: lake.sql(...) → Catalyst).

These queries register the test tables as temp views and execute raw SQL via
spark.sql — the same string DuckDB runs as the oracle (dialect-neutral SQL,
with rounding done as round(x*10^n)/10^n which is identical in both engines).
Covers CTEs, EXISTS/IN subqueries, correlated scalar subqueries, and
HAVING — SQL shapes not otherwise exercised by the DataFrame surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import register_views
from ..registry import query

_CTE_SQL = """
    WITH cust_rev AS (
      SELECT o_custkey, sum(o_totalprice) AS rev, count(*) AS cnt
      FROM orders GROUP BY o_custkey
    )
    SELECT c_mktsegment,
           count(*) AS n_cust,
           round(avg(rev) * 10000) / 10000 AS avg_rev,
           CAST(sum(cnt) AS BIGINT) AS n_orders
    FROM customer
    JOIN cust_rev ON o_custkey = c_custkey
    WHERE EXISTS (SELECT 1 FROM nation
                  WHERE n_nationkey = c_nationkey AND n_regionkey < 3)
    GROUP BY c_mktsegment
    HAVING count(*) > 10
    ORDER BY c_mktsegment
    """

_CORRELATED_SQL = """
    SELECT o_orderkey,
           round(o_totalprice * 100) / 100 AS price,
           (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items,
           CASE WHEN o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
                THEN 'debtor' ELSE 'ok' END AS cust_standing
    FROM orders
    WHERE o_totalprice > 300000
    ORDER BY o_orderkey
    """


@query(
    "b40_sql_cte",
    oracle=_CTE_SQL,
    tags=("B1", "sql"),
    doc="Raw-SQL entry: CTE + EXISTS subquery + HAVING, identical text on both engines.",
)
def b40_sql_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "customer", "nation"))
    return spark.sql(_CTE_SQL)


@query(
    "b40_sql_correlated",
    oracle=_CORRELATED_SQL,
    tags=("B1", "sql"),
    doc="Raw-SQL entry: correlated scalar subquery + IN subquery.",
)
def b40_sql_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "lineitem", "customer"))
    return spark.sql(_CORRELATED_SQL)


_GROUPING_SETS_SQL = """
    SELECT coalesce(l_returnflag, 'ALL') AS rflag,
           coalesce(l_linestatus, 'ALL') AS lstatus,
           count(*) AS cnt,
           round(sum(l_quantity) * 100) / 100 AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY rflag, lstatus
    """


@query(
    "b40_sql_grouping_sets",
    oracle=_GROUPING_SETS_SQL,
    tags=("B13", "sql"),
    doc="GROUPING SETS — the general form behind rollup/cube — as shared SQL "
    "text executed by both engines (per-combination, per-flag, and grand "
    "totals in one aggregation pass).",
)
def b40_sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


# Identical recursion on both engines except the integer-division operator
# (Spark `DIV`, DuckDB `//`) — substituted below. Keys shift +1 so the walk
# domain is 1..N (p_partkey starts at 0, and 0 DIV 2 = 0 never reaches the
# root). Depth is log2(max key): the working set is rows x log(keyspace),
# which at 100 TB stays a linear number of bounded-width iterations — each
# one a narrow filter+project over the frontier, no shuffle until the final
# bounded aggregate.
_RECURSIVE_SQL = """
    WITH RECURSIVE walk(k, cur, steps, path_sum) AS (
      SELECT p_partkey + 1, p_partkey + 1, 0, CAST(p_partkey + 1 AS BIGINT)
      FROM part
      UNION ALL
      SELECT k, cur {DIV} 2, steps + 1, path_sum + (cur {DIV} 2)
      FROM walk WHERE cur > 1
    )
    SELECT steps AS depth,
           count(*) AS n_parts,
           CAST(sum(path_sum) AS BIGINT) AS sum_path,
           CAST(min(k) AS BIGINT) AS min_key
    FROM walk WHERE cur = 1
    GROUP BY steps ORDER BY steps
    """


@query(
    "b40_sql_recursive",
    oracle=_RECURSIVE_SQL.format(DIV="//"),
    tags=("B1", "sql"),
    doc="Recursive CTE (WITH RECURSIVE, new in Spark 4): every part key "
    "walks its binary-tree ancestor chain (parent = key DIV 2) to the "
    "root, aggregated by walk depth with per-path checksums. The iterative "
    "union is Catalyst's UnionLoop execution — the SQL-native form of the "
    "label-propagation loops b61/b66 hand-roll via localCheckpoint.",
)
def b40_sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("part",))
    return spark.sql(_RECURSIVE_SQL.format(DIV="DIV"))
