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


# SQL-defined functions (new in Spark 4): a scalar SQL UDF and a SQL table
# function, both declared in SQL text and INLINED by Catalyst into the query
# plan — unlike Python UDFs there is no serialization boundary and no
# interpreted evaluation, so they cost the same as writing the expression
# inline (the plan shows no BatchEvalPython).  The DuckDB oracle is the
# hand-inlined equivalent.
_SQL_UDF_ORACLE = """
    SELECT CASE WHEN p > 300000 THEN 'high'
                WHEN p > 100000 THEN 'mid'
                ELSE 'low' END AS band,
           count(*) AS n_orders,
           CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM (SELECT o_totalprice AS p FROM orders WHERE o_totalprice > 100000)
    GROUP BY band
    ORDER BY band
    """


@query(
    "b40_sql_udf",
    oracle=_SQL_UDF_ORACLE,
    tags=("B28", "sql"),
    doc="SQL-defined functions (Spark 4): a scalar SQL UDF (CREATE FUNCTION "
    "... RETURN <expr>) banding prices and a SQL table function (RETURNS "
    "TABLE) filtering orders, composed in one query. Catalyst inlines both "
    "into the plan — zero serialization boundary, zero interpreted rows, "
    "unlike Python UDFs. Oracle is the hand-inlined ANSI equivalent.",
)
def b40_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE) RETURNS STRING "
        "RETURN CASE WHEN p > 300000 THEN 'high' "
        "WHEN p > 100000 THEN 'mid' ELSE 'low' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION orders_above(t DOUBLE) "
        "RETURNS TABLE(p DOUBLE) "
        "RETURN SELECT o_totalprice FROM orders WHERE o_totalprice > t"
    )
    return spark.sql(
        """
        SELECT price_band(p) AS band,
               count(*) AS n_orders,
               CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders_above(100000)
        GROUP BY band
        ORDER BY band
        """
    )


# Parameterized SQL (named parameter markers, new in Spark 3.4/4): the SQL
# text carries :name placeholders bound at execution — the injection-safe
# form of templated queries.  The oracle inlines the same literals.
_PARAMS_SQL_SPARK = """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_totalprice > :thr AND o_orderstatus = :status
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """

_PARAMS_THR = 250000
_PARAMS_STATUS = "O"

_PARAMS_SQL_ORACLE = f"""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_totalprice > {_PARAMS_THR} AND o_orderstatus = '{_PARAMS_STATUS}'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """


@query(
    "b40_sql_params",
    oracle=_PARAMS_SQL_ORACLE,
    tags=("B1", "sql"),
    doc="Parameterized SQL: named :parameter markers bound via "
    "spark.sql(text, args=...) — the injection-safe templated-query "
    "surface; Catalyst folds the bound literals so the plan is identical "
    "to the inlined form the DuckDB oracle runs.",
)
def b40_sql_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        _PARAMS_SQL_SPARK, args={"thr": _PARAMS_THR, "status": _PARAMS_STATUS}
    )


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


# Shared text both engines (Spark 4 and DuckDB both speak LATERAL): the
# per-customer correlated derived table computes an aggregate the outer query
# re-aggregates by segment.  Catalyst decorrelates this into an equi-join +
# aggregate — no per-row re-execution — which is why it scales; the decimal
# cast keeps the segment sums associative/exact.
_LATERAL_SQL = """
    SELECT c.c_mktsegment,
           count(*) AS n_cust,
           CAST(sum(t.n_orders) AS BIGINT) AS n_orders,
           CAST(sum(t.max_price_dec) AS DOUBLE) AS sum_max_price
    FROM customer c, LATERAL (
      SELECT count(*) AS n_orders,
             CAST(coalesce(max(o_totalprice), 0.0) AS DECIMAL(18,2)) AS max_price_dec
      FROM orders o WHERE o.o_custkey = c.c_custkey
    ) t
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """


@query(
    "b40_sql_lateral",
    oracle=_LATERAL_SQL,
    tags=("B5", "sql"),
    doc="LATERAL correlated derived table (Spark 4 SQL), identical text on "
    "both engines: a per-customer aggregate subquery the outer query "
    "re-aggregates by market segment. Catalyst decorrelates to a "
    "join+aggregate, so the correlated form costs one shuffle, not one "
    "subquery execution per outer row.",
)
def b40_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_LATERAL_SQL)


# Spark 4 pipe-syntax form; the oracle is the equivalent ANSI text (DuckDB
# has no |> dialect).  Aggregates use the exact DECIMAL(18,2) sum discipline.
_PIPE_SQL_SPARK = """
    FROM orders
    |> WHERE o_totalprice > 50000
    |> EXTEND year(o_orderdate) AS yr
    |> AGGREGATE count(*) AS n_orders,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
       GROUP BY o_orderpriority, yr
    |> ORDER BY o_orderpriority, yr
    """

_PIPE_SQL_ORACLE = """
    SELECT o_orderpriority,
           year(o_orderdate) AS yr,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_totalprice > 50000
    GROUP BY o_orderpriority, yr
    ORDER BY o_orderpriority, yr
    """


@query(
    "b40_sql_pipe",
    oracle=_PIPE_SQL_ORACLE,
    tags=("B1", "sql"),
    doc="SQL pipe syntax (|> operators, new in Spark 4): linear "
    "WHERE -> EXTEND -> AGGREGATE -> ORDER BY dataflow compiled to the "
    "same Catalyst plan as the ANSI equivalent the DuckDB oracle runs.",
)
def b40_sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_PIPE_SQL_SPARK)


# Shared text both engines: GROUP BY ALL infers the grouping key set from the
# non-aggregate select items; ORDER BY ALL totals the output ordering.
_GROUP_BY_ALL_SQL = """
    SELECT o_orderstatus,
           o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    """


@query(
    "b40_sql_groupby_all",
    oracle=_GROUP_BY_ALL_SQL,
    tags=("B10", "sql"),
    doc="GROUP BY ALL / ORDER BY ALL (grouping keys and total ordering "
    "inferred from the projection), identical text on both engines.",
)
def b40_sql_groupby_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_GROUP_BY_ALL_SQL)


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


_VARIABLES_SQL = """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_totalprice > {cutoff}
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """

# Exact cross-engine threshold: max() is exact on DOUBLE and * 0.5 is a
# binary-exact scale, so both engines compute the IDENTICAL cutoff — an
# avg()-derived cutoff could differ in the last ulp between engines and
# flip boundary rows (the repo-wide no-float-boundary rule).
_CUTOFF_SQL = "(SELECT max(o_totalprice) * 0.5 FROM orders)"


@query(
    "b40_sql_variables",
    oracle=_VARIABLES_SQL.format(cutoff=_CUTOFF_SQL),
    tags=("B1", "sql"),
    doc="Session variables (DECLARE VARIABLE / SET VAR, new in Spark 4): "
    "the cutoff scalar is computed once into a session variable and "
    "referenced by name in the query; the oracle inlines the identical "
    "scalar subquery. Exact max()*0.5 threshold — no float boundary.",
)
def b40_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    spark.sql("DECLARE OR REPLACE VARIABLE price_cutoff DOUBLE")
    spark.sql(f"SET VAR price_cutoff = {_CUTOFF_SQL}")
    return spark.sql(_VARIABLES_SQL.format(cutoff="price_cutoff"))


_COLLATION_SPARK_SQL = """
    WITH mixed AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type)
                  ELSE lower(p_type) END AS typ,
             p_retailprice
      FROM part
    )
    SELECT lower(collate(typ, 'UTF8_LCASE')) AS type_ci,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT collate(typ, 'UTF8_BINARY')) AS BIGINT)
             AS n_casings,
           CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM mixed
    GROUP BY collate(typ, 'UTF8_LCASE')
    ORDER BY type_ci
    """

_COLLATION_ORACLE_SQL = """
    WITH mixed AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type)
                  ELSE lower(p_type) END AS typ,
             p_retailprice
      FROM part
    )
    SELECT lower(typ) AS type_ci,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT typ) AS BIGINT) AS n_casings,
           CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM mixed
    GROUP BY lower(typ)
    ORDER BY type_ci
    """


@query(
    "b40_sql_collation",
    oracle=_COLLATION_ORACLE_SQL,
    tags=("B21", "sql"),
    doc="String collations (new in Spark 4): grouping under UTF8_LCASE "
    "merges casings WITHOUT rewriting values (the group key keeps its "
    "collation; the projection lower()s it only to pin a deterministic "
    "representative), while a nested UTF8_BINARY distinct counts the "
    "casings each group absorbed. Oracle expresses the same semantics "
    "via lower()-normalization, which UTF8_LCASE coincides with on this "
    "ASCII fixture (collation is the scalable form: comparison-level, "
    "no value rewrite, locale-correct beyond ASCII).",
)
def b40_sql_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("part",))
    return spark.sql(_COLLATION_SPARK_SQL)


@query(
    "b79_observe_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_large,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price,
           CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS max_price
    FROM orders WHERE o_orderdate >= DATE '1995-01-01'
    """,
    tags=("B1", "sql"),
    doc="Pipeline observability via the Observation API (df.observe): the "
    "metrics accumulate ON the pass the pipeline already runs — zero extra "
    "scans, zero shuffles, collected driver-side from task-completion "
    "events, the mechanism a 100 TB ingest uses for row-count/quality "
    "telemetry without a second aggregation job. The observed pipeline "
    "here is a filtered scan driven by a noop write; the oracle computes "
    "the identical metrics as a plain aggregate.",
)
def b79_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from ..io import load_table

    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("date")
    )
    obs = Observation("ingest_metrics")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("o_totalprice") > 100000, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_large"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total_price_dec"),
        F.max(F.col("o_totalprice").cast("decimal(18,2)")).alias("max_price_dec"),
    )
    # the action IS the pipeline's own write — metrics ride along for free
    observed.write.mode("overwrite").format("noop").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["n_large"]),
                float(m["total_price_dec"]),
                float(m["max_price_dec"]),
            )
        ],
        "n_rows bigint, n_large bigint, total_price double, max_price double",
    )
