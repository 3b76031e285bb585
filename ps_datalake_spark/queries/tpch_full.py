"""TPC-H completion pack (round 5): the 11 query shapes not yet in
``tpch_like.py`` — Q2/Q7/Q8/Q9/Q11/Q13/Q15/Q16/Q17/Q20/Q21 — adapted to the
driver fixture (FIXTURES.md).  With these, all 22 TPC-H plan shapes are
registered.

The fixture has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate``/``ps_supplycost`` columns, so the four
partsupp queries (Q2/Q11/Q16/Q20) substitute the observed supplier↔part
relation ``SELECT DISTINCT l_partkey, l_suppkey FROM lineitem`` — same join
topology and correlation structure, sourced from the fact table — and Q21's
"received late" predicate becomes "line returned" (``l_returnflag = 'R'``).
Every substitution is applied identically to the Spark plan and the DuckDB
oracle, so the correctness comparison is exact.

Scale notes (100 TB): each query keeps lineitem as the probe side of
broadcast/shuffle-hash joins via the size-aware ``dim()`` hint; correlated
scalar subqueries are planned as per-key partial aggregates joined back
(never a per-row subquery); bounded final sorts use ``tiny_sort`` (single
coalesced task, no range-sampling second pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ._util import T, dim, dround, tiny_sort


def _ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture's partsupp substitute: observed (partkey, suppkey) pairs."""
    return (
        T(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey"), F.col("l_suppkey"))
        .distinct()
    )


_PS_SQL = "(SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)"

# Exact-decimal revenue term (Q10 pattern, applied throughout this module):
# prices/discounts are 2dp decimals, so the decimal sum is exact and cannot
# straddle a rounding boundary between engines the way an order-dependent
# float sum can.  SQL counterpart: _DEC_REV_SQL.
_DEC_REV_SQL = (
    "sum(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(4,2))))"
)


def _dec_revenue():
    return F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("double")


@query(
    "b55_tpch_q2",
    oracle=f"""
    WITH eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    cand AS (
      SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
      FROM part
      JOIN {_PS_SQL} ps ON p_partkey = ps.l_partkey
      JOIN eu ON ps.l_suppkey = eu.s_suppkey
      WHERE p_size <= 10 AND p_type = 'LARGE'
    )
    SELECT round(s_acctbal * 100) / 100 AS acctbal,
           s_name, n_name, p_partkey, p_name
    FROM cand
    WHERE s_acctbal = (SELECT max(s_acctbal) FROM cand c2
                       WHERE c2.p_partkey = cand.p_partkey)
    ORDER BY acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("B5", "B10", "B14", "tpch"),
    doc="TPC-H Q2 (minimum-cost supplier): correlated max-per-part scalar "
    "subquery planned as a per-part partial aggregate joined back — never a "
    "per-row subquery.  The observed lineitem supplier↔part relation stands "
    "in for the fixture's missing partsupp; best-supplier = max s_acctbal "
    "stands in for min ps_supplycost.",
)
def b55_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = dim(T(spark, sf_dir, "nation"), sf_dir, "nation")
    r = dim(
        T(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE"),
        sf_dir,
        "region",
    )
    eu = (
        T(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = T(spark, sf_dir, "part").where(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    cand = (
        dim(p, sf_dir, "part")
        .join(_ps(spark, sf_dir), F.col("p_partkey") == F.col("l_partkey"))
        .join(dim(eu, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # correlated max per part as a window aggregate: one pass, no self-join
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("mx", F.max("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("mx"))
        .select(
            dround("s_acctbal", 2).alias("acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
        )
        .orderBy(F.col("acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "b55_tpch_q7",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("B5", "B10", "tpch"),
    doc="TPC-H Q7 (volume shipping): two nation roles joined independently to "
    "supplier and customer sides with a symmetric nation-pair disjunction, "
    "revenue by (supp_nation, cust_nation, ship year).",
)
def b55_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = ("NATION_1", "NATION_2")
    # pre-restrict both endpoint dimensions to the two nations BEFORE the
    # fact joins (the pair disjunction only removes the 2 same-nation combos,
    # applied post-join on the two broadcast-attached names)
    n = T(spark, sf_dir, "nation").where(F.col("n_name").isin(*nations))
    s = dim(
        T(spark, sf_dir, "supplier")
        .join(dim(n, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation")),
        sf_dir,
        "supplier",
    )
    c = dim(
        T(spark, sf_dir, "customer")
        .join(dim(n, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation")),
        sf_dir,
        "customer",
    )
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(_dec_revenue().alias("revenue"))
        .transform(tiny_sort, "supp_nation", "cust_nation", "l_year")
    )


@query(
    "b55_tpch_q8",
    oracle="""
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                      AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE) * 10000) / 10000 AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    ) allrows
    GROUP BY o_year ORDER BY o_year
    """,
    tags=("B5", "B10", "tpch"),
    doc="TPC-H Q8 (national market share): 8-relation join with nation in two "
    "roles, conditional-share aggregate of one supplier nation's revenue "
    "within the ASIA customer market by order year.",
)
def b55_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = dim(
        T(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD").select("p_partkey"),
        sf_dir,
        "part",
    )
    # customers restricted to the ASIA market (nation→region reduction)
    n_asia = dim(
        T(spark, sf_dir, "nation")
        .join(
            dim(T(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"), sf_dir, "region"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey"),
        sf_dir,
        "nation",
    )
    c = dim(
        T(spark, sf_dir, "customer")
        .join(n_asia, F.col("c_nationkey") == F.col("n_nationkey"), "semi")
        .select("c_custkey"),
        sf_dir,
        "customer",
    )
    s = dim(
        T(spark, sf_dir, "supplier")
        .join(
            dim(T(spark, sf_dir, "nation").select("n_nationkey", "n_name"), sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation")),
        sf_dir,
        "supplier",
    )
    o = dim(
        T(spark, sf_dir, "orders").where(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        ),
        sf_dir,
        "orders",
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"), "semi")
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            dround(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0)))
                .cast("double")
                / F.sum(vol).cast("double"),
                4,
            ).alias("mkt_share")
        )
        .transform(tiny_sort, "o_year")
    )


@query(
    "b55_tpch_q9",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST({_DEC_REV_SQL} AS DOUBLE) AS profit
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    tags=("B5", "B10", "tpch"),
    doc="TPC-H Q9 (product-type profit): LIKE-filtered part dimension joined "
    "into the full fact path, profit by supplier nation and order year "
    "(revenue stands in for the fixture's missing ps_supplycost term).",
)
def b55_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = dim(
        T(spark, sf_dir, "part").where(F.col("p_name").like("%gear%")).select("p_partkey"),
        sf_dir,
        "part",
    )
    s = dim(
        T(spark, sf_dir, "supplier")
        .join(
            dim(T(spark, sf_dir, "nation").select("n_nationkey", "n_name"), sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation")),
        sf_dir,
        "supplier",
    )
    o = dim(T(spark, sf_dir, "orders"), sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(_dec_revenue().alias("profit"))
        .transform(tiny_sort, F.col("nation"), F.col("o_year").desc())
    )


@query(
    "b55_tpch_q11",
    oracle="""
    WITH eu_ps AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                            JOIN region ON n_regionkey = r_regionkey
                            WHERE r_name = 'EUROPE')
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, CAST(value_dec AS DOUBLE) AS value
    FROM eu_ps
    -- threshold from EXACT decimal sums (an avg over unrounded doubles is
    -- an order-dependent float sum whose last ulps differ between engines)
    WHERE CAST(value_dec AS DOUBLE)
          > (SELECT 1.25 * CAST(sum(value_dec) AS DOUBLE) / count(*) FROM eu_ps)
    ORDER BY value DESC, p_partkey
    """,
    tags=("B7", "B10", "tpch"),
    doc="TPC-H Q11 (important stock): per-part value from one region's "
    "suppliers, kept only where it exceeds a scalar threshold derived from "
    "the SAME aggregate (aggregate-of-aggregate scalar subquery, planned as "
    "a broadcast 1-row cross join).  Lineitem revenue stands in for the "
    "fixture's missing ps_supplycost * ps_availqty.",
)
def b55_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    eu_keys = (
        T(spark, sf_dir, "nation")
        .join(
            dim(T(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE"), sf_dir, "region"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    s_eu = dim(
        T(spark, sf_dir, "supplier")
        .join(dim(eu_keys, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"), "semi")
        .select("s_suppkey"),
        sf_dir,
        "supplier",
    )
    per_part = (
        T(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(s_eu, F.col("l_suppkey") == F.col("s_suppkey"), "semi")
        .groupBy("l_partkey")
        # exact decimal sums (2dp inputs): the per-part values AND the
        # threshold derive from decimal arithmetic cast to double at the end,
        # so both sides of the compare are bit-identical in both engines (an
        # avg over unrounded doubles would be an order-dependent float sum)
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("value_dec"))
    )
    thresh = per_part.agg(
        (F.lit(1.25) * F.sum("value_dec").cast("double") / F.count("*")).alias(
            "threshold"
        )
    )
    return (
        per_part.withColumn("value", F.col("value_dec").cast("double"))
        .crossJoin(F.broadcast(thresh))
        .where(F.col("value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
        .orderBy(F.col("value").desc(), "p_partkey")
    )


@query(
    "b55_tpch_q13",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("B5", "B10", "tpch"),
    doc="TPC-H Q13 (customer distribution): left outer join with an ON-clause "
    "filter (priority stands in for the fixture's missing o_comment pattern), "
    "two-level aggregation into an order-count histogram.",
)
def b55_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").select("c_custkey")
    o = T(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .transform(tiny_sort, F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "b55_tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST({_DEC_REV_SQL} AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("B5", "B10", "tpch"),
    doc="TPC-H Q15 (top supplier): revenue view over one quarter + scalar-max "
    "subquery selecting the top supplier(s).  Revenue is an exact decimal "
    "sum cast to double on both sides, so the max-equality tie-compare is "
    "exact.",
)
def b55_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        T(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_dec_revenue().alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = dim(T(spark, sf_dir, "supplier").select("s_suppkey", "s_name"), sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "b55_tpch_q16",
    oracle=f"""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN {_PS_SQL} ps ON p_partkey = ps.l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                               WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("B7", "B10", "B11", "tpch"),
    doc="TPC-H Q16 (parts/supplier relationship): NOT-IN anti-join against an "
    "excluded-supplier subquery (negative balance stands in for the "
    "fixture's missing complaints comment), count-distinct suppliers per "
    "(brand, type, size).",
)
def b55_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = dim(
        T(spark, sf_dir, "part").where(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        ),
        sf_dir,
        "part",
    )
    bad = dim(
        T(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey"),
        sf_dir,
        "supplier",
    )
    return (
        _ps(spark, sf_dir)
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .transform(
            tiny_sort, F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@query(
    "b55_tpch_q17",
    oracle="""
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / 7.0 * 100) / 100 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_size < 15
      AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    tags=("B5", "B10", "tpch"),
    doc="TPC-H Q17 (small-quantity-order revenue): per-part correlated "
    "average planned as a partial aggregate over lineitem broadcast back "
    "onto the fact scan (p_size stands in for the fixture's missing "
    "p_container).",
)
def b55_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = dim(
        T(spark, sf_dir, "part")
        .where((F.col("p_brand") == "Brand#3") & (F.col("p_size") < 15))
        .select("p_partkey"),
        sf_dir,
        "part",
    )
    # correlated avg: aggregate ONLY the lineitems of qualifying parts (the
    # per-part avg relation is then bounded by |part-filter|, broadcastable)
    li_p = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    avg_q = dim(
        li_p.groupBy(F.col("l_partkey").alias("ap"))
        .agg((F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")),
        sf_dir,
        "part",
    )
    return (
        li_p.join(avg_q, F.col("l_partkey") == F.col("ap"))
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            dround(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.lit(7.0),
                2,
            ).alias("avg_yearly")
        )
    )


@query(
    "b55_tpch_q20",
    oracle="""
    WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    shipped AS (
      SELECT l_suppkey, sum(l_quantity) AS qty
      FROM lineitem JOIN red ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name
    FROM supplier JOIN shipped ON s_suppkey = shipped.l_suppkey
    WHERE qty > (SELECT avg(qty) FROM shipped)
      AND s_nationkey IN (SELECT n_nationkey FROM nation
                          JOIN region ON n_regionkey = r_regionkey
                          WHERE r_name = 'EUROPE')
    ORDER BY s_suppkey
    """,
    tags=("B7", "B10", "tpch"),
    doc="TPC-H Q20 (potential part promotion): nested IN-subqueries — "
    "LIKE-filtered parts feed a per-supplier shipped-quantity aggregate, "
    "thresholded by a scalar subquery over the same aggregate, "
    "intersected with one region's suppliers (semi-join chain).",
)
def b55_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    red = dim(
        T(spark, sf_dir, "part").where(F.col("p_name").like("red%")).select("p_partkey"),
        sf_dir,
        "part",
    )
    shipped = (
        T(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(red, F.col("l_partkey") == F.col("p_partkey"), "semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    thresh = shipped.agg(F.avg("qty").alias("threshold"))
    eu_keys = (
        T(spark, sf_dir, "nation")
        .join(
            dim(T(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE"), sf_dir, "region"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    s = (
        T(spark, sf_dir, "supplier")
        .join(dim(eu_keys, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"), "semi")
        .select("s_suppkey", "s_name")
    )
    return (
        shipped.crossJoin(F.broadcast(thresh))
        .where(F.col("qty") > F.col("threshold"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "b55_tpch_q21",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND n_name IN ('NATION_5', 'NATION_6', 'NATION_7')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("B5", "B7", "B10", "tpch"),
    doc="TPC-H Q21 (suppliers who kept orders waiting): correlated EXISTS + "
    "NOT-EXISTS on the same fact table with a key-inequality conjunct, "
    "planned as a left-semi plus a left-anti join (a returned line stands "
    "in for the fixture's missing receipt-after-commit lateness).",
)
def b55_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = dim(
        T(spark, sf_dir, "nation").where(
            F.col("n_name").isin("NATION_5", "NATION_6", "NATION_7")
        ).select("n_nationkey"),
        sf_dir,
        "nation",
    )
    s = dim(
        T(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"), "semi")
        .select("s_suppkey", "s_name"),
        sf_dir,
        "supplier",
    )
    o = dim(
        T(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select("o_orderkey"),
        sf_dir,
        "orders",
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    l1 = li.where(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").alias("l3")
    return (
        l1.join(s, F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l1.l_orderkey") == F.col("o_orderkey"), "semi")
        .join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
