"""Extended relational surface beyond the core B-list: pivot, array-collecting
aggregates, approximate percentiles, extended date functions, try_* error
handling. Same oracle conventions as relational.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ._util import T, dround


@query(
    "b13_pivot",
    oracle="""
    SELECT l_returnflag,
           round(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0), 2) AS qty_F,
           round(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0), 2) AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("B13",),
    doc="Pivot (wide aggregation): quantity by returnflag × linestatus.",
)
def b13_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
    )
    return p.select(
        "l_returnflag",
        dround(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_F"),
        dround(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_O"),
    ).orderBy("l_returnflag")


@query(
    "b10_collect_agg",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations,
           CAST(len(list(n_name)) AS BIGINT) AS n_rows
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    tags=("B10",),
    doc="Array-collecting aggregates: sorted collect_set + collect_list size. "
    "The array result is serialized with array_join so the driver's pandas "
    "canonicalizer (which cannot sort ndarray cells) compares plain strings.",
)
def b10_collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = T(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations"),
            F.size(F.collect_list("n_name")).cast("bigint").alias("n_rows"),
        )
        .orderBy("n_regionkey")
    )


@query(
    "b12_approx_percentile",
    oracle="""
    SELECT true AS within_tol,
           round(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE), 0)
             AS exact_p50_rounded
    FROM orders
    """,
    tags=("B12",),
    doc="approx_percentile checked within 2% of the exact median (tolerance "
    "folded into the result like b12_approx_count_distinct). The exact value "
    "is emitted rounded to whole units so both engines agree.",
)
def b12_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    agg = o.agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_p50"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_p50"),
    )
    return agg.select(
        (F.abs(F.col("approx_p50") - F.col("exact_p50")) / F.col("exact_p50") <= 0.02).alias(
            "within_tol"
        ),
        dround(F.col("exact_p50"), 0).alias("exact_p50_rounded"),
    )


@query(
    "b22_dates_ext",
    oracle="""
    SELECT o_orderkey,
           (o_orderdate::DATE + INTERVAL 2 MONTH)::DATE AS plus2mo,
           last_day(o_orderdate::DATE) AS month_end,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
           date_trunc('week', o_orderdate::DATE)::DATE AS week_start
    FROM orders ORDER BY o_orderkey
    """,
    tags=("B22",),
    doc="Extended date functions: add_months, last_day, quarter, weekofyear, "
    "ISO weekday, week truncation.",
)
def b22_dates_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    # Spark dayofweek: 1=Sunday..7=Saturday; ISO dow: 1=Monday..7=Sunday
    iso_dow = F.when(F.dayofweek(d) == 1, 7).otherwise(F.dayofweek(d) - 1)
    return o.select(
        "o_orderkey",
        F.add_months(d, 2).alias("plus2mo"),
        F.last_day(d).alias("month_end"),
        F.quarter(d).cast("bigint").alias("qtr"),
        F.weekofyear(d).cast("bigint").alias("woy"),
        iso_dow.cast("bigint").alias("iso_dow"),
        F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("week_start"),
    ).orderBy("o_orderkey")


@query(
    "b24_try_funcs",
    oracle="""
    SELECT o_orderkey,
           try_cast(o_orderpriority AS INTEGER) AS prio_int,
           try_cast(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit,
           CASE WHEN o_custkey % 10 = 0 THEN NULL
                ELSE round(o_totalprice / (o_custkey % 10), 2) END AS per_unit
    FROM orders ORDER BY o_orderkey
    """,
    tags=("B24",),
    doc="try_cast / try_divide error-safe evaluation (NULL on failure, "
    "matching DuckDB's try_cast and guarded division).",
)
def b24_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr("try_cast(o_orderpriority AS INT)").alias("prio_int"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").alias("prio_digit"),
        dround(F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 10), 2).alias(
            "per_unit"
        ),
    ).orderBy("o_orderkey")


@query(
    "b49_merge_upsert",
    oracle="""
    WITH updates AS (
      -- price bump on every 4th order + 100 brand-new synthetic orders.
      -- DECIMAL arithmetic throughout: double round(x*1.1, 2) can straddle a
      -- x.xx5 representation boundary between engines (ADVICE r2; same
      -- failure class TPC-H Q10 hit) — exact decimals cannot.
      SELECT o_orderkey,
             round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)), 2)
               AS o_totalprice,
             'updated' AS src
      FROM orders WHERE o_orderkey % 4 = 0
      UNION ALL
      SELECT 900000000 + i, CAST(100 + i AS DECIMAL(18,2)), 'inserted'
      FROM generate_series(1, 100) t(i)
    ),
    merged AS (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(22,2)) AS o_totalprice, src
      FROM updates
      UNION ALL
      SELECT o.o_orderkey, CAST(o.o_totalprice AS DECIMAL(22,2)), 'kept'
      FROM orders o ANTI JOIN updates u ON o.o_orderkey = u.o_orderkey
    )
    SELECT src,
           count(*) AS n_rows,
           CAST(sum(o_totalprice) AS DOUBLE) AS total
    FROM merged GROUP BY src ORDER BY src
    """,
    tags=("B49", "lake"),
    doc="MERGE/upsert as a composition: updates win via anti-join on the key, "
    "inserts append, untouched rows pass through — the copy-on-write merge "
    "shape. At 100 TB the anti-join prunes to partitions containing touched "
    "keys (same hash_prefix layout as the chunk store) so the rewrite is "
    "proportional to the delta, not the table.",
)
def b49_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # exact decimal arithmetic on both sides (see oracle comment)
    bumped = orders.where(F.col("o_orderkey") % 4 == 0).select(
        "o_orderkey",
        F.round(
            F.col("o_totalprice").cast("decimal(18,2)")
            * F.lit("1.1").cast("decimal(2,1)"),
            2,
        )
        .cast("decimal(22,2)")
        .alias("o_totalprice"),
        F.lit("updated").alias("src"),
    )
    inserts = (
        orders.sparkSession.range(1, 101)
        .select(
            (F.col("id") + 900000000).alias("o_orderkey"),
            (F.col("id") + 100).cast("decimal(22,2)").alias("o_totalprice"),
            F.lit("inserted").alias("src"),
        )
    )
    updates = bumped.unionByName(inserts)
    kept = (
        orders.join(updates.select("o_orderkey"), "o_orderkey", "left_anti")
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(22,2)").alias("o_totalprice"),
            F.lit("kept").alias("src"),
        )
    )
    merged = updates.unionByName(kept)
    return (
        merged.groupBy("src")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("o_totalprice").cast("double").alias("total"),
        )
        .orderBy("src")
    )


@query(
    "b54_fuzzy_name_match",
    oracle="""
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 8
    ORDER BY id_a, id_b
    """,
    tags=("B21", "B5", "llm"),
    doc="Fuzzy name matching: edit-distance near-duplicate pairs over the "
    "part catalog, BLOCKED by (brand, size) so the pair space is a keyed "
    "equi-join per block — never an all-pairs cartesian (the standard "
    "blocking discipline for fuzzy dedup at scale; levenshtein is O(m*n) "
    "per pair, so bounding the candidate set is what makes 100 TB "
    "feasible). Spark's levenshtein and DuckDB's implement the same "
    "unweighted DP, so distances hash-match exactly.",
)
def b54_fuzzy_name_match(spark, sf_dir):
    from pyspark.sql import functions as F

    from ._util import T

    p = T(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size", "p_name")
    a = p.alias("a")
    b = p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .where(dist <= 8)
        .select(
            F.col("a.p_partkey").alias("id_a"),
            F.col("b.p_partkey").alias("id_b"),
            dist.cast("bigint").alias("edit_dist"),
        )
        .orderBy("id_a", "id_b")
    )


@query(
    "b80_jsonl_gz_ingest",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM documents WHERE text IS NOT NULL
    GROUP BY lang ORDER BY lang
    """,
    tags=("B1", "llm"),
    doc="Gzipped-JSONL corpus ingest — the format LLM training corpora "
    "actually arrive in (C4/Pile-style doc-per-line shards): documents "
    "written as 8 .json.gz shards, read back with an explicit schema, "
    "aggregated per language. SCALE NOTE carried in the plan, not just "
    "prose: gzip is NOT splittable — Spark assigns one task per .gz file "
    "regardless of size, so corpus parallelism = shard count; the writer "
    "side repartition(8) IS the sharding decision, exactly how a 100 TB "
    "delivery must arrive as many-GB-not-one-TB shards. Explicit read "
    "schema skips the inference pass (one full decompress scan saved).",
)
def b80_jsonl_gz_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._util import scratch_dir

    path = scratch_dir("jsonl_gz_ingest")
    docs = T(spark, sf_dir, "documents").where(F.col("text").isNotNull()).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    # repartition = shard-count decision: each .gz file is one read task
    docs.repartition(8).write.mode("overwrite").option("compression", "gzip").json(path)
    back = spark.read.schema(
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).json(path)
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
        .orderBy("lang")
    )
