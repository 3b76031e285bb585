"""Second function battery: extended string ops (incl. edit distance),
bitwise ops, and array set operations — all oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ._util import T


@query(
    "b21_strings_ext",
    oracle="""
    SELECT p_partkey,
           reverse(p_brand) AS rbrand,
           repeat(left(p_type, 2), 3) AS rep2,
           translate(p_name, 'aeiou', '12345') AS xlat,
           CAST(levenshtein(p_brand, p_type) AS BIGINT) AS edit_dist,
           left(p_name, 5) AS l5,
           right(p_name, 5) AS r5,
           CAST(ascii(p_brand) AS BIGINT) AS first_code,
           chr(65 + (p_size % 26)) AS size_chr,
           printf('%s#%03d', p_brand, p_size) AS fmt
    FROM part ORDER BY p_partkey
    """,
    tags=("B21",),
    doc="Extended strings: reverse/repeat/translate/levenshtein/left/right/"
    "ascii/chr/format_string.",
)
def b21_strings_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.reverse("p_brand").alias("rbrand"),
        F.repeat(F.substring("p_type", 1, 2), 3).alias("rep2"),
        F.translate(F.col("p_name"), "aeiou", "12345").alias("xlat"),
        F.levenshtein("p_brand", "p_type").cast("bigint").alias("edit_dist"),
        F.substring("p_name", 1, 5).alias("l5"),
        F.substring(F.col("p_name"), -5, 5).alias("r5"),
        F.ascii("p_brand").cast("bigint").alias("first_code"),
        F.chr(F.lit(65) + F.pmod(F.col("p_size"), F.lit(26))).alias("size_chr"),
        F.format_string("%s#%03d", F.col("p_brand"), F.col("p_size")).alias("fmt"),
    ).orderBy("p_partkey")


@query(
    "b23_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(xor(l_orderkey, l_partkey) AS BIGINT) AS k_xor,
           CAST(l_orderkey & 255 AS BIGINT) AS k_and,
           CAST(l_orderkey | 1 AS BIGINT) AS k_or,
           CAST(l_linenumber << 4 AS BIGINT) AS k_shl,
           CAST(l_orderkey >> 2 AS BIGINT) AS k_shr,
           CAST(bit_count(l_orderkey) AS BIGINT) AS k_bits
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    tags=("B23",),
    doc="Bitwise ops: xor/and/or/shifts/bit_count (the SimHash primitive set).",
)
def b23_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseXOR(F.col("l_partkey")).cast("bigint").alias("k_xor"),
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("k_and"),
        k.bitwiseOR(F.lit(1)).cast("bigint").alias("k_or"),
        F.shiftleft(F.col("l_linenumber"), 4).cast("bigint").alias("k_shl"),
        F.shiftright(k, 2).cast("bigint").alias("k_shr"),
        F.bit_count(k).cast("bigint").alias("k_bits"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "b25_array_setops",
    oracle="""
    SELECT n_nationkey,
           array_to_string(list_sort(list_intersect([n_nationkey, n_regionkey, 7],
                                    [n_regionkey, 7, 99])), ',') AS both_vals,
           array_to_string(list_sort(list_distinct(list_concat([n_nationkey, n_regionkey],
                                               [n_regionkey, 7]))), ',') AS union_vals,
           coalesce(array_to_string(list_sort(list_filter([n_nationkey, n_regionkey, 7],
                     x -> NOT list_contains([n_regionkey, 7], x))), ','), '') AS only_left,
           CAST(list_position([10, 20, n_nationkey], n_nationkey) AS BIGINT) AS pos,
           array_to_string(flatten([[n_nationkey], [n_regionkey, 7]]), ',') AS flat
    FROM nation ORDER BY n_nationkey
    """,
    tags=("B25",),
    doc="Array set algebra: intersect/union/except, array_position, flatten.",
)
def b25_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = T(spark, sf_dir, "nation")
    a = F.array("n_nationkey", "n_regionkey", F.lit(7))
    b = F.array("n_regionkey", F.lit(7), F.lit(99))
    ab = F.array("n_nationkey", "n_regionkey")
    bb = F.array("n_regionkey", F.lit(7))
    def joined(col: F.Column) -> F.Column:
        # Serialize array results to strings: the driver's pandas canonicalizer
        # cannot sort ndarray-valued cells (round-1 red rows).
        return F.array_join(col.cast("array<string>"), ",")

    return n.select(
        "n_nationkey",
        joined(F.sort_array(F.array_intersect(a, b))).alias("both_vals"),
        joined(F.sort_array(F.array_distinct(F.concat(ab, bb)))).alias("union_vals"),
        joined(F.sort_array(F.array_except(a, bb))).alias("only_left"),
        F.array_position(F.array(F.lit(10), F.lit(20), F.col("n_nationkey")), F.col("n_nationkey"))
        .cast("bigint")
        .alias("pos"),
        joined(
            F.flatten(F.array(F.array("n_nationkey"), F.array("n_regionkey", F.lit(7))))
        ).alias("flat"),
    ).orderBy("n_nationkey")
