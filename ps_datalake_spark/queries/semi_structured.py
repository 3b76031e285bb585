"""Semi-structured surface: SURVEY.md §2B B25–B29.

Arrays (higher-order functions), maps, JSON, Python/pandas UDFs and grouped
pandas (applyInPandas). Array math stays JVM-side via ``transform`` /
``filter`` / ``aggregate``; only the declared UDF surface crosses to Python,
and always Arrow-batched (pandas_udf / applyInPandas), never row-at-a-time.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ._util import T, dround, tiny_sort


# ---------------------------------------------------------------------------
# B25 — array functions
# ---------------------------------------------------------------------------

@query(
    "b25_array_explode",
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
           round(CAST(unnest(embedding) AS DOUBLE), 6) AS val
    FROM embeddings
    ORDER BY vec_id, pos
    """,
    tags=("B25",),
    doc="posexplode of the embedding array (0-based positions).",
)
def b25_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select(
            "vec_id",
            F.col("pos").cast("bigint").alias("pos"),
            dround(F.col("val").cast("double"), 6).alias("val"),
        )
        .orderBy("vec_id", "pos")
    )


@query(
    "b25_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS max_val,
           round(CAST(list_sort(embedding)[1] AS DOUBLE), 6) AS min_val,
           CAST(len(list_distinct(embedding)) AS BIGINT) AS n_distinct,
           round(sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                 x -> x * x), 'sum')), 4) AS l2_norm
    FROM embeddings ORDER BY vec_id
    """,
    tags=("B25",),
    doc="size, element_at, array max/min via sort, array_distinct, L2 norm via aggregate.",
)
def b25_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings")
    emb_d = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        dround(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        dround(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        dround(F.element_at(F.sort_array("embedding"), 1).cast("double"), 6).alias("min_val"),
        F.size(F.array_distinct("embedding")).cast("bigint").alias("n_distinct"),
        dround(
            F.sqrt(F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x * x)), 4
        ).alias("l2_norm"),
    ).orderBy("vec_id")


@query(
    "b25_array_construct",
    oracle="""
    SELECT n_nationkey,
           CAST(list_contains([n_nationkey, n_regionkey], 1) AS BOOLEAN) AS has_one,
           CAST(len(generate_series(0, n_nationkey)) AS BIGINT) AS seq_len,
           CAST(list_aggregate(generate_series(0, n_nationkey), 'sum') AS BIGINT) AS seq_sum
    FROM nation ORDER BY n_nationkey
    """,
    tags=("B25",),
    doc="array construction, array_contains, sequence, aggregate over the sequence.",
)
def b25_array_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = T(spark, sf_dir, "nation")
    seq = F.sequence(F.lit(0), F.col("n_nationkey"))
    return n.select(
        "n_nationkey",
        F.array_contains(F.array("n_nationkey", "n_regionkey"), 1).alias("has_one"),
        F.size(seq).cast("bigint").alias("seq_len"),
        F.aggregate(seq, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("seq_sum"),
    ).orderBy("n_nationkey")


@query(
    "b25_zip_with",
    oracle="""
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(a.embedding AS DOUBLE[]) AS ea, CAST(b.embedding AS DOUBLE[]) AS eb
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id < 20
    )
    SELECT id_a, id_b,
           round(list_aggregate(list_transform(generate_series(1, len(ea)),
                 i -> ea[i] * eb[i]), 'sum'), 4) AS dot
    FROM pairs ORDER BY id_a
    """,
    tags=("B25",),
    doc="zip_with elementwise product + aggregate = dot product of adjacent vectors.",
)
def b25_zip_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    a = e.where(F.col("vec_id") < 20).alias("a")
    b = e.alias("b")
    j = a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1)
    dot = F.aggregate(
        F.zip_with(F.col("a.emb"), F.col("b.emb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return j.select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        dround(dot, 4).alias("dot"),
    ).orderBy("id_a")


# ---------------------------------------------------------------------------
# B26 / B27 — maps + JSON
# ---------------------------------------------------------------------------

@query(
    "b26_maps",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
           CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(event_id AS VARCHAR) AS id_from_map
    FROM events ORDER BY event_id
    """,
    tags=("B26",),
    doc="from_json→map, map_keys/map_values, element_at, create_map.",
)
def b26_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    own = F.create_map(F.lit("id"), F.col("event_id").cast("string"))
    return ev.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_csv"),
        F.size(F.map_keys(m)).cast("bigint").alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
        F.element_at(own, "id").alias("id_from_map"),
    ).orderBy("event_id")


@query(
    "b27_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
           '{"event_id":' || event_id || '}' AS self_json,
           'STRUCT<k: BIGINT>' AS inferred_schema
    FROM events ORDER BY event_id
    """,
    tags=("B27",),
    doc="get_json_object / from_json / to_json / schema_of_json.",
)
def b27_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "struct<k:bigint>")
    return ev.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.to_json(F.struct(F.col("event_id"))).alias("self_json"),
        F.schema_of_json(F.lit('{"k": 87}')).alias("inferred_schema"),
    ).orderBy("event_id")


@query(
    "b26_maps_ext",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS doubled_k,
           'K' AS upper_first_key,
           CAST(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50
                THEN 1 ELSE 0 END AS BIGINT) AS n_big_vals,
           'k=' || json_extract_string(props, '$.k') AS kv_str
    FROM events ORDER BY event_id
    """,
    tags=("B26",),
    doc="Map higher-order functions: transform_values, transform_keys, "
    "map_filter, str_to_map — projected to scalars for the oracle.",
)
def b26_maps_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    doubled = F.transform_values(m, lambda k, v: v * 2)
    upper = F.transform_keys(m, lambda k, v: F.upper(k))
    big_only = F.map_filter(m, lambda k, v: v > 50)
    kv = F.str_to_map(F.concat(F.lit("k="), F.element_at(m, "k").cast("string")), F.lit(","), F.lit("="))
    return ev.select(
        "event_id",
        F.element_at(doubled, "k").alias("doubled_k"),
        F.element_at(F.map_keys(upper), 1).alias("upper_first_key"),
        F.size(big_only).cast("bigint").alias("n_big_vals"),
        F.concat(
            F.element_at(F.map_keys(kv), 1), F.lit("="), F.element_at(kv, "k")
        ).alias("kv_str"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# B28 / B29 — UDF surface (Arrow-batched only)
# ---------------------------------------------------------------------------

@query(
    "b28_pandas_udf",
    oracle="""
    SELECT doc_id,
           sha256(text) AS text_sha,
           to_base64(encode(substr(text, 1, 16))) AS head_b64,
           'plain:' || sha256(text) || ':' || CAST(octet_length(encode(text)) AS VARCHAR)
             AS hkey_demo
    FROM documents ORDER BY doc_id
    """,
    tags=("B28",),
    doc="UDF surface: Arrow-batched pandas_udf (sha256/base64 — the lake's "
    "hash/hkey codec primitives) plus ONE row-at-a-time scalar udf for API "
    "coverage (hkey encode demo). Only pandas UDFs appear in engine hot "
    "paths; scalar UDFs are ~10-100× slower (per-row pickling).",
)
def b28_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import base64
    import hashlib

    from pyspark.sql.functions import pandas_udf, udf

    @pandas_udf("string")
    def sha256_hex(s: pd.Series) -> pd.Series:
        return s.map(lambda t: hashlib.sha256(t.encode("utf-8")).hexdigest())

    @pandas_udf("string")
    def b64_head(s: pd.Series) -> pd.Series:
        return s.map(lambda t: base64.b64encode(t[:16].encode("utf-8")).decode("ascii"))

    @udf("string")
    def hkey_demo(text):  # scalar (row-at-a-time) UDF — API coverage only
        from ps_datalake_spark.lake.hkey import Hkey

        raw = text.encode("utf-8")
        return Hkey(
            kind="plain", hash=hashlib.sha256(raw).hexdigest(), size=len(raw)
        ).encode()

    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        sha256_hex(F.col("text")).alias("text_sha"),
        b64_head(F.col("text")).alias("head_b64"),
        hkey_demo(F.col("text")).alias("hkey_demo"),
    ).orderBy("doc_id")


@query(
    "b29_apply_in_pandas",
    oracle="""
    SELECT label, dim, round(avg(val), 6) AS centroid
    FROM (
      SELECT label,
             CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings)
    GROUP BY label, dim
    ORDER BY label, dim
    """,
    tags=("B29",),
    doc="Grouped-map UDAF via applyInPandas: per-label embedding centroid.",
)
def b29_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    e = T(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("emb")
    )

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf["emb"].values)
        means = mat.mean(axis=0)
        return pd.DataFrame(
            {
                "label": pdf["label"].iloc[0],
                "dim": np.arange(mat.shape[1], dtype="int64"),
                "centroid": means,
            }
        )

    out = e.groupBy("label").applyInPandas(centroid, "label int, dim bigint, centroid double")
    return out.select("label", "dim", dround("centroid", 6).alias("centroid")).orderBy(
        "label", "dim"
    )


@query(
    "b28_udtf_chunks",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
      FROM documents WHERE doc_id < 40 AND text IS NOT NULL
    ),
    nums AS (
      SELECT doc_id, ws,
             unnest(range(CAST(ceil(len(ws) / 20.0) AS BIGINT))) AS c
      FROM d
    )
    SELECT doc_id, CAST(c AS BIGINT) AS chunk_no,
           CAST(len(ws[(c*20+1):(c*20+20)]) AS BIGINT) AS n_words,
           CAST(length(array_to_string(ws[(c*20+1):(c*20+20)], ' '))
                AS BIGINT) AS chunk_chars
    FROM nums
    ORDER BY doc_id, chunk_no
    """,
    tags=("B28", "llm"),
    doc="Python user-defined TABLE function (the Spark 4 UDTF API — the "
    "declared UDF surface's table-valued member): a ChunkWords UDTF "
    "yields one row per 20-word chunk and is applied per document with "
    "a LATERAL join — the row-multiplying shape scalar UDFs cannot "
    "express. Declared-API coverage like b28_pandas_udf: the production "
    "chunker is the JVM-side array expression path (b41_doc_chunking); "
    "this exercises the UDTF protocol itself (per-row Python generator, "
    "Arrow row transfer, lateral correlation).",
)
def b28_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_no bigint, n_words bigint, chunk_chars bigint")
    class ChunkWords:
        def eval(self, text: str):
            if text is None:
                return
            ws = text.split()
            for i in range(0, len(ws), 20):
                part = ws[i : i + 20]
                yield (i // 20, len(part), len(" ".join(part)))

    name = "ps_chunk_words"
    spark.udtf.register(name, ChunkWords)
    T(spark, sf_dir, "documents").where(
        (F.col("doc_id") < 40) & F.col("text").isNotNull()
    ).select("doc_id", F.trim("text").alias("t")).createOrReplaceTempView(
        "ps_udtf_docs"
    )
    out = spark.sql(
        f"SELECT doc_id, c.chunk_no, c.n_words, c.chunk_chars "
        f"FROM ps_udtf_docs, LATERAL {name}(t) c"
    )
    return tiny_sort(out, "doc_id", "chunk_no")


@query(
    "b27_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
           '{"k":' || CAST(json_extract(props, '$.k') AS BIGINT) || '}' AS var_json,
           'OBJECT<k: BIGINT>' AS var_schema,
           CAST(NULL AS BIGINT) AS missing_path,
           CAST(NULL AS VARCHAR) AS bad_parse,
           TRUE AS null_is_variant_null
    FROM events ORDER BY event_id
    """,
    tags=("B27",),
    doc="Spark 4 VARIANT surface: parse_json -> variant_get typed extraction, "
    "to_json canonicalization, schema_of_variant, try_parse_json on invalid "
    "input (NULL, not an error), variant_get on a missing path (NULL), "
    "is_variant_null on a JSON null literal. VARIANT is the open-ended "
    "semi-structured column type for ingest pipelines where the props "
    "schema drifts; at scale the parse is a per-row JVM expression (no "
    "shuffle, no Python). Only scalar projections are returned — the "
    "variant value itself stays engine-internal.",
)
def b27_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    var = F.parse_json(F.col("props"))
    return ev.select(
        "event_id",
        F.variant_get(var, "$.k", "bigint").alias("k_int"),
        F.to_json(var).alias("var_json"),
        F.schema_of_variant(var).alias("var_schema"),
        F.variant_get(var, "$.does_not_exist", "bigint").alias("missing_path"),
        F.to_json(F.try_parse_json(F.lit("{not valid json"))).alias("bad_parse"),
        F.is_variant_null(F.parse_json(F.lit("null"))).alias("null_is_variant_null"),
    ).orderBy("event_id")


@query(
    "b27_xml",
    oracle="""
    SELECT event_id,
           '<ROW>' || chr(10) ||
           '    <event_id>' || event_id || '</event_id>' || chr(10) ||
           '    <event_type>' || event_type || '</event_type>' || chr(10) ||
           '</ROW>' AS xml,
           event_id AS rt_id,
           event_type AS rt_type,
           event_id AS xp_id,
           event_type AS xp_type
    FROM events ORDER BY event_id
    """,
    tags=("B27",),
    doc="XML functions (native in Spark 4): to_xml of a struct, from_xml "
    "round-trip extraction, and XPath scalar extraction (xpath_long / "
    "xpath_string) over the serialized form. All per-row JVM expressions — "
    "the XML codec runs inside whole-stage codegen with no shuffle; the "
    "oracle reconstructs to_xml's exact 4-space-indented layout textually.",
)
def b27_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    xml = F.to_xml(F.struct(F.col("event_id"), F.col("event_type")))
    parsed = F.from_xml(xml, "struct<event_id:bigint,event_type:string>")
    return ev.select(
        "event_id",
        xml.alias("xml"),
        parsed.getField("event_id").alias("rt_id"),
        parsed.getField("event_type").alias("rt_type"),
        F.xpath_long(xml, F.lit("/ROW/event_id")).alias("xp_id"),
        F.xpath_string(xml, F.lit("/ROW/event_type")).alias("xp_type"),
    ).orderBy("event_id")


@query(
    "b82_udtf_polymorphic",
    oracle=r"""
    WITH d AS (
      SELECT doc_id,
             string_split_regex(
               trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12)),
               '[ \t\n\r\f]+') AS ws
      FROM documents
      WHERE doc_id < 30 AND text IS NOT NULL
        AND regexp_replace(text, '[ \t\n\r\f]', '', 'g') <> ''
    )
    SELECT doc_id, ws[1] AS w0, ws[2] AS w1, ws[3] AS w2, ws[4] AS w3
    FROM d ORDER BY doc_id
    """,
    tags=("B28", "sql"),
    doc="POLYMORPHIC Python UDTF (Spark 4: the static analyze() method "
    "computes the output schema AT PLAN TIME from the call's literal "
    "arguments — here k=4 becomes four typed columns w0..w3), the "
    "schema-from-arguments half of the UDTF API that b28_udtf_chunks' "
    "fixed returnType does not exercise. Catalyst sees real resolved "
    "columns, so downstream pruning/pushdown work normally. Oracle is the "
    "fixed 4-column list indexing. Both sides pin the IDENTICAL whitespace "
    "class [ \\t\\n\\r\\f] — RE2's \\s exactly, WITHOUT \\v (Python's "
    "\\s-equivalent class includes \\x0b, RE2's does not; advisor r8) — "
    "for the split, the edge trim, and the whitespace-only-doc filter, so "
    "no character can diverge the sides.",
)
def b82_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class FixedSplit:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            n = int(k.value)
            return AnalyzeResult(
                schema=StructType(
                    [StructField(f"w{i}", StringType()) for i in range(n)]
                )
            )

        def eval(self, text: str, k: int):
            # Explicit ASCII whitespace class: python str.split() splits on
            # ALL Unicode whitespace (e.g. U+00A0) while the DuckDB oracle's
            # RE2 \s is exactly [ \t\n\r\f] — note NO \v: Python's \s-style
            # class includes \x0b but RE2's does not, so \v must pass
            # through as word content on both sides (advisor r8 item).
            # re.split only yields empty strings at the edges, so dropping
            # them is equivalent to trimming this same class first.
            import re

            ws = [w for w in re.split(r"[ \t\n\r\f]+", text or "") if w]
            yield tuple(ws[i] if i < len(ws) else None for i in range(int(k)))

    spark.udtf.register("ps_fixed_split", FixedSplit)
    # Filter on "has at least one char outside the shared whitespace class"
    # (not on space-only trim()) so whitespace-only docs are excluded by the
    # SAME character set the split uses, on both sides of the oracle.
    T(spark, sf_dir, "documents").where(
        (F.col("doc_id") < 30)
        & F.col("text").isNotNull()
        & (F.regexp_replace("text", "[ \t\n\r\f]", "") != "")
    ).select("doc_id", F.col("text").alias("t")).createOrReplaceTempView(
        "udtf_poly_docs"
    )
    return spark.sql(
        """
        SELECT doc_id, s.*
        FROM udtf_poly_docs, LATERAL ps_fixed_split(t, 4) s
        ORDER BY doc_id
        """
    )
