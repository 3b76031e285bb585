"""Deterministic sampling/splitting (training-data reproducibility) and
multi-resolution time rollups (the hypertable continuous-aggregate shape).

Sampling uses a content-derived uniform hash — sha256 of the key, first 4 hex
digits mod 100 — so the same row lands in the same sample/split on every
engine and every run; both Spark and DuckDB compute it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ._util import T, dround


def _hash_pct(key: Column) -> Column:
    """Uniform [0,100) bucket from sha256 of the key (engine-portable)."""
    return F.conv(F.substring(F.sha2(key.cast("string").cast("binary"), 256), 1, 4), 16, 10).cast(
        "bigint"
    ) % 100


_HASH_PCT_SQL = "CAST(('0x' || substr(sha256(CAST({k} AS VARCHAR)), 1, 4)) AS BIGINT) % 100"


@query(
    "b43_stratified_sample",
    oracle=f"""
    SELECT lang,
           count(*) AS n_sampled,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM documents
    WHERE {_HASH_PCT_SQL.format(k='doc_id')} <
          CASE lang WHEN 'en' THEN 20 ELSE 50 END
    GROUP BY lang ORDER BY lang
    """,
    tags=("B43", "llm"),
    doc="Deterministic stratified sampling: per-language rates (downsample "
    "dominant 'en' to 20%, others 50%) via content-derived hash — "
    "reproducible across engines/runs, no RNG state.",
)
def b43_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", 20).otherwise(50)
    sampled = docs.where(_hash_pct(F.col("doc_id")) < rate)
    return (
        sampled.groupBy("lang")
        .agg(F.count("*").alias("n_sampled"), F.sum("doc_id").cast("bigint").alias("id_checksum"))
        .orderBy("lang")
    )


@query(
    "b43_train_val_test_split",
    oracle=f"""
    SELECT CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (SELECT n_chars, {_HASH_PCT_SQL.format(k='doc_id')} AS h FROM documents)
    GROUP BY 1 ORDER BY 1
    """,
    tags=("B43", "llm"),
    doc="Deterministic 80/10/10 train/val/test split by content hash — stable "
    "membership under re-runs and data appends.",
)
def b43_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    h = _hash_pct(F.col("doc_id"))
    split = (
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").cast("bigint").alias("total_chars"))
        .orderBy("split")
    )


@query(
    "b44_rollup_cascade",
    oracle="""
    WITH m10 AS (
      SELECT time_bucket(INTERVAL '10 minutes', ts::TIMESTAMP) AS b10,
             event_type, count(*) AS cnt, sum(value) AS sv
      FROM events GROUP BY 1, 2
    )
    SELECT time_bucket(INTERVAL '1 hour', b10) AS b60,
           event_type,
           CAST(sum(cnt) AS BIGINT) AS cnt,
           round(sum(sv), 2) AS sum_val
    FROM m10
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("B44", "B30"),
    doc="Hypertable-style rollup cascade: the hourly aggregate is computed "
    "FROM the 10-minute aggregate (re-aggregation of partials), not from raw "
    "events — the continuous-aggregate pattern that keeps 100 TB rollups "
    "incremental.",
)
def b44_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    m10 = ev.groupBy(
        F.window(F.col("ts"), "10 minutes").alias("w"), "event_type"
    ).agg(F.count("*").alias("cnt"), F.sum("value").alias("sv"))
    h1 = (
        m10.groupBy(F.window(F.col("w.start"), "1 hour").alias("w60"), "event_type")
        .agg(F.sum("cnt").alias("cnt"), dround(F.sum("sv"), 2).alias("sum_val"))
        .select(
            F.col("w60.start").cast("timestamp_ntz").alias("b60"),
            "event_type",
            F.col("cnt").cast("bigint").alias("cnt"),
            "sum_val",
        )
    )
    return h1.orderBy("b60", "event_type")


@query(
    "b67_weighted_sample_topk",
    oracle="""
    WITH docs AS (
      SELECT doc_id, lang, n_chars,
             (CAST(((doc_id % 1000003) * 2654435761) % 100000 AS DOUBLE)
              + 0.5) / 100000.0 AS u
      FROM documents WHERE text IS NOT NULL AND n_chars > 0
    ),
    keyed AS (
      SELECT doc_id, lang, n_chars,
             CAST(round(CAST(CAST(round(ln(u) * 1000000.0) AS BIGINT) * 1000
                             AS DOUBLE) / n_chars) AS BIGINT) AS k_e9
      FROM docs
    )
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars, k_e9
    FROM keyed
    ORDER BY k_e9 DESC, doc_id LIMIT 50
    """,
    tags=("B43", "llm", "sampling"),
    doc="Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES): "
    "each doc draws a deterministic uniform u from the overflow-safe "
    "Knuth-hash of its id, scores key = ln(u)/weight (the log-domain "
    "A-ES key, weight = n_chars), and the global top-k by key IS an "
    "exact weighted sample without replacement — one scan plus a "
    "TakeOrdered top-k, no global sort, no driver state, reproducible "
    "on any engine. Cross-engine determinism (the r5 red row was a "
    "libm ln() ulp magnified x1e12 across a round() half-boundary): "
    "ln(u) is first quantised onto a 1e-6 grid — an exact BIGINT both "
    "engines agree on, since over all 100000 distinct u values the "
    "nearest half-boundary is 2.6e-5 away vs <=2e-9 scaled libm drift "
    "— and the remaining x1000/n_chars division then runs on bit-"
    "identical operands, so its IEEE result and round() are identical "
    "everywhere (all half-integers below 2^52 are exact doubles). The "
    "key ships as BIGINT k_e9 (ln(u)/n_chars in 1e-9 units); exact "
    "ties break on doc_id. The exact-k complement of b56's rate-based "
    "temperature sampling.",
)
def b67_weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.col("n_chars") > 0)
    )
    u = (
        (((F.col("doc_id") % 1000003) * F.lit(2654435761)) % 100000).cast(
            "double"
        )
        + 0.5
    ) / 100000.0
    ln_e6 = F.round(F.log(u) * F.lit(1000000.0)).cast("bigint")
    k_e9 = F.round((ln_e6 * F.lit(1000)).cast("double") / F.col("n_chars")).cast(
        "bigint"
    )
    out = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        k_e9.alias("k_e9"),
    )
    return out.orderBy(F.col("k_e9").desc(), "doc_id").limit(50)
