"""Corpus-curation operators (round 5, session 3): domain mixture
reweighting, quality-decile binning, distributed embedding covariance, and
keep-best dedup canonicalization — the decisions a pre-training data
curator makes between raw corpus and training mix.

Scale design notes (100 TB):
  * domain mixture is one token-count aggregation per source (map-side
    partials, 20-row result) — the sampling rates it emits drive the
    downstream hash-membership sampler (b43), so the whole reweighting
    pipeline is two passes over the corpus at any scale;
  * quality deciles are a single ntile window over a total order — one
    range-partitioned sort, the canonical distributed quantile-binning;
  * the covariance matrix is computed from per-partition moment partials
    (sum x, sum y, sum xy — JVM-side covar_pop), shuffling CONSTANT-size
    state per dimension pair, never the vectors; the d x d result for
    d = 64 is 4k cells — driver-bounded;
  * keep-best dedup is one window over the content-hash partition — same
    shuffle as exact dedup, but the keeper is the QUALITY argmax (longest
    text, doc_id tiebreak), the policy a curator actually wants.

Determinism: shares/rates/covariances round to 6dp on both engines;
decile assignment orders by (n_chars, doc_id) — a total order, so ntile
is tie-free; array access is 0-based in Spark and 1-based in DuckDB
(spelled explicitly at each site).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ._util import T, dround, tiny_sort
from .sampling_rollup import _HASH_PCT_SQL, _hash_pct


@query(
    "b65_domain_mixture",
    oracle=r"""
    WITH tok AS (
      SELECT source,
             CAST(len(string_split_regex(lower(trim(text)), '\s+'))
                  AS BIGINT) AS n_tok
      FROM documents WHERE text IS NOT NULL
    ),
    per_src AS (
      SELECT source, count(*) AS docs,
             CAST(sum(n_tok) AS BIGINT) AS tokens
      FROM tok GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(tokens) AS DOUBLE) AS total,
             CAST(count(*) AS DOUBLE) AS n_src
      FROM per_src
    )
    SELECT source, docs, tokens,
           round(tokens / total, 6) AS token_share,
           round(least(1.0, (total / n_src) / tokens), 6) AS sample_rate
    FROM per_src CROSS JOIN tot
    ORDER BY source
    """,
    tags=("B37", "curation"),
    doc="Domain mixture reweighting: per-source token counts and the "
    "sampling rate that equalizes every source's token contribution "
    "(capped at 1 — undersized sources are taken whole, the standard "
    "uniform-mixture target). One aggregation pass; the 1-row corpus "
    "total attaches as a broadcast. The emitted rates feed the b43 "
    "hash-membership sampler, making reweighting end-to-end "
    "deterministic.",
)
def b65_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    tok = docs.select(
        "source",
        F.size(F.split(F.lower(F.trim("text")), r"\s+")).cast("bigint").alias("n_tok"),
    )
    # the 20-row per-source aggregate feeds BOTH the corpus total and the
    # final projection — materialize it once so the corpus scans once
    per_src = (
        tok.groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_tok").cast("bigint").alias("tokens"),
        )
        .localCheckpoint(eager=False)
    )
    tot = per_src.agg(
        F.sum("tokens").cast("double").alias("total"),
        F.count("*").cast("double").alias("n_src"),
    )
    out = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "docs",
        "tokens",
        dround(F.col("tokens") / F.col("total"), 6).alias("token_share"),
        dround(
            F.least(
                F.lit(1.0), (F.col("total") / F.col("n_src")) / F.col("tokens")
            ),
            6,
        ).alias("sample_rate"),
    )
    return tiny_sort(out, "source")


@query(
    "b65_quality_deciles",
    oracle="""
    WITH d AS (
      SELECT lang, doc_id, n_chars,
             ntile(10) OVER (PARTITION BY lang
                             ORDER BY n_chars, doc_id) AS decile
      FROM documents
    )
    SELECT lang, CAST(decile AS BIGINT) AS decile,
           count(*) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS lo,
           CAST(max(n_chars) AS BIGINT) AS hi,
           CAST(sum(n_chars) AS BIGINT) AS chars_total
    FROM d GROUP BY lang, decile ORDER BY lang, decile
    """,
    tags=("B14", "curation"),
    doc="Per-language quality-decile binning (curriculum bucketing): "
    "ntile(10) over the (n_chars, doc_id) total order WITHIN each "
    "language — tie-free, so the assignment is identical on every engine "
    "— then per-decile stats. The window partitions on the language key "
    "(one shuffle, languages bin in parallel), the same per-group "
    "quantile shape as b57_exact_percentiles — never a single global "
    "sort partition.",
)
def b65_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    binned = docs.withColumn("decile", F.ntile(10).over(w).cast("bigint"))
    agg = binned.groupBy("lang", "decile").agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").cast("bigint").alias("lo"),
        F.max("n_chars").cast("bigint").alias("hi"),
        F.sum("n_chars").cast("bigint").alias("chars_total"),
    )
    return tiny_sort(agg, "lang", "decile")


@query(
    "b65_embedding_covariance",
    oracle="""
    WITH pairs AS (
      SELECT i, j FROM generate_series(1, 4) s(i)
      CROSS JOIN generate_series(1, 4) t(j) WHERE i <= j
    )
    SELECT CAST(i AS BIGINT) AS dim_i, CAST(j AS BIGINT) AS dim_j,
           round((SELECT covar_pop(CAST(e.embedding[p.i] AS DOUBLE),
                                   CAST(e.embedding[p.j] AS DOUBLE))
                  FROM embeddings e), 6) AS cov
    FROM pairs p ORDER BY dim_i, dim_j
    """,
    tags=("B36", "curation"),
    doc="Distributed covariance of the first 4 embedding dimensions (the "
    "upper triangle, variances on the diagonal) — the moment-aggregation "
    "shape behind PCA/whitening over 100 TB of vectors: per-partition "
    "partials (sum x, sum y, sum xy) via JVM-side covar_pop, constant "
    "shuffle state per pair, no vector ever leaves its partition. Spark "
    "indexes arrays from 0, DuckDB from 1 — dim_k names the 1-based dim.",
)
def b65_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = T(spark, sf_dir, "embeddings")
    dims = 4
    cols = [
        F.col("embedding")[k].cast("double").alias(f"x{k + 1}")
        for k in range(dims)
    ]
    flat = emb.select(*cols)
    aggs = []
    for i in range(1, dims + 1):
        for j in range(i, dims + 1):
            aggs.append(
                F.covar_pop(f"x{i}", f"x{j}").alias(f"c_{i}_{j}")
            )
    wide = flat.agg(*aggs)
    long = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("bigint").alias("dim_i"),
                        F.lit(j).cast("bigint").alias("dim_j"),
                        F.col(f"c_{i}_{j}").alias("raw"),
                    )
                    for i in range(1, dims + 1)
                    for j in range(i, dims + 1)
                ]
            )
        ).alias("p")
    ).select("p.dim_i", "p.dim_j", dround(F.col("p.raw"), 6).alias("cov"))
    return tiny_sort(long, "dim_i", "dim_j")


@query(
    "b65_dedup_keep_best",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, n_chars, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, n_chars + 1000, text
      FROM documents WHERE doc_id < 10 AND text IS NOT NULL
    ),
    ranked AS (
      SELECT doc_id, n_chars, sha256(text) AS h,
             row_number() OVER (PARTITION BY sha256(text)
                                ORDER BY n_chars DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY sha256(text)) AS copies
      FROM corpus
    )
    SELECT h AS content_hash,
           CAST(doc_id AS BIGINT) AS keeper_id,
           CAST(copies AS BIGINT) AS copies
    FROM ranked WHERE rn = 1 AND copies >= 2
    ORDER BY content_hash
    """,
    tags=("B34", "curation"),
    doc="Keep-best dedup canonicalization: within each exact-duplicate "
    "group (sha256 of text) keep the QUALITY argmax (highest n_chars, "
    "doc_id tiebreak) instead of b34's min-id keeper — the policy a "
    "curator wants when duplicates differ in metadata. Ten planted "
    "copies (doc_id + 100000) carry inflated n_chars, so the argmax "
    "provably selects on quality, not id order. Same single "
    "content-hash shuffle as exact dedup; only multi-copy groups emit.",
)
def b65_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = T(spark, sf_dir, "documents").select("doc_id", "n_chars", "text")
    planted = (
        base.where((F.col("doc_id") < 10) & F.col("text").isNotNull())
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            (F.col("n_chars") + 1000).alias("n_chars"),
            "text",
        )
    )
    corpus = base.unionAll(planted).select(
        "doc_id", "n_chars", F.sha2("text", 256).alias("h")
    )
    w = Window.partitionBy("h").orderBy(F.col("n_chars").desc(), "doc_id")
    ranked = corpus.withColumn("rn", F.row_number().over(w)).withColumn(
        "copies", F.count("*").over(Window.partitionBy("h"))
    )
    out = ranked.where((F.col("rn") == 1) & (F.col("copies") >= 2)).select(
        F.col("h").alias("content_hash"),
        F.col("doc_id").cast("bigint").alias("keeper_id"),
        F.col("copies").cast("bigint").alias("copies"),
    )
    return tiny_sort(out, "content_hash")


@query(
    "b67_fixed_k_per_group",
    oracle=f"""
    WITH ranked AS (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY {_HASH_PCT_SQL.format(k="doc_id")}, doc_id
             ) AS rn
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_taken,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum,
           CAST(sum(n_chars) AS BIGINT) AS chars_taken
    FROM ranked WHERE rn <= 40
    GROUP BY lang ORDER BY lang
    """,
    tags=("B43", "curation"),
    doc="Exact-k-per-stratum sampling: take EXACTLY 40 documents per "
    "language (fewer only if the stratum is smaller), chosen by ranking on "
    "the engine-portable sha256 bucket with doc_id tiebreak — the "
    "fixed-size companion to b43's fractional stratified sampling (a "
    "training mix often specifies absolute per-language doc budgets, not "
    "rates). One keyed window shuffle; the hash order makes the selection "
    "reproducible on any engine at any scale, unlike ORDER BY random().",
)
def b67_fixed_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    w = Window.partitionBy("lang").orderBy(
        _hash_pct(F.col("doc_id")), "doc_id"
    )
    ranked = docs.withColumn("rn", F.row_number().over(w))
    agg = ranked.where(F.col("rn") <= 40).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_taken"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
        F.sum("n_chars").cast("bigint").alias("chars_taken"),
    )
    return tiny_sort(agg, "lang")


@query(
    "b67_mad_outliers",
    oracle="""
    WITH d AS (SELECT lang, doc_id, n_chars FROM documents),
    med AS (
      SELECT lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
               AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM d
    ),
    m AS (
      SELECT lang,
             CAST(max(CASE WHEN rn = (50*n + 99) // 100
                           THEN n_chars END) AS BIGINT) AS median
      FROM med GROUP BY lang
    ),
    dev AS (
      SELECT d.lang, d.doc_id, abs(d.n_chars - m.median) AS ad,
             row_number() OVER (
               PARTITION BY d.lang
               ORDER BY abs(d.n_chars - m.median), d.doc_id
             ) AS rn,
             count(*) OVER (PARTITION BY d.lang) AS n
      FROM d JOIN m USING (lang)
    ),
    mad AS (
      SELECT lang,
             CAST(max(CASE WHEN rn = (50*n + 99) // 100
                           THEN ad END) AS BIGINT) AS mad
      FROM dev GROUP BY lang
    )
    SELECT d.lang,
           CAST(max(m.median) AS BIGINT) AS median,
           CAST(max(mad.mad) AS BIGINT) AS mad,
           CAST(sum(CASE WHEN abs(d.n_chars - m.median) > 2 * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM d JOIN m USING (lang) JOIN mad USING (lang)
    GROUP BY d.lang ORDER BY d.lang
    """,
    tags=("B37", "curation"),
    doc="Robust per-language outlier detection: nearest-rank median and MAD "
    "(median absolute deviation) of document length in INTEGER arithmetic "
    "(ceil-index selection, |x-med| exact) — no float quantile "
    "interpolation to straddle. Documents beyond 2 MAD are counted as "
    "outliers (2x chosen so the synthetic fixture's tight length distribution yields a non-trivial outlier set), the robust filter a curator uses where mean/stddev would be "
    "dragged by the very outliers being removed. Two keyed window passes "
    "plus broadcast-joined per-group scalars.",
)
def b67_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("lang")
    med_rn = d.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wn)
    )
    m = med_rn.groupBy("lang").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(50*n + 99) div 100"), F.col("n_chars"))
        )
        .cast("bigint")
        .alias("median")
    )
    dev = d.join(F.broadcast(m), "lang").withColumn(
        "ad", F.abs(F.col("n_chars") - F.col("median"))
    )
    wd = Window.partitionBy("lang").orderBy("ad", "doc_id")
    dev_rn = dev.withColumn("rn", F.row_number().over(wd)).withColumn(
        "n", F.count("*").over(wn)
    )
    mad = dev_rn.groupBy("lang").agg(
        F.max(F.when(F.col("rn") == F.expr("(50*n + 99) div 100"), F.col("ad")))
        .cast("bigint")
        .alias("mad")
    )
    joined = d.join(F.broadcast(m), "lang").join(F.broadcast(mad), "lang")
    agg = joined.groupBy("lang").agg(
        F.max("median").cast("bigint").alias("median"),
        F.max("mad").cast("bigint").alias("mad"),
        F.sum(
            F.when(
                F.abs(F.col("n_chars") - F.col("median")) > 2 * F.col("mad"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_outliers"),
        F.count("*").cast("bigint").alias("n_docs"),
    )
    return tiny_sort(agg, "lang")
