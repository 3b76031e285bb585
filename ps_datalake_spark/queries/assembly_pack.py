"""Round-6 training-data assembly operators: DSIR-style importance
weighting, n-gram memorization-rate profiling, and per-source token-budget
fill — three curation stages a 100 TB pre-training pipeline runs between
dedup/quality filtering and final mixture assembly.

Scale design notes (100 TB):
  * DSIR importance (Xie et al. 2023, "Data Selection for Language Models
    via Importance Resampling"): hashed bigram features aggregate to a
    BOUNDED relation (65536 buckets) regardless of corpus size — one
    map-side-combined shuffle over the exploded features, then the
    per-bucket log-ratio table broadcasts everywhere and the per-doc sum
    is a second pass over the same postings.  The postings relation is
    checkpointed between its two consumers — re-deriving it re-runs the
    explode + per-occurrence sha256 (measured 2x the whole query cost at
    10x sf0.1), and the materialized form is narrower than its input.
  * memorization rate (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): per-doc fraction of its distinct
    8-grams that occur in ≥2 documents.  Posting-list shuffle keyed on
    the gram — cost is Σ df², never docs²; at scale the gram key is
    hashed to int64 to halve shuffle width (kept as the raw string here
    so the oracle join is byte-identical).
  * token-budget fill: one window cumsum per source (shuffle on the
    source key), no joins, no driver state — the greedy "take the best
    docs per domain until the token budget is hit" mixture-assembly step.

Determinism: all counts are exact integers; the single float in the pack
(the DSIR log-ratio) is quantised onto a 1e-6 grid as an exact BIGINT
before any summation (b67's discipline: the ln() argument is an identical
IEEE double on both engines — same integer operands, same operation order
— so the scaled round() agrees everywhere except within ~2e-15 of a
half-boundary, ~4e-9 of the grid spacing), and the per-doc weight is then
an associative BIGINT sum — no float accumulation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ._util import T, tiny_sort

_N_BUCKETS = 65536  # 4 hex digits of sha256 — the DSIR hashed-feature width


def _bigrams(toks_col):
    """Whitespace-token bigram array (JVM-side, no UDF).

    ``toks_col`` must be a MATERIALIZED token-array column (not the raw
    split() expression): element_at over an inline split re-runs the regex
    split per element — O(tokens^2) per document, the defect class the r6
    scale re-measure caught in b70_memorization_rate.
    """
    toks = F.col(toks_col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )


_BIGRAMS_SQL = """
    list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                   i -> t[i] || ' ' || t[i+1])
"""


@query(
    "b70_dsir_importance",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents WHERE text IS NOT NULL
    ),
    feats AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(sha256(unnest({_BIGRAMS_SQL})), 1, 4)) AS BIGINT) AS f
      FROM toks
    ),
    stats AS (
      SELECT f,
             count(*) AS cr,
             count(*) FILTER (lang = 'en') AS ct
      FROM feats GROUP BY f
    ),
    totals AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM stats),
    ratios AS (
      SELECT f,
             CAST(round(ln(((ct + 1.0) * (tr + {_N_BUCKETS}.0))
                         / ((cr + 1.0) * (tt + {_N_BUCKETS}.0))) * 1000000.0)
                  AS BIGINT) AS k_e6
      FROM stats, totals
    )
    SELECT doc_id, lang, CAST(sum(k_e6) AS BIGINT) AS weight_e6
    FROM feats JOIN ratios USING (f)
    GROUP BY doc_id, lang
    ORDER BY weight_e6 DESC, doc_id LIMIT 50
    """,
    tags=("B43", "llm", "curation"),
    doc="DSIR importance resampling weights (hashed-bigram features, "
    "target = the 'en' slice, raw = the full corpus): every bigram "
    "occurrence maps to one of 65536 sha-derived buckets, per-bucket "
    "Laplace-smoothed log probability ratios ln(p_target/p_raw) are "
    "quantised to exact 1e-6-grid BIGINTs, and each document's importance "
    "weight is the associative integer sum of its features' ratios — the "
    "top-k by weight is the importance-ranked selection set. The bucket "
    "relation is bounded (65536 rows) at any corpus size, so the ratio "
    "table broadcasts and the whole op is two posting passes.",
)
def b70_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # materialize the token array as a COLUMN before the bigram transform
    # (the b70_memorization_rate discipline), and checkpoint the postings
    # ONCE — stats and the per-doc weight sum both consume `feats`, and
    # without the checkpoint each consumer re-ran the explode + 120M-row
    # sha256 pass (measured 360 s vs DuckDB's 9 s at 10x sf0.1).
    tw = docs.select(
        "doc_id", "lang", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("ws")
    )
    feats = (
        tw.select("doc_id", "lang", F.explode(_bigrams("ws")).alias("bg"))
        .select(
            "doc_id",
            "lang",
            F.conv(F.substring(F.sha2(F.col("bg").cast("binary"), 256), 1, 4), 16, 10)
            .cast("bigint")
            .alias("f"),
        )
        .localCheckpoint(eager=False)
    )
    stats = feats.groupBy("f").agg(
        F.count("*").alias("cr"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("ct"),
    )
    totals = stats.agg(
        F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
    )
    ratios = stats.crossJoin(F.broadcast(totals)).select(
        "f",
        F.round(
            F.log(
                ((F.col("ct") + 1.0) * (F.col("tr") + float(_N_BUCKETS)))
                / ((F.col("cr") + 1.0) * (F.col("tt") + float(_N_BUCKETS)))
            )
            * 1000000.0
        )
        .cast("bigint")
        .alias("k_e6"),
    )
    weights = (
        feats.join(F.broadcast(ratios), "f")
        .groupBy("doc_id", "lang")
        .agg(F.sum("k_e6").cast("bigint").alias("weight_e6"))
    )
    return weights.orderBy(F.col("weight_e6").desc(), "doc_id").limit(50)


@query(
    "b70_memorization_rate",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents WHERE text IS NOT NULL
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 7, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                    || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6]
                    || ' ' || t[i+7]))) AS g
      FROM toks
    ),
    df AS (SELECT g, count(*) AS n_docs FROM grams GROUP BY g)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(*) FILTER (n_docs >= 2) AS BIGINT) AS n_dup,
           CAST(round(CAST(count(*) FILTER (n_docs >= 2) AS DOUBLE)
                      * 1000000.0 / count(*)) AS BIGINT) AS dup_ppm
    FROM grams JOIN df USING (g)
    GROUP BY doc_id
    """,
    tags=("B35", "llm", "curation"),
    doc="Memorization-rate profiling (the Lee et al. dedup diagnostic): per "
    "document, the fraction of its DISTINCT 8-token-grams that appear in "
    ">=2 documents, in parts per million. One posting-list shuffle keyed "
    "on the xxhash64-collapsed gram — 8-byte keys, not 8-word strings "
    "(cost sum(df^2), never docs^2) plus a per-doc "
    "re-aggregation; all counts exact integers, the ppm ratio is one "
    "double division of identical integers on both engines. Docs with "
    "fewer than 8 tokens contribute no grams and drop out, matching the "
    "oracle's empty-list unnest.",
)
def b70_memorization_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # materialize the token array as a COLUMN before the n-gram transform:
    # 8 element_at calls over the raw split() expression re-ran the regex
    # split per element — O(tokens^2 x 8) per document, unbounded at 10x
    # sf0.1 (caught by the r6 scale re-measure)
    tw = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("ws")
    )
    # generate the per-doc-distinct gram postings ONCE (the b64_bm25
    # single-materialization discipline): all three consumers read the
    # checkpointed relation instead of re-deriving the grams per branch
    # xxhash64 each gram at generation time (the b73 width fix): the
    # checkpointed postings and both downstream shuffles carry 8-byte keys
    # instead of 8-word strings, and the per-doc distinct runs over int64s.
    # Collision safety: 64-bit keys over ~1e8 distinct grams give a ~3e-7
    # birthday probability of ANY colliding pair; the DuckDB oracle joins on
    # the exact string, so the driver hash-match independently witnesses
    # collision-freeness at fixture scale.
    grams = (
        tw.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.greatest(F.size("ws") - 7, F.lit(0))),
                        lambda i: F.xxhash64(F.array_join(F.slice("ws", i, 8), " ")),
                    )
                )
            ).alias("g"),
        )
        .localCheckpoint(eager=False)
    )
    totals = grams.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_grams")
    )
    # grams are per-doc distinct, so cross-document occurrence == min(doc)
    # != max(doc) — a plain min/max aggregate that combines map-side,
    # instead of a count-per-gram relation joined back over every posting.
    # The dup-gram relation is CORPUS-PROPORTIONAL: it must never broadcast
    # (a size misestimate OOMs the driver at 10x sf0.1 — the b69
    # broadcast-limit bug class); shuffle_hash keeps the per-key build
    # bounded by the partition, not the corpus.
    dupset = (
        grams.groupBy("g")
        .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
        .where(F.col("mn") != F.col("mx"))
        .select("g")
    )
    ndup = (
        grams.join(dupset.hint("shuffle_hash"), "g")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_dup"))
    )
    per_doc = (
        totals.join(ndup, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_dup", F.lit(0)).cast("bigint").alias("n_dup"),
            F.round(
                F.coalesce("n_dup", F.lit(0)).cast("double")
                * 1000000.0
                / F.col("n_grams")
            )
            .cast("bigint")
            .alias("dup_ppm"),
        )
    )
    return per_doc


_BUDGET_TOKENS = 100_000


@query(
    "b70_token_budget_fill",
    oracle=rf"""
    WITH sized AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
               AS n_tokens
      FROM documents WHERE text IS NOT NULL
    ),
    ranked AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source
                                 ORDER BY n_tokens DESC, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM sized
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_tokens) AS BIGINT) AS kept_tokens,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM ranked WHERE cum <= {_BUDGET_TOKENS}
    GROUP BY source ORDER BY source
    """,
    tags=("B43", "llm", "curation"),
    doc="Per-source token-budget fill (mixture assembly): greedily keep the "
    "highest-token documents per source — deterministic priority "
    "(n_tokens DESC, doc_id) — while the running token total stays "
    "within the 100k budget. One window cumsum per source key, exact "
    "integer arithmetic, bounded per-source output; the shape that "
    "assembles a fixed-size training mix from an arbitrarily large "
    "curated pool.",
)
def b70_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = T(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    sized = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .cast("bigint")
        .alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("n_tokens").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = sized.withColumn("cum", F.sum("n_tokens").over(w))
    out = (
        ranked.where(F.col("cum") <= _BUDGET_TOKENS)
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.sum("n_tokens").cast("bigint").alias("kept_tokens"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
    )
    return tiny_sort(out, "source")


_K = 8  # cluster count — bounded, so the centroid relation always broadcasts


@query(
    "b71_kmeans_step",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS e
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    c AS (SELECT vec_id AS cid, e AS ce FROM q ORDER BY vec_id LIMIT {_K}),
    d AS (
      SELECT q.vec_id, c.cid,
             CAST(list_sum(list_transform(generate_series(1, 64),
               i -> (q.e[i] - c.ce[i]) * (q.e[i] - c.ce[i]))) AS BIGINT) AS dist
      FROM q, c
    ),
    a AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d) WHERE rn = 1
    )
    SELECT a.cid, CAST(gs.i - 1 AS INT) AS dim,
           CAST(sum(q.e[gs.i]) AS BIGINT) AS sum_e6,
           CAST(count(*) AS BIGINT) AS n_members
    FROM a JOIN q USING (vec_id) CROSS JOIN generate_series(1, 64) AS gs(i)
    GROUP BY a.cid, gs.i
    ORDER BY cid, dim
    """,
    tags=("B36", "llm", "curation"),
    doc="One exact Lloyd step of k-means over the embedding corpus (the "
    "semantic-clustering stage of corpus curation): components quantised "
    "to a 1e-6 integer grid, squared-L2 distances to the k seed centroids "
    "(first k vectors by vec_id) computed as exact BIGINT sums, argmin "
    "with a deterministic cid tie-break, and the M-step emitted as exact "
    "per-(cluster, dim) integer sums + member counts.  Scale shape: the "
    "centroid relation is k rows at ANY corpus size (broadcast), the "
    "distance/argmin pass is map-side over a k-row nested loop, and the "
    "only shuffle is the bounded k x dim final aggregate — Lloyd "
    "iterations are a bounded driver loop over this exact step.",
)
def b71_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = T(spark, sf_dir, "embeddings").where(F.col("embedding").isNotNull())
    q = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 1000000.0).cast("bigint"),
        ).alias("e"),
    )
    cent = (
        q.orderBy("vec_id")
        .limit(_K)
        .select(F.col("vec_id").alias("cid"), F.col("e").alias("ce"))
    )
    dist = F.aggregate(
        F.zip_with("e", "ce", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    ).alias("dist")
    d = q.crossJoin(F.broadcast(cent)).select("vec_id", "cid", "e", dist)
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    assigned = (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "cid", "e")
    )
    stats = (
        assigned.select("cid", F.posexplode("e").alias("dim", "v"))
        .groupBy("cid", "dim")
        .agg(
            F.sum("v").cast("bigint").alias("sum_e6"),
            F.count("*").cast("bigint").alias("n_members"),
        )
    )
    return tiny_sort(stats, "cid", "dim")
