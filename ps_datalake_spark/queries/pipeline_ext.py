"""Training-data pipeline extensions (round 2): benchmark-contamination
detection, PII scrubbing, and repetition-based quality filtering.

These are the remaining first-class operations a 100 TB pretraining-data
pipeline runs beyond dedup/similarity/quality (SURVEY.md §2B B34–B37):

* contamination — n-gram overlap between the corpus and a held-out eval set
  (decontamination pass before training);
* PII scrubbing — deterministic regex redaction with engine-portable
  verification (sha256 of the scrubbed text);
* repetition — Gopher-style max-token-frequency signal that catches
  boilerplate/spam documents that length/stopword heuristics miss.

All three are JVM-expression or keyed-join shaped: no Python in the hot
path, shuffles keyed on (shingle) / none / (doc_id, token).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import shingles, tokenize
from ..registry import query
from ._util import T, dround
from .sampling_rollup import _HASH_PCT_SQL, _hash_pct

# 5-gram shingles for contamination (eval-set decontamination convention);
# the eval set is the deterministic ~5% content-hash sample so the check is
# reproducible with no side files.
_EVAL_PCT = 5

_CONTAM_ORACLE = f"""
    WITH marked AS (
      SELECT doc_id, text, {_HASH_PCT_SQL.format(k='doc_id')} < {_EVAL_PCT} AS is_eval
      FROM documents
    ),
    toks AS (
      SELECT doc_id, is_eval, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM marked
    ),
    sh AS (
      SELECT doc_id, is_eval,
             list_distinct(list_transform(generate_series(1, greatest(len(t) - 4, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS s
      FROM toks
    ),
    eval_shingles AS (
      SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE is_eval
    ),
    corpus AS (SELECT doc_id, s FROM sh WHERE NOT is_eval),
    hits AS (
      SELECT c.doc_id, count(*) AS n_shared
      FROM (SELECT doc_id, unnest(s) AS shingle FROM corpus) c
      JOIN eval_shingles e USING (shingle)
      GROUP BY c.doc_id
    )
    SELECT corpus.doc_id,
           CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared,
           coalesce(n_shared, 0) >= 3 AS contaminated
    FROM corpus LEFT JOIN hits USING (doc_id)
    ORDER BY doc_id
    """


@query(
    "b47_contamination",
    oracle=_CONTAM_ORACLE,
    tags=("B47", "llm"),
    doc="Benchmark-contamination check: for every corpus document, the count "
    "of distinct 5-gram shingles shared with a deterministic ~5% held-out "
    "eval set; contaminated = >= 3 shared shingles. One shingle-posting "
    "pass (checkpointed — three branches consume it) and one posting-list "
    "equi-join keyed on the shingle (cost sum-of-df, not docs x eval). The "
    "eval shingle set is ~5% OF THE CORPUS — corpus-proportional, so it "
    "must NEVER broadcast (the b69 broadcast-limit class); shuffle_hash "
    "keys the join so the per-key build stays bounded by the partition at "
    "any corpus size.",
)
def b47_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", "text", (_hash_pct(F.col("doc_id")) < _EVAL_PCT).alias("is_eval")
    )
    # token array materialized in its own projection before the shingle
    # transform — slicing the inline split() re-runs the regex per element —
    # and the shingle postings generated ONCE into a lazy checkpoint: the
    # eval set, the hit count, and (before this shape) the output row base
    # each re-ran the full shingle pass (3x the dominant cost at 10x sf0.1)
    tw = docs.select(
        "doc_id", "is_eval", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("ws")
    )
    postings = (
        tw.select(
            "doc_id", "is_eval", F.explode(shingles(F.col("ws"), n=5)).alias("shingle")
        )
        .localCheckpoint(eager=False)
    )
    eval_shingles = postings.where("is_eval").select("shingle").distinct()
    hits = (
        postings.where(~F.col("is_eval"))
        .join(eval_shingles.hint("shuffle_hash"), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    # the output row base is every non-eval document (including zero-shingle
    # docs, which the explode drops from `postings`) — a plain column scan,
    # no shingling needed
    return (
        docs.where(~F.col("is_eval"))
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) >= 3).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


# engine-portable regexes (Java + RE2 common subset)
_EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
_PHONE_RE = "\\+1-555-[0-9]{4}"

_PII_ORACLE = f"""
    WITH seeded AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com or +1-555-' ||
             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           sha256(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                 '{_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_sha
    FROM seeded ORDER BY doc_id
    """


@query(
    "b47_pii_scrub",
    oracle=_PII_ORACLE,
    tags=("B47", "llm"),
    doc="PII scrubbing: synthetic emails/phones are seeded deterministically "
    "per document, then redacted with engine-portable regexes; the oracle "
    "matches the redaction COUNTS and the sha256 of the scrubbed text, "
    "proving byte-identical scrub output. Pure per-row JVM expressions — "
    "shuffle-free at any scale.",
)
def b47_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return seeded.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(_PHONE_RE)).cast("bigint").alias("n_phones"),
        F.sha2(scrubbed.cast("binary"), 256).alias("scrubbed_sha"),
    ).orderBy("doc_id")


_REPETITION_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents
    ),
    freq AS (
      SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           CAST(max(cnt) AS BIGINT) AS max_tok_cnt,
           round(CAST(max(cnt) AS DOUBLE) / sum(cnt) * 10000) / 10000 AS max_tok_frac,
           CAST(max(cnt) AS DOUBLE) / sum(cnt) > 0.08 AS repetitive
    FROM freq GROUP BY doc_id ORDER BY doc_id
    """


@query(
    "b47_repetition",
    oracle=_REPETITION_ORACLE,
    tags=("B47", "llm"),
    doc="Repetition quality signal (Gopher-style): per-document fraction of "
    "the most frequent token; documents above 8% are flagged repetitive. "
    "explode + two keyed hash aggregations on (doc_id, token) — partial "
    "aggregation keeps the shuffle at distinct-token width at 100 TB.",
)
def b47_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    freq = (
        docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    agg = freq.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.max("cnt").cast("bigint").alias("max_tok_cnt"),
    )
    frac = F.col("max_tok_cnt").cast("double") / F.col("n_tokens")
    return agg.select(
        "doc_id",
        "n_tokens",
        "max_tok_cnt",
        dround(frac, 4).alias("max_tok_frac"),
        (frac > 0.08).alias("repetitive"),
    ).orderBy("doc_id")
