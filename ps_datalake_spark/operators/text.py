"""Text analysis for training-data pipelines: token statistics, quality
scoring, language-ID heuristic, document fingerprinting, TF-IDF.

Everything is built-in JVM expressions (split / higher-order functions /
regexp) — no Python in the hot path — and every operator is exactly
expressible in ANSI SQL for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokenize

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# tiny function-word marker lists for the language-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht"),
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "los", "y", "que"),
    "fr": ("le", "la", "les", "et", "que"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token counts, length stats, stopword/punct ratios, quality score."""
    toks = tokenize(F.col(text_col))
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")), F.lit(0.0), lambda a, x: a + x
    )
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", ""))
    n_chars = F.length(F.col(text_col))
    return df.select(
        F.col(id_col),
        n_tokens.cast("bigint").alias("n_tokens"),
        n_distinct.cast("bigint").alias("n_distinct"),
        (total_len / n_tokens).alias("avg_token_len"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        (n_punct.cast("double") / n_chars).alias("punct_ratio"),
        # quality: long-enough docs with lexical diversity and sane stopword mass
        (
            F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
            + (n_distinct / n_tokens) * 0.4
            + F.least(n_stop.cast("double") / n_tokens * 5, F.lit(1.0)) * 0.2
        ).alias("quality"),
    )


# BPE-style pre-tokenizer (GPT-2-shaped, simplified): letter runs, digit
# runs, single punctuation runs — the unit a byte-pair tokenizer would merge
# from.  Alternation is leftmost-first in both Java regex (Spark) and RE2
# (DuckDB), and only literal character classes are used, so the SAME pattern
# string is portable across the engine and the oracle.
BPE_PRETOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Training-cost estimator stats: BPE-ish pre-token count vs whitespace
    word count per document (JVM regexp_count — no Python in the hot path).
    A real tokenizer splits further via merges, so the pre-token count is a
    deterministic lower bound with the right shape for budgeting."""
    bpe = F.regexp_count(F.col(text_col), F.lit(BPE_PRETOKEN_PATTERN))
    words = F.size(tokenize(F.col(text_col)))
    return df.select(
        F.col(id_col),
        bpe.cast("bigint").alias("n_bpe_tokens"),
        words.cast("bigint").alias("n_words"),
        (bpe.cast("double") / F.greatest(words, F.lit(1))).alias("bpe_per_word"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language guess: argmax of per-language marker hits
    (deterministic: ties break alphabetically via the struct max)."""
    toks = tokenize(F.col(text_col))
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("bigint")
        for lang, markers in LANG_MARKERS.items()
    }
    # argmax via greatest over (score, reversed-lang) structs: highest score,
    # then alphabetically first language.
    packed = [
        F.struct(score.alias("s"), F.lit(-i).alias("prio"), F.lit(lang).alias("lang"))
        for i, lang in enumerate(sorted(scores))
        for score in (scores[lang],)
    ]
    best = F.greatest(*packed)
    out = df.select(
        F.col(id_col),
        *[scores[lang].alias(f"hits_{lang}") for lang in sorted(scores)],
        best.getField("lang").alias("lang_guess"),
    )
    return out


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalization fingerprint: sha256 of lowercased, whitespace-collapsed text."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.select(
        F.col(id_col),
        F.sha2(norm.cast("binary"), 256).alias("fingerprint"),
        F.substring(F.sha2(norm.cast("binary"), 256), 1, 8).alias("fp_prefix"),
    )


def chunk_documents(
    df: DataFrame, id_col: str, text_col: str, window: int = 50, stride: int = 40
) -> DataFrame:
    """Split documents into overlapping token windows (training-data chunking).

    Chunk i covers tokens [i*stride+1, i*stride+window] (1-based); the number
    of chunks is 1 + ceil(max(n-window, 0)/stride) so the tail is always
    covered. Pure JVM expressions — exactly reproducible in SQL.
    """
    # token array materialized in its own projection: slicing the inline
    # split() inside the chunk-index lambda re-runs the regex split per
    # chunk — O(tokens^2/stride) per document (the b70_memorization_rate
    # defect class caught by the round-6 scale re-measure)
    tw = df.select(F.col(id_col), tokenize(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    n_chunks = 1 + F.ceil(F.greatest(n - window, F.lit(0)) / F.lit(stride)).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i * stride + 1, window)))
    return tw.select(
        F.col(id_col).alias("doc"),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    ).select(
        "doc",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size(F.split(F.col("chunk_text"), r"\s+")).cast("bigint").alias("chunk_tokens"),
        F.sha2(F.col("chunk_text").cast("binary"), 256).alias("chunk_sha"),
    )


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str, k: int = 1) -> DataFrame:
    """Top-k TF-IDF terms per document (exact, join-based — not HashingTF — so
    the result is oracle-checkable; idf = ln(N / df))."""
    from pyspark.sql.window import Window

    toks = df.select(F.col(id_col).alias("doc"), F.explode(tokenize(F.col(text_col))).alias("term"))
    tf = toks.groupBy("doc", "term").agg(F.count("*").alias("tf"))
    n_docs = df.select(F.countDistinct(id_col).alias("n"))
    dfreq = toks.distinct().groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc",
            "term",
            (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("doc", "term", "tfidf", F.col("rnk").cast("bigint").alias("rnk"))
    )
