"""Training-data assembly operators (round 5): sequence packing,
temperature resampling, unigram log-probability quality scoring, bigram
statistics — the steps between "cleaned corpus" and "training batches"
that a 100 TB data pipeline runs after dedup/filtering (llm_ops.py).

Determinism: every floating aggregate sums FIXED-PRECISION decimals (log
probabilities rounded to 6dp before summation), so results are exact and
order-independent — a raw float sum over shuffled rows differs run to run
in the last ulp, which a hash-matched oracle cannot tolerate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ._util import T, dround, tiny_sort

# whitespace tokenizer shared with llm_ops (same SQL counterpart)
_TOK_SQL = r"string_split_regex(lower(trim(text)), '\s+')"


def _toks():
    return F.split(F.lower(F.trim(F.col("text"))), r"\s+")


@query(
    "b56_sequence_packing",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, source, len({_TOK_SQL}) AS n_tokens FROM documents
    ),
    packed AS (
      SELECT doc_id, source, n_tokens,
             coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM d
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_before // 256 AS BIGINT) AS start_seq,
           CAST((cum_before + n_tokens - 1) // 256 AS BIGINT) AS end_seq,
           CAST((cum_before + n_tokens - 1) // 256 - cum_before // 256 + 1
                AS BIGINT) AS n_seqs
    FROM packed
    """,
    tags=("B37", "llm", "pack"),
    doc="GPT-style sequence packing: tokens are concatenated in doc_id order "
    "WITHIN each source shard and chunked into 256-token training "
    "sequences; emits each document's first/last sequence index and span. "
    "Partitioning by source is the scale story: the running sum is a "
    "per-shard window (parallel across shards), never a single global "
    "cumulative sum. Data-proportional output — no final sort (sorted-"
    "multiset comparison).",
)
def b56_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(_toks()).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = docs.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    # integer `div`, not double /: a double loses exactness past 2^53
    # cumulative tokens while the oracle's `//` stays exact at any magnitude
    start = F.expr("cum_before div 256")
    end = F.expr("(cum_before + n_tokens - 1) div 256")
    return packed.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        start.cast("bigint").alias("start_seq"),
        end.cast("bigint").alias("end_seq"),
        (end - start + 1).cast("bigint").alias("n_seqs"),
    )


@query(
    "b56_temperature_sampling",
    oracle="""
    WITH counts AS (
      SELECT lang, CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(count(*)) OVER () AS DOUBLE) AS total
      FROM documents GROUP BY lang
    ),
    w AS (  -- temperature alpha = 0.5 flattens the lang distribution.
            -- sqrt (unlike pow) is IEEE-correctly-rounded in both engines,
            -- and the weights are rounded to 9dp DECIMALs before the
            -- normalizing sum so it is exact and order-independent.
      SELECT lang, n, total,
             CAST(round(sqrt(n / total) * 1000000000) / 1000000000
                  AS DECIMAL(20,9)) AS wd
      FROM counts
    ),
    rates AS (
      SELECT lang,
             least(1.0, 0.5 * total
                   * (CAST(wd AS DOUBLE) / CAST(sum(wd) OVER () AS DOUBLE))
                   / n) AS keep_rate
      FROM w
    )
    SELECT doc_id, documents.lang AS lang,
           round(keep_rate * 10000) / 10000 AS keep_rate
    FROM documents JOIN rates ON documents.lang = rates.lang
    -- explicit floor: DuckDB's CAST(double AS BIGINT) rounds to nearest
    -- while Spark's truncates — a bare cast would put the two engines'
    -- thresholds one apart whenever the rate is not an exact 1/10000.
    -- The doc hash reduces doc_id by a prime BEFORE the Knuth multiply so
    -- the product never overflows int64 (Spark would silently wrap to a
    -- negative value — keeping every high doc_id — while the oracle errors).
    WHERE ((doc_id % 1000003) * 2654435761) % 10000
          < CAST(floor(keep_rate * 10000) AS BIGINT)
    """,
    tags=("B37", "llm", "pack"),
    doc="Temperature resampling across language groups (alpha = 0.5, "
    "target fraction 0.5): per-group keep rates flatten the skewed lang "
    "distribution, and membership is a deterministic Knuth multiplicative "
    "hash of doc_id against the group rate — reproducible at any scale, "
    "no RNG state. The rate table is group-cardinality-bounded "
    "(broadcastable); the fact side is filtered in one scan.",
)
def b56_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count("*").cast("double").alias("n"))
    wall = Window.partitionBy()
    rates = (
        counts.withColumn("total", F.sum("n").over(wall))
        # sqrt is correctly rounded (pow is not); 9dp-decimal weights make
        # the normalizing sum exact and order-independent — see the oracle
        .withColumn(
            "wd",
            (F.round(F.sqrt(F.col("n") / F.col("total")) * 1000000000) / 1000000000)
            .cast("decimal(20,9)"),
        )
        .withColumn(
            "keep_rate",
            F.least(
                F.lit(1.0),
                F.lit(0.5)
                * F.col("total")
                * (F.col("wd").cast("double") / F.sum("wd").over(wall).cast("double"))
                / F.col("n"),
            ),
        )
        .select("lang", "keep_rate")
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .where(
            # prime-reduce BEFORE the multiply: int64-overflow-safe (see oracle)
            ((F.col("doc_id") % 1000003) * F.lit(2654435761)) % 10000
            # floor on both sides (see oracle): bare casts round vs truncate
            < F.floor(F.col("keep_rate") * 10000).cast("bigint")
        )
        .select("doc_id", "lang", dround("keep_rate", 4).alias("keep_rate"))
    )


@query(
    "b56_unigram_logprob",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOK_SQL}) AS tok FROM documents
    ),
    vocab AS (
      SELECT tok, CAST(count(*) AS DOUBLE) AS cnt,
             CAST(sum(count(*)) OVER () AS DOUBLE) AS total
      FROM toks GROUP BY tok
    ),
    lp AS (  -- fixed-precision log-probs: exact, order-independent sums
      SELECT tok, CAST(round(log10(cnt / total) * 1000000) / 1000000
                       AS DECIMAL(12,6)) AS lp
      FROM vocab
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(CAST(sum(lp) AS DOUBLE) / count(*) AS DOUBLE) AS mean_logp
    FROM toks JOIN lp USING (tok)
    GROUP BY doc_id
    """,
    tags=("B37", "llm", "pack"),
    doc="CCNet-style unigram log-probability quality score: corpus unigram "
    "model → per-document mean log10 p(token). Low scores flag gibberish "
    "for filtering. The vocab relation is vocabulary-bounded "
    "(broadcastable at real scale); per-token log-probs are rounded to "
    "6dp and summed as DECIMAL so the aggregate is exact and "
    "shuffle-order-independent. Data-proportional output — no final sort.",
)
def b56_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        T(spark, sf_dir, "documents")
        .select("doc_id", F.explode(_toks()).alias("tok"))
    )
    wall = Window.partitionBy()
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").cast("double").alias("cnt"))
        .withColumn("total", F.sum("cnt").over(wall))
        .select(
            "tok",
            dround(F.log10(F.col("cnt") / F.col("total")), 6)
            .cast("decimal(12,6)")
            .alias("lp"),
        )
    )
    return (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            (F.sum("lp").cast("double") / F.count("*")).cast("double").alias("mean_logp"),
        )
    )


@query(
    "b56_bigram_stats",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, {_TOK_SQL} AS toks FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                    i -> toks[i] || ' ' || toks[i+1])) AS bigram
      FROM t
    ),
    uni AS (
      SELECT unnest(toks) AS tok FROM t
    ),
    bc AS (SELECT bigram, count(*) AS cnt FROM bg GROUP BY bigram),
    uc AS (SELECT tok, count(*) AS w1_cnt FROM uni GROUP BY tok)
    SELECT bigram, CAST(cnt AS BIGINT) AS cnt,
           round(CAST(cnt AS DOUBLE) / w1_cnt * 10000) / 10000 AS cond_prob
    FROM bc JOIN uc ON split_part(bigram, ' ', 1) = uc.tok
    ORDER BY cnt DESC, bigram
    LIMIT 20
    """,
    tags=("B37", "llm", "pack"),
    doc="Corpus bigram statistics: top-20 bigrams with the conditional "
    "probability p(w2 | w1) = cnt(w1 w2)/cnt(w1) — the n-gram LM building "
    "block (contamination n-gram indexes, repetition priors). Bigrams are "
    "built array-side (transform over the token array, no self-join); "
    "counts shuffle on the hashed bigram key; the unigram attach is a "
    "bounded-vocabulary broadcast.",
)
def b56_bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = T(spark, sf_dir, "documents").select(_toks().alias("toks"))
    bigrams = t.select(
        F.explode(
            F.expr(
                "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                " (x, i) -> concat(x, ' ', toks[i + 1]))"
            )
        ).alias("bigram")
    )
    unigrams = t.select(F.explode("toks").alias("tok"))
    bc = bigrams.groupBy("bigram").agg(F.count("*").cast("bigint").alias("cnt"))
    uc = unigrams.groupBy("tok").agg(F.count("*").alias("w1_cnt"))
    return (
        bc.join(
            F.broadcast(uc),
            F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)) == F.col("tok"),
        )
        .select(
            "bigram",
            "cnt",
            dround(F.col("cnt").cast("double") / F.col("w1_cnt"), 4).alias("cond_prob"),
        )
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(20)
    )


@query(
    "b56_epoch_shuffle",
    oracle="""
    WITH epochs AS (SELECT unnest(range(1, 4)) AS epoch),
    ranked AS (
      SELECT e.epoch, d.doc_id,
             row_number() OVER (
               PARTITION BY e.epoch
               ORDER BY CAST(('0x' || substr(sha256(
                           CAST(e.epoch AS VARCHAR) || ':' ||
                           CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
                        d.doc_id
             ) AS pos
      FROM documents d CROSS JOIN epochs e
      WHERE d.text IS NOT NULL
    )
    SELECT epoch,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(pos * doc_id) AS BIGINT) AS perm_checksum,
           string_agg(CAST(doc_id AS VARCHAR), ','
                      ORDER BY pos) FILTER (WHERE pos <= 5) AS head5
    FROM ranked
    GROUP BY epoch ORDER BY epoch
    """,
    tags=("B43", "llm", "sampling"),
    doc="Deterministic per-epoch training shuffle: each epoch's data order "
    "is the rank of sha256(epoch:doc_id) — a seeded permutation that is "
    "reproducible on any engine, any partitioning, any restart, with "
    "epochs differing from each other (the property a resumable trainer "
    "needs: epoch 7's order can be recomputed without storing it). "
    "The full-permutation checksum sum(pos*doc_id) pins the ENTIRE "
    "order, not just the sampled head. At 100 TB the rank is a sort key "
    "for a write — one range sort per epoch, or zero when the trainer "
    "reads shards in hash order directly.",
)
def b56_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    epochs = spark.range(1, 4).select(F.col("id").cast("int").alias("epoch"))
    rank = F.conv(
        F.substring(
            F.sha2(
                F.concat(
                    F.col("epoch").cast("string"),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                ).cast("binary"),
                256,
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy("epoch").orderBy(rank, "doc_id")
    ranked = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(epochs))
        .withColumn("pos", F.row_number().over(w))
    )
    out = ranked.groupBy("epoch").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("pos") * F.col("doc_id")).cast("bigint").alias("perm_checksum"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("pos") <= 5, F.struct("pos", "doc_id"))
                    )
                ),
                lambda s: s["doc_id"].cast("string"),
            ),
            ",",
        ).alias("head5"),
    )
    return tiny_sort(out, "epoch")
