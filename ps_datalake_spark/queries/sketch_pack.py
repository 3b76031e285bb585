"""Probabilistic-sketch operators: Count-Min frequency sketch and Bloom
membership filter — the two mergeable sketches a 100 TB ingest pipeline
leans on for heavy-hitter tracking and join pruning.

Scale design notes (100 TB):
  * Count-Min (Cormode & Muthukrishnan 2005): the sketch is a d×w counter
    grid whose cells are ASSOCIATIVE sums — each executor folds its token
    stream into partial (row, bucket) counts map-side, and the reduce merges
    d·w bounded cells regardless of corpus size.  That is exactly a Spark
    hash aggregate on (seed, bucket): the shuffle carries at most d·w rows
    per map task, never the posting stream.  Estimation joins the query
    terms (a bounded relation) against the 4 096-cell sketch — broadcast,
    shuffle-free.
  * Bloom filter: the bit array is the DISTINCT set of k·|build| hash
    positions — a bounded relation (≤ m rows) built with one map-side
    combined aggregate over the build keys.  Probing broadcasts the bit
    relation and needs no shuffle of the probe stream; false positives are
    counted against a ground-truth semi-join.  This is the same runtime
    shape Spark's own AQE "runtime bloom filter" injects on the build side
    of large joins — materialised here explicitly so membership semantics
    (k bits all set) are oracle-checkable.
  * Both hash families derive from sha256 over a seed-tagged key — the
    engine-portable hash this repo standardises on (sampling_rollup._hash_pct)
    so Spark and DuckDB compute bit-identical positions.

Determinism: counters and bit positions are exact integers end-to-end; no
floating point anywhere in either query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ._util import T, tiny_sort
from ._util import stage_stream_files as _stage_stream_files

_CMS_SEEDS = ("s0", "s1", "s2", "s3")  # d = 4 sketch rows
_CMS_W = 1024                           # buckets per row
_BLOOM_SEEDS = ("b0", "b1", "b2")       # k = 3 hash functions
_BLOOM_M = 8192                         # bit-array size


def _pos(seed: str, key: Column, mod: int) -> Column:
    """Engine-portable hash position: first 8 hex digits of sha256 of the
    seed-tagged key, mod the table width (sha256 bytes are identical on any
    engine; 8 hex digits = 32 bits fits BIGINT exactly)."""
    tagged = F.concat(F.lit(seed + "|"), key.cast("string")).cast("binary")
    return F.conv(F.substring(F.sha2(tagged, 256), 1, 8), 16, 10).cast("bigint") % mod


_POS_SQL = "CAST(('0x' || substr(sha256({seed} || '|' || CAST({k} AS VARCHAR)), 1, 8)) AS BIGINT) % {mod}"


def _cms_seed_values() -> str:
    return ", ".join(f"('{s}')" for s in _CMS_SEEDS)


@query(
    "b75_countmin_heavy",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents WHERE text IS NOT NULL
    ),
    t AS (SELECT term FROM toks WHERE term <> ''),
    seeds AS (SELECT seed FROM (VALUES {_cms_seed_values()}) AS s(seed)),
    exact AS (SELECT term, count(*) AS exact_cnt FROM t GROUP BY 1),
    cells AS (
      SELECT seed, {_POS_SQL.format(seed='seed', k='term', mod=_CMS_W)} AS bucket,
             sum(exact_cnt) AS cell_cnt
      FROM exact CROSS JOIN seeds
      GROUP BY 1, 2
    ),
    tot AS (SELECT sum(exact_cnt) AS tot FROM exact),
    heavy AS (
      SELECT term, exact_cnt FROM exact, tot WHERE exact_cnt * 1000 > tot
    ),
    probe AS (
      SELECT e.term, e.exact_cnt, s.seed,
             {_POS_SQL.format(seed='s.seed', k='e.term', mod=_CMS_W)} AS bucket
      FROM heavy e CROSS JOIN seeds s
    )
    SELECT p.term,
           CAST(min(p.exact_cnt) AS BIGINT) AS exact_cnt,
           CAST(min(c.cell_cnt) AS BIGINT) AS est_cnt,
           CAST(min(c.cell_cnt) - min(p.exact_cnt) AS BIGINT) AS overcount
    FROM probe p JOIN cells c ON c.seed = p.seed AND c.bucket = p.bucket
    GROUP BY p.term ORDER BY p.term
    """,
    tags=("B12", "llm", "sketch"),
    doc="Count-Min sketch (d=4, w=1024) over the document token stream: the "
    "occurrence stream pre-reduces to (term, weight) partials map-side, "
    "the weighted inserts fold into the bounded d*w counter grid, and the "
    "point estimate is min over the d rows.  Reported terms are the heavy "
    "hitters (count > total/1000, a strict relative-frequency threshold — "
    "fewer than 1000 terms at ANY corpus size since 1000 disjoint counts "
    "each strictly above total/1000 would sum past the total, so the report "
    "is bounded, never vocabulary-proportional) with exact "
    "counts alongside; the overcount column is the sketch's collision "
    "error, >=0 by construction.",
)
def b75_countmin_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # Explicit [ \t\n\r\f] split class = RE2's \s exactly (the oracle's
    # string_split_regex '\s+'): Java's \s additionally matches \v (\x0b),
    # so a vertical-tab-bearing document would tokenize differently under
    # the old r"\s+" — the same divergence class the advisor flagged on
    # b82 (r9 retune; values at fixture scale unchanged).
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim("text")), "[ \t\n\r\f]+")).alias("term")
    ).where(F.col("term") != "")

    # Pre-reduce the occurrence stream to (term, weight) — the map-side
    # combine a CMS build does anyway (weighted inserts are standard).  The
    # shuffle then carries distinct-terms-per-partition, and sha256 runs 4×
    # per DISTINCT term, not 4× per occurrence (measured 35 s → ~1 s at the
    # 10× corpus).  The cell sums are identical by associativity.
    exact = toks.groupBy("term").agg(F.count("*").alias("exact_cnt"))

    # Weighted fold of the reduced stream into the mergeable d×w counter
    # grid (4096 cells).
    pairs = exact.select(
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _pos(s, F.col("term"), _CMS_W).alias("bucket"),
                    )
                    for s in _CMS_SEEDS
                ]
            )
        ).alias("sb"),
    )
    cells = pairs.groupBy("sb.seed", "sb.bucket").agg(F.sum("exact_cnt").alias("cell_cnt"))

    # Heavy-hitter cut: report only terms strictly above total/1000 — fewer
    # than 1000 terms can clear a strict relative-frequency threshold at ANY
    # corpus size, so the report relation (and its one-task sort) is bounded,
    # never vocabulary-proportional.
    tot = exact.agg(F.sum("exact_cnt").alias("tot"))
    heavy = (
        exact.crossJoin(F.broadcast(tot))
        .where(F.col("exact_cnt") * 1000 > F.col("tot"))
        .select("term", "exact_cnt")
    )

    probe = heavy.select(
        "term",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _pos(s, F.col("term"), _CMS_W).alias("bucket"),
                    )
                    for s in _CMS_SEEDS
                ]
            )
        ).alias("sb"),
    ).select("term", "exact_cnt", "sb.seed", "sb.bucket")

    est = (
        probe.join(F.broadcast(cells), ["seed", "bucket"])
        .groupBy("term")
        .agg(
            F.min("exact_cnt").cast("bigint").alias("exact_cnt"),
            F.min("cell_cnt").cast("bigint").alias("est_cnt"),
            (F.min("cell_cnt") - F.min("exact_cnt")).cast("bigint").alias("overcount"),
        )
    )
    return tiny_sort(est, "term")


def _bloom_seed_values() -> str:
    return ", ".join(f"('{s}')" for s in _BLOOM_SEEDS)


@query(
    "b75_bloom_filter",
    oracle=f"""
    WITH build AS (SELECT DISTINCT o_custkey AS key FROM orders),
    seeds AS (SELECT seed FROM (VALUES {_bloom_seed_values()}) AS s(seed)),
    bits AS (
      SELECT DISTINCT {_POS_SQL.format(seed='seed', k='key', mod=_BLOOM_M)} AS pos
      FROM build CROSS JOIN seeds
    ),
    probe AS (SELECT c_custkey * 7 + 3 AS probe_key FROM customer),
    hits AS (
      SELECT p.probe_key,
             sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
      FROM (SELECT probe_key, seed,
                   {_POS_SQL.format(seed='seed', k='probe_key', mod=_BLOOM_M)} AS pos
            FROM probe CROSS JOIN seeds) p
      LEFT JOIN bits b ON p.pos = b.pos
      GROUP BY 1
    ),
    truth AS (
      SELECT h.probe_key, h.n_hit,
             CASE WHEN bl.key IS NOT NULL THEN 1 ELSE 0 END AS present
      FROM hits h LEFT JOIN build bl ON h.probe_key = bl.key
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probe,
           CAST(sum(CASE WHEN n_hit = {len(_BLOOM_SEEDS)} THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
           CAST(sum(present) AS BIGINT) AS n_present,
           CAST(sum(CASE WHEN n_hit = {len(_BLOOM_SEEDS)} AND present = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           CAST(sum(CASE WHEN n_hit = {len(_BLOOM_SEEDS)} AND present = 0 THEN probe_key ELSE 0 END) AS BIGINT) AS fp_checksum,
           CAST(sum(CASE WHEN present = 1 AND n_hit < {len(_BLOOM_SEEDS)} THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg
    FROM truth
    """,
    tags=("B7", "sketch"),
    doc="Bloom membership filter (m=8192 bits, k=3): the bit array is the "
    "DISTINCT hash-position relation derived from the distinct build keys "
    "(two chained bounded exchanges, both map-side combined — the r8 "
    "verdict's proposed single-pass fold was MEASURED AND REJECTED: "
    "exploding raw keys before the distinct multiplies the "
    "corpus-proportional partial-agg input by k+1 and ran 2.20 s vs "
    "1.35 s chained at 10x; see the body comment and PLANS.md round-9), "
    "broadcast and probed shuffle-free by a shifted customer key set so "
    "present/absent/false-positive regimes all occur.  Ground truth is "
    "an exact broadcast join; n_false_neg is the no-false-negatives "
    "invariant (must be 0).  Runtime shape of Spark's AQE bloom-filter "
    "join pruning, materialised oracle-checkably.",
)
def b75_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = len(_BLOOM_SEEDS)
    # Build side: distinct keys FIRST, then the (bounded) distinct-position
    # relation derived from them — two chained exchanges, both map-side
    # combined, the second's input only k*|distinct keys| rows.  The r8
    # verdict (#4) asked whether folding both into ONE aggregation pass
    # (explode each RAW key into 2*key / 2*pos_i+1 parity-tagged bigints,
    # one distinct, one broadcast reused k+1 times) is faster: measured
    # interleaved min-of-3 at 10x says NO — 2.20 s folded vs 1.35 s
    # chained — because explode-before-distinct multiplies the partial
    # aggregation's input over the CORPUS-PROPORTIONAL relation by (k+1)
    # (60M vs 15M rows through the hash), which costs far more than the
    # saved bounded exchange (~450k rows).  A tag-column variant is worse
    # still: the tag equality rides the join condition, Catalyst pushes it
    # below the aggregate, and the build splits into k+1 separate
    # scan+distinct subtrees (measured 2.2 s, zero exchange reuse).  The
    # chained shape is the audited floor; see PLANS.md round-9.
    build = T(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key")).distinct()
    bits = (
        build.select(
            F.explode(
                F.array(*[_pos(s, F.col("key"), _BLOOM_M) for s in _BLOOM_SEEDS])
            ).alias("pos")
        )
        .distinct()
        .withColumn("bit_set", F.lit(1))
    )
    probe = T(spark, sf_dir, "customer").select(
        (F.col("c_custkey") * 7 + 3).alias("probe_key")
    )
    # Probe side is SHUFFLE-FREE (r7 verdict #5, the countmin treatment):
    # k broadcast hash joins of the SAME bits subtree (alias only, so
    # exchange reuse builds the hash relation once) — all map-side, one
    # codegen stage; n_hit folds as a row-local sum and the exact truth is
    # one more broadcast join against the distinct keys.
    hits = probe
    for i, s in enumerate(_BLOOM_SEEDS):
        hits = hits.withColumn(f"_p{i}", _pos(s, F.col("probe_key"), _BLOOM_M))
    bcast = F.broadcast(bits)
    for i in range(k):
        hits = hits.join(
            bcast.alias(f"_b{i}"),
            F.col(f"_p{i}") == F.col(f"_b{i}.pos"),
            "left",
        )
    hits = hits.select(
        "probe_key",
        sum(
            [F.coalesce(F.col(f"_b{i}.bit_set"), F.lit(0)) for i in range(k)],
            F.lit(0),
        ).alias("n_hit"),
    )
    truth = hits.join(
        F.broadcast(
            build.withColumnRenamed("key", "probe_key").withColumn(
                "present", F.lit(1)
            )
        ),
        "probe_key",
        "left",
    ).withColumn("present", F.coalesce(F.col("present"), F.lit(0)))
    maybe = F.col("n_hit") == k
    return truth.agg(
        F.count("*").cast("bigint").alias("n_probe"),
        F.sum(F.when(maybe, 1).otherwise(0)).cast("bigint").alias("n_maybe"),
        F.sum("present").cast("bigint").alias("n_present"),
        F.sum(F.when(maybe & (F.col("present") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_pos"),
        F.sum(F.when(maybe & (F.col("present") == 0), F.col("probe_key")).otherwise(0))
        .cast("bigint")
        .alias("fp_checksum"),
        F.sum(F.when((F.col("present") == 1) & (F.col("n_hit") < k), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_neg"),
    )


_QSK_R = 100  # systematic-sample stride: each per-day summary keeps n_d/R rows


@query(
    "b83_quantile_sketch_merge",
    oracle=f"""
    WITH ev AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, event_id,
             CAST(round(value * 1000000.0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    s AS (
      SELECT d, v, event_id,
             row_number() OVER (PARTITION BY d ORDER BY v, event_id) AS rn,
             count(*) OVER (PARTITION BY d) AS nd
      FROM ev
    ),
    summ AS (
      SELECT d, v, rn, least({_QSK_R}, nd - rn + 1) AS w
      FROM s WHERE (rn - 1) % {_QSK_R} = 0
    ),
    m AS (
      SELECT v, d, rn,
             sum(w) OVER (ORDER BY v, d, rn ROWS UNBOUNDED PRECEDING) AS cum,
             sum(w) OVER () AS tot
      FROM summ
    ),
    e AS (
      SELECT
        CAST(min(CASE WHEN cum >= (tot + 1) // 2 THEN v END) AS BIGINT) AS est_p50_e6,
        CAST(min(CASE WHEN cum >= (9 * tot + 9) // 10 THEN v END) AS BIGINT) AS est_p90_e6,
        CAST(min(CASE WHEN cum >= (99 * tot + 99) // 100 THEN v END) AS BIGINT) AS est_p99_e6,
        CAST(count(*) AS BIGINT) AS summary_rows
      FROM m
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           e.summary_rows,
           e.est_p50_e6,
           CAST(abs(sum(CASE WHEN ev.v <= e.est_p50_e6 THEN 1 ELSE 0 END)
                    - (count(*) + 1) // 2) AS BIGINT) AS err_p50,
           e.est_p90_e6,
           CAST(abs(sum(CASE WHEN ev.v <= e.est_p90_e6 THEN 1 ELSE 0 END)
                    - (9 * count(*) + 9) // 10) AS BIGINT) AS err_p90,
           e.est_p99_e6,
           CAST(abs(sum(CASE WHEN ev.v <= e.est_p99_e6 THEN 1 ELSE 0 END)
                    - (99 * count(*) + 99) // 100) AS BIGINT) AS err_p99
    FROM ev, e
    GROUP BY e.summary_rows, e.est_p50_e6, e.est_p90_e6, e.est_p99_e6
    """,
    tags=("B12", "sketch"),
    doc="MERGEABLE quantile summaries (the b60_hll_merge complement, "
    "KLL/MRL-shaped but fully deterministic so the oracle is value-exact): "
    "each day builds its summary INDEPENDENTLY — a systematic rank sample "
    "(every R-th order statistic, weight = covered run length), the "
    "deterministic cousin of an MRL compactor level — and the merge is a "
    "weighted union whose cumulative-weight rank lookup answers any "
    "quantile with error <= R per contributing summary.  The err_* "
    "columns measure the TRUE rank distance of each estimate against the "
    "raw data (one extra aggregate pass), witnessing the bound.  Scale "
    "shape: summary build is one per-day window over the same exchange as "
    "any per-day rollup; each summary is n_d/R rows, so the merged "
    "relation is corpus/R — the bounded-state contract of a mergeable "
    "sketch; R scales with corpus so the merge stays driver-light.",
)
def b83_quantile_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    R = _QSK_R
    ev = (
        T(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            F.date_trunc("day", F.col("ts")).alias("d"),
            "event_id",
            F.round(F.col("value") * 1000000.0).cast("bigint").alias("v"),
        )
    )
    wday = Window.partitionBy("d").orderBy("v", "event_id")
    s = ev.withColumn("rn", F.row_number().over(wday)).withColumn(
        "nd", F.count("*").over(Window.partitionBy("d"))
    )
    summ = s.where((F.col("rn") - 1) % R == 0).select(
        "d", "v", "rn", F.least(F.lit(R), F.col("nd") - F.col("rn") + 1).alias("w")
    )
    wm = (
        Window.orderBy("v", "d", "rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = summ.select(
        "v",
        F.sum("w").over(wm).alias("cum"),
        F.sum("w").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("tot"),
    )

    def est(num: int, den: int, name: str):
        return F.min(
            F.when(F.col("cum") >= F.expr(f"({num} * tot + {num}) DIV {den}"), F.col("v"))
        ).cast("bigint").alias(name)

    e = m.agg(
        est(1, 2, "est_p50_e6"),
        est(9, 10, "est_p90_e6"),
        est(99, 100, "est_p99_e6"),
        F.count("*").cast("bigint").alias("summary_rows"),
    )

    def err(num: int, den: int, est_col: str, name: str):
        return F.abs(
            F.sum(F.when(F.col("v") <= F.col(est_col), 1).otherwise(0))
            - F.expr(f"({num} * count(*) + {num}) DIV {den}")
        ).cast("bigint").alias(name)

    return ev.join(F.broadcast(e)).groupBy(
        "summary_rows", "est_p50_e6", "est_p90_e6", "est_p99_e6"
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        err(1, 2, "est_p50_e6", "err_p50"),
        err(9, 10, "est_p90_e6", "err_p90"),
        err(99, 100, "est_p99_e6", "err_p99"),
    ).select(
        "n", "summary_rows",
        "est_p50_e6", "err_p50",
        "est_p90_e6", "err_p90",
        "est_p99_e6", "err_p99",
    )


_HH_T = 500   # relative-frequency threshold denominator: heavy = cnt*T > n
_HH_S = 16    # merge shards (any partitioning works; doc_id mod S here)


@query(
    "b84_heavy_hitters_merge",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id % {_HH_S} AS shard,
             unnest(string_split_regex(lower(trim(text)),
                                       '[ \\t\\n\\r\\f]+')) AS term
      FROM documents WHERE text IS NOT NULL
    ),
    t AS (SELECT shard, term FROM toks WHERE term <> ''),
    cnts AS (SELECT shard, term, count(*) AS c FROM t GROUP BY 1, 2),
    sn AS (SELECT shard, sum(c) AS ns FROM cnts GROUP BY 1),
    summ AS (
      SELECT c.term, c.c FROM cnts c JOIN sn USING (shard)
      WHERE c.c * {_HH_T} > sn.ns
    ),
    cand AS (SELECT term, sum(c) AS est FROM summ GROUP BY 1),
    truth AS (SELECT term, sum(c) AS cnt FROM cnts GROUP BY 1),
    tot AS (SELECT sum(ns) AS n, sum(ns // {_HH_T}) AS bound FROM sn),
    hh AS (SELECT term, cnt FROM truth, tot WHERE cnt * {_HH_T} > n),
    miss AS (SELECT count(*) AS missed FROM hh
             WHERE term NOT IN (SELECT term FROM cand)),
    err AS (SELECT coalesce(max(t2.cnt - cand.est), 0) AS max_under
            FROM cand JOIN truth t2 USING (term))
    SELECT CAST(tot.n AS BIGINT) AS n_tokens,
           CAST({_HH_S} AS BIGINT) AS n_shards,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT count(*) FROM hh) AS BIGINT) AS n_true_hh,
           CAST(miss.missed AS BIGINT) AS n_missed_true_hh,
           CAST(err.max_under AS BIGINT) AS max_undercount,
           CAST(tot.bound AS BIGINT) AS undercount_bound,
           CAST(CASE WHEN err.max_under <= tot.bound THEN 1 ELSE 0 END
                AS BIGINT) AS within_bound
    FROM tot, miss, err
    """,
    tags=("B12", "sketch"),
    doc="MERGEABLE heavy-hitters summaries (r8 verdict #9, the second "
    "estimator off the b83 weighted-union scaffold; deterministic, so the "
    "oracle is value-exact): each shard builds its summary INDEPENDENTLY "
    "— the terms strictly above the LOCAL relative-frequency threshold "
    "(cnt*T > n_shard), at most T-1 rows per shard — and the merge is a "
    "weighted union (sum of retained counts).  Pigeonhole gives the "
    "coverage guarantee this query WITNESSES exactly: a term with global "
    "cnt*T > n must clear the local threshold in >= 1 shard (else "
    "summing cnt_s*T <= n_s over shards contradicts it), so "
    "n_missed_true_hh is 0 by mathematics, not luck; the undercount of "
    "any merged estimate is bounded by sum(floor(n_s/T)) and "
    "within_bound pins it.  Scale shape: ONE corpus-proportional "
    "map-side-combined exchange (the (shard, term) count); every later "
    "relation derives from it — shard totals (S rows), summaries "
    "(<= S*(T-1) rows), the merged candidate set, and the vocabulary "
    "truth relation (vocab-sized, never corpus-sized) — so the merge "
    "stays bounded at any corpus size, the mergeable-summaries collapse. "
    "Tokenizer class [ \\t\\n\\r\\f] matches RE2's \\s exactly on both "
    "sides (the b82 discipline).",
)
def b84_heavy_hitters_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    T_, S = _HH_T, _HH_S
    toks = (
        T(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            F.pmod(F.col("doc_id"), F.lit(S)).alias("shard"),
            F.explode(
                F.split(F.lower(F.trim("text")), "[ \t\n\r\f]+")
            ).alias("term"),
        )
        .where(F.col("term") != "")
    )
    # THE corpus exchange: per-(shard, term) counts, map-side combined.
    # The three derived relations below (sn, truth, summ) are the only
    # consumers — each is one aggregation pass over the REUSED exchange
    # output (plan-audited: the shuffle's map side runs once; an earlier
    # draft derived six metric branches separately and re-ran a
    # vocab-sized pass per branch — measured 3.8 s vs 1.58 s at 10x).
    cnts = toks.groupBy("shard", "term").agg(F.count("*").alias("c"))
    sn = cnts.groupBy("shard").agg(F.sum("c").alias("ns"))
    summ = cnts.join(F.broadcast(sn), "shard").where(
        F.col("c") * T_ > F.col("ns")
    )
    cand = summ.groupBy("term").agg(F.sum("c").alias("est"))
    truth = cnts.groupBy("term").agg(F.sum("c").alias("cnt"))
    tot = sn.agg(
        F.sum("ns").cast("bigint").alias("n"),
        F.sum(F.expr(f"ns DIV {T_}")).cast("bigint").alias("bound"),
    )
    # ONE metrics pass: every output statistic folds out of the single
    # truth (left) JOIN candidates relation — candidate membership is
    # est NOT NULL, heavy-hitter truth is cnt*T > n (n attached from the
    # broadcast 1-row tot), the pigeonhole witness is their conjunction
    # with a missing estimate, and the undercount ranges over candidates.
    is_cand = F.col("est").isNotNull()
    is_hh = F.col("cnt") * T_ > F.col("n")
    return (
        truth.crossJoin(F.broadcast(tot))
        .join(F.broadcast(cand), "term", "left")
        .agg(
            F.max("n").cast("bigint").alias("n_tokens"),
            F.lit(S).cast("bigint").alias("n_shards"),
            F.sum(F.when(is_cand, 1).otherwise(0))
            .cast("bigint").alias("n_candidates"),
            F.sum(F.when(is_hh, 1).otherwise(0))
            .cast("bigint").alias("n_true_hh"),
            F.sum(F.when(is_hh & ~is_cand, 1).otherwise(0))
            .cast("bigint").alias("n_missed_true_hh"),
            F.coalesce(
                F.max(F.when(is_cand, F.col("cnt") - F.col("est"))), F.lit(0)
            ).cast("bigint").alias("max_undercount"),
            F.max("bound").cast("bigint").alias("undercount_bound"),
            F.when(
                F.coalesce(
                    F.max(F.when(is_cand, F.col("cnt") - F.col("est"))),
                    F.lit(0),
                )
                <= F.max("bound"),
                1,
            ).otherwise(0).cast("bigint").alias("within_bound"),
        )
    )


_KMV_K = 256                      # sketch size: k smallest hash values
_KMV_M = 1 << 48                  # hash space: first 12 hex digits of sha256


@query(
    "b85_kmv_distinct_merge",
    oracle=f"""
    WITH ev AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
             user_id || '|' || event_type || '|' ||
               CAST(CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS VARCHAR) AS key
      FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    dk AS (SELECT DISTINCT d, key FROM ev),
    hd AS (
      SELECT DISTINCT d,
             CAST(('0x' || substr(sha256(key), 1, 12)) AS BIGINT) AS hv
      FROM dk
    ),
    day_summ AS (
      SELECT d, hv FROM (
        SELECT d, hv, row_number() OVER (PARTITION BY d ORDER BY hv) AS rn
        FROM hd
      ) WHERE rn <= {_KMV_K}
    ),
    merged AS (SELECT DISTINCT hv FROM day_summ),
    mk AS (
      SELECT count(*) AS ck, CAST(coalesce(max(hv), 0) AS BIGINT) AS kth,
             CAST(coalesce(sum(hv), 0) AS BIGINT) AS sk
      FROM (SELECT hv FROM merged ORDER BY hv LIMIT {_KMV_K})
    ),
    gk AS (
      SELECT count(*) AS ck, CAST(coalesce(max(hv), 0) AS BIGINT) AS kth,
             CAST(coalesce(sum(hv), 0) AS BIGINT) AS sk
      FROM (SELECT hv FROM (SELECT DISTINCT hv FROM hd)
            ORDER BY hv LIMIT {_KMV_K})
    ),
    ex AS (SELECT count(*) AS exact_d
           FROM (SELECT DISTINCT key FROM dk)),
    nd AS (SELECT count(DISTINCT d) AS n_days FROM hd),
    mr AS (SELECT count(*) AS merged_rows FROM merged),
    est AS (
      SELECT CASE WHEN mk.ck >= {_KMV_K}
                  THEN ({_KMV_K - 1} * {_KMV_M}) // mk.kth
                  ELSE mr.merged_rows END AS kmv_est
      FROM mk, mr
    )
    SELECT CAST(nd.n_days AS BIGINT) AS n_days,
           CAST(mr.merged_rows AS BIGINT) AS merged_rows,
           CAST(ex.exact_d AS BIGINT) AS exact_distinct,
           CAST(mk.kth AS BIGINT) AS kth_merged,
           CAST(est.kmv_est AS BIGINT) AS kmv_est,
           CAST(abs(est.kmv_est - ex.exact_d) * 10000 // ex.exact_d
                AS BIGINT) AS err_bp,
           CAST(CASE WHEN mk.kth = gk.kth AND mk.sk = gk.sk
                     THEN 1 ELSE 0 END AS BIGINT) AS merge_lossless
    FROM nd, mr, ex, mk, gk, est
    """,
    tags=("B12", "sketch"),
    doc="MERGEABLE distinct-count summaries — KMV (k minimum values, "
    "Bar-Yossef et al. 2002), the distinct-over-window half of the b83/"
    "b84 mergeable-summaries family, fully deterministic (the repo's "
    "portable sha256 hash) so the oracle is value-exact: each day keeps "
    "the k smallest hash values of its distinct (user, type, hour) "
    "activity keys; the merge is the k smallest of the union, and the "
    "estimator is the integer (k-1)*M DIV h_(k).  merge_lossless "
    "WITNESSES the mergeable property exactly — the kth minimum and the "
    "k-minima sum computed from the merged per-day summaries equal the "
    "same statistics computed directly on the full stream (each global "
    "k-minimum is necessarily inside its day's k minima) — and err_bp "
    "records the estimate's true relative error in basis points against "
    "the exact distinct count.  Scale shape (r10 retune, measured at the "
    "10x probe: 0.70 -> 0.60 s): one corpus-proportional map-side-combined "
    "groupBy(key) exchange feeds the day/count branches.  The key "
    "embeds the HOUR, and the hour determines the day (d = hour DIV 24), "
    "so groupBy(key) with min(d) IS distinct(d, key) and exact_d is its "
    "free count(*); the r9 draft paid five corpus-sized distinct "
    "exchanges for the same relations.  sha256 runs once per DISTINCT "
    "key (the b75-CMS pre-reduction discipline).  The per-day summary is "
    "one window over the derived (d, hv) rows using dense_rank (ties = "
    "48-bit collisions collapse in the merged distinct, so the kept "
    "DISTINCT-hv set per day is exactly the oracle's row_number-over-"
    "distinct set); the merged relation is <= k*days rows, n_days reads "
    "the bounded day summary (every day keeps >= 1 row), and both "
    "k-minima probes are TakeOrdered (per-partition top-k + bounded "
    "driver merge), never a global sort.  The global witness probe keeps "
    "its own distinct over the derived hv column — column pruning "
    "specializes its subtree to a bare distinct-key exchange plus the "
    "distinct-hv exchange (so the executed plan carries these alongside "
    "the min(d) exchange; forcing subtree identity with a pruning "
    "barrier was measured SLOWER, 0.98-1.04 vs 0.86-0.94 s interleaved "
    "at 10x) — because deriving the witness from the merged summaries "
    "would make merge_lossless circular (a kth_m-threshold prefilter "
    "variant was also measured and rejected: 0.77 s vs 0.60 s at 10x, "
    "it serializes the witness branch behind the full day-summary "
    "chain; PLANS.md round-10).",
)
def b85_kmv_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    K, M = _KMV_K, _KMV_M
    ev = (
        T(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
        .select(
            F.expr("CAST(unix_timestamp(ts) AS BIGINT) DIV 86400").alias("d"),
            F.concat_ws(
                "|",
                F.col("user_id").cast("string"),
                F.col("event_type"),
                F.expr("CAST(unix_timestamp(ts) AS BIGINT) DIV 3600").cast(
                    "string"
                ),
            ).alias("key"),
        )
    )
    # The corpus exchange (see docstring: min(d) is exact because the key
    # embeds the hour).  The day/count branches share it; the witness
    # branch prunes to its own bare distinct-key subtree (measured cheaper
    # than forcing identity — docstring).  ReusedExchange is plan-pinned.
    kd = ev.groupBy("key").agg(F.min("d").alias("d"))
    kh = kd.select(
        "d",
        F.conv(F.substring(F.sha2(F.col("key").cast("binary"), 256), 1, 12),
               16, 10).cast("bigint").alias("hv"),
    )
    day_summ = (
        kh.withColumn(
            "rk", F.dense_rank().over(Window.partitionBy("d").orderBy("hv"))
        )
        .where(F.col("rk") <= K)
        .select("d", "hv")
    )
    merged = day_summ.select("hv").distinct()

    def kmin_stats(rel: DataFrame, ck: str, kth: str, sk: str) -> DataFrame:
        """k-minima statistics via TakeOrdered (bounded), never a full sort."""
        return rel.orderBy("hv").limit(K).agg(
            F.count("*").alias(ck),
            F.coalesce(F.max("hv"), F.lit(0)).cast("bigint").alias(kth),
            F.coalesce(F.sum("hv"), F.lit(0)).cast("bigint").alias(sk),
        )

    mk = kmin_stats(merged, "ck_m", "kth_m", "sk_m")
    gk = kmin_stats(kh.select("hv").distinct(), "ck_g", "kth_g", "sk_g")
    ex = kh.agg(F.count("*").cast("bigint").alias("exact_d"))
    nd = day_summ.select("d").distinct().agg(
        F.count("*").cast("bigint").alias("n_days")
    )
    mr = merged.agg(F.count("*").cast("bigint").alias("merged_rows"))
    est = F.when(
        F.col("ck_m") >= K, F.expr(f"({K - 1} * CAST({M} AS BIGINT)) DIV kth_m")
    ).otherwise(F.col("merged_rows"))
    return (
        nd.crossJoin(F.broadcast(mr))
        .crossJoin(F.broadcast(ex))
        .crossJoin(F.broadcast(mk))
        .crossJoin(F.broadcast(gk))
        .withColumn("kmv_est", est.cast("bigint"))
        .select(
            "n_days",
            "merged_rows",
            "exact_d",
            F.col("kth_m").alias("kth_merged"),
            "kmv_est",
            (
                F.abs(F.col("kmv_est") - F.col("exact_d")) * 10000
            ).cast("bigint").alias("_num"),
            F.col("kth_g"),
            F.col("sk_m"),
            F.col("sk_g"),
        )
        .select(
            "n_days",
            "merged_rows",
            F.col("exact_d").alias("exact_distinct"),
            "kth_merged",
            "kmv_est",
            F.expr("_num DIV exact_d").cast("bigint").alias("err_bp"),
            F.when(
                (F.col("kth_merged") == F.col("kth_g"))
                & (F.col("sk_m") == F.col("sk_g")),
                1,
            ).otherwise(0).cast("bigint").alias("merge_lossless"),
        )
    )


@query(
    "b86_kmv_incremental_refresh",
    oracle=f"""
    WITH ev AS (
      SELECT user_id || '|' || event_type AS key,
             max(CASE WHEN event_id % 4 <> 0 THEN 1 ELSE 0 END) AS in_base,
             max(CASE WHEN event_id % 4 = 0 THEN 1 ELSE 0 END) AS in_delta
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        AND event_id IS NOT NULL
      GROUP BY 1
    ),
    kh AS (
      SELECT CAST(('0x' || substr(sha256(key), 1, 12)) AS BIGINT) AS hv,
             key, in_base, in_delta
      FROM ev
    ),
    bs AS (SELECT hv, key FROM kh WHERE in_base = 1
           ORDER BY hv, key LIMIT {_KMV_K}),
    dsm AS (SELECT hv, key FROM kh WHERE in_delta = 1
            ORDER BY hv, key LIMIT {_KMV_K}),
    ms AS (SELECT hv, key FROM (
             SELECT DISTINCT hv, key FROM
               (SELECT * FROM bs UNION ALL SELECT * FROM dsm))
           ORDER BY hv, key LIMIT {_KMV_K}),
    fs AS (SELECT hv, key FROM kh ORDER BY hv, key LIMIT {_KMV_K}),
    m AS (SELECT count(*) AS ck, CAST(coalesce(max(hv), 0) AS BIGINT) AS kth,
                 CAST(coalesce(sum(hv), 0) AS BIGINT) AS sk FROM ms),
    f AS (SELECT count(*) AS ck, CAST(coalesce(max(hv), 0) AS BIGINT) AS kth,
                 CAST(coalesce(sum(hv), 0) AS BIGINT) AS sk FROM fs),
    ex AS (SELECT count(*) AS exact_d, sum(in_base) AS base_keys,
                  sum(in_delta) AS delta_keys FROM kh),
    est AS (SELECT CASE WHEN m.ck >= {_KMV_K}
                        THEN ({_KMV_K - 1} * {_KMV_M}) // m.kth
                        ELSE m.ck END AS kmv_est FROM m)
    SELECT CAST(ex.exact_d AS BIGINT) AS exact_distinct,
           CAST(ex.base_keys AS BIGINT) AS base_keys,
           CAST(ex.delta_keys AS BIGINT) AS delta_keys,
           CAST(m.ck AS BIGINT) AS summary_k,
           CAST(m.kth AS BIGINT) AS kth_refreshed,
           CAST(est.kmv_est AS BIGINT) AS kmv_est,
           CAST(abs(est.kmv_est - ex.exact_d) * 10000 // ex.exact_d
                AS BIGINT) AS err_bp,
           CAST(CASE WHEN m.ck = f.ck AND m.kth = f.kth AND m.sk = f.sk
                     THEN 1 ELSE 0 END AS BIGINT) AS refresh_lossless
    FROM ex, m, f, est
    """,
    tags=("B12", "sketch"),
    doc="INCREMENTAL summary maintenance end-to-end (r9 verdict #9): the "
    "b44_incremental_agg MV-refresh pattern applied to the b85 KMV "
    "distinct-count summary.  The stored BASE summary (distinct "
    "user|type activity keys from events with event_id % 4 != 0 — "
    "yesterday's corpus) is refreshed with a DELTA batch summary "
    "(event_id % 4 == 0, overlapping key population — the hard case) by "
    "merging the summaries ALONE: k smallest of the deduplicated union "
    "of two <= k-row relations, never re-scanning the base corpus.  "
    "refresh_lossless WITNESSES the KMV mergeable property exactly "
    "against a from-scratch recompute over the full corpus: every "
    "global k-minimum lives in base or delta and must be inside that "
    "side's k-minima (fewer than k pairs precede it globally, so fewer "
    "precede it within its side), hence inside the refreshed summary.  "
    "The summary orders by the (hv, key) PAIR — keys are distinct after "
    "the groupBy, so pairs are distinct by construction and no "
    "collision-dedup pass is needed anywhere: every probe is a "
    "TakeOrdered over the one corpus-proportional groupBy(key) exchange "
    "(ReusedExchange across the base/delta/full/count branches, "
    "plan-pinned), the merge handles <= 2k rows, and nothing else "
    "shuffles.  At 100 TB the base summary is a stored k-row relation "
    "and only the delta is scanned; the full-recompute branch exists "
    "here solely as the correctness witness.  Estimator and err_bp as "
    "in b85 (integer grid, deterministic sha256).",
)
def b86_kmv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    K, M = _KMV_K, _KMV_M
    ev = (
        T(spark, sf_dir, "events")
        # event_id IS NOT NULL (r10 advisor): a NULL event_id would make the
        # side flags NULL, max() over an all-NULL key NULL, and the ">= 0"
        # pruning barriers below would silently DROP that key from the
        # full-recompute witness while the oracle's CASE keeps it.  Filtered
        # symmetrically in the oracle, the flags are provably non-null 0/1
        # and the barrier conjuncts provably row-preserving.
        .where(
            F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select(
            F.concat_ws(
                "|", F.col("user_id").cast("string"), F.col("event_type")
            ).alias("key"),
            (F.col("event_id") % 4 != 0).cast("int").alias("b"),
            (F.col("event_id") % 4 == 0).cast("int").alias("dl"),
        )
    )
    # THE corpus exchange: one row per distinct key with side-membership
    # flags (a key may be in both sides); every branch derives from it.
    kd = ev.groupBy("key").agg(
        F.max("b").alias("in_base"), F.max("dl").alias("in_delta")
    )
    kh = kd.select(
        F.conv(F.substring(F.sha2(F.col("key").cast("binary"), 256), 1, 12),
               16, 10).cast("bigint").alias("hv"),
        "key",
        "in_base",
        "in_delta",
    )

    def kmin(rel: DataFrame, ck: str, kth: str, sk: str) -> DataFrame:
        """k smallest (hv, key) pairs via TakeOrdered; kth pair's hv is the
        summary max because the pair order sorts on hv first."""
        return rel.orderBy("hv", "key").limit(K).agg(
            F.count("*").alias(ck),
            F.coalesce(F.max("hv"), F.lit(0)).cast("bigint").alias(kth),
            F.coalesce(F.sum("hv"), F.lit(0)).cast("bigint").alias(sk),
        )

    # Pruning barriers (measured at the 10x probe): without the vacuously
    # true conjuncts, column pruning specializes each branch's aggregate
    # subtree (base drops in_delta, the witness drops both flags, the count
    # keeps both) into FOUR different corpus exchanges with zero reuse —
    # 0.46-0.48 s; with the branches pinned to the identical projection the
    # plan builds ONE exchange with three ReusedExchange consumers —
    # 0.40-0.41 s (-13%).  The flags are max() over non-null 0/1 ints, so
    # ">= 0" can never filter a row; the optimizer just cannot prove it.
    base_s = (
        kh.where((F.col("in_base") == 1) & (F.col("in_delta") >= 0))
        .orderBy("hv", "key").limit(K)
    )
    delta_s = (
        kh.where((F.col("in_delta") == 1) & (F.col("in_base") >= 0))
        .orderBy("hv", "key").limit(K)
    )
    full_in = kh.where((F.col("in_base") >= 0) & (F.col("in_delta") >= 0))
    # the refresh: summaries alone — dedupe the union (a key present in
    # both sides appears in both summaries), keep the k smallest pairs
    refreshed = (
        base_s.select("hv", "key")
        .unionByName(delta_s.select("hv", "key"))
        .distinct()
    )
    m = kmin(refreshed, "ck_m", "kth_m", "sk_m")
    fw = kmin(full_in, "ck_f", "kth_f", "sk_f")  # from-scratch witness
    ex = kh.agg(
        F.count("*").cast("bigint").alias("exact_d"),
        F.sum("in_base").cast("bigint").alias("base_keys"),
        F.sum("in_delta").cast("bigint").alias("delta_keys"),
    )
    est = F.when(
        F.col("ck_m") >= K, F.expr(f"({K - 1} * CAST({M} AS BIGINT)) DIV kth_m")
    ).otherwise(F.col("ck_m"))
    return (
        ex.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(fw))
        .withColumn("kmv_est", est.cast("bigint"))
        .select(
            "exact_d",
            "base_keys",
            "delta_keys",
            F.col("ck_m").cast("bigint").alias("summary_k"),
            F.col("kth_m").alias("kth_refreshed"),
            "kmv_est",
            (F.abs(F.col("kmv_est") - F.col("exact_d")) * 10000)
            .cast("bigint").alias("_num"),
            "ck_f", "kth_f", "sk_f", "sk_m",
        )
        .select(
            F.col("exact_d").alias("exact_distinct"),
            "base_keys",
            "delta_keys",
            "summary_k",
            "kth_refreshed",
            "kmv_est",
            F.expr("_num DIV exact_distinct").cast("bigint").alias("err_bp"),
            F.when(
                (F.col("summary_k") == F.col("ck_f"))
                & (F.col("kth_refreshed") == F.col("kth_f"))
                & (F.col("sk_m") == F.col("sk_f")),
                1,
            ).otherwise(0).cast("bigint").alias("refresh_lossless"),
        )
    )


@query(
    "b87_kmv_set_ops",
    oracle=f"""
    WITH ev AS (
      SELECT user_id || '|' || event_type AS key,
             max(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS in_b
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        AND event_id IS NOT NULL
      GROUP BY 1
    ),
    kh AS (
      SELECT CAST(('0x' || substr(sha256(key), 1, 12)) AS BIGINT) AS hv,
             key, in_a, in_b
      FROM ev
    ),
    sa AS (SELECT hv, key, in_b FROM kh WHERE in_a = 1
           ORDER BY hv, key LIMIT {_KMV_K}),
    sb AS (SELECT hv, key, in_a FROM kh WHERE in_b = 1
           ORDER BY hv, key LIMIT {_KMV_K}),
    ma AS (SELECT count(*) AS ck_a,
                  CAST(coalesce(max(hv), 0) AS BIGINT) AS kth_a FROM sa),
    mb AS (SELECT count(*) AS ck_b,
                  CAST(coalesce(max(hv), 0) AS BIGINT) AS kth_b FROM sb),
    th AS (SELECT least(ma.kth_a, mb.kth_b) AS theta,
                  ma.ck_a, mb.ck_b FROM ma, mb),
    samp AS (
      SELECT count(*) AS n_sample FROM (
        SELECT DISTINCT hv, key FROM
          (SELECT hv, key FROM sa UNION ALL SELECT hv, key FROM sb)
      ) u, th WHERE u.hv < th.theta
    ),
    com AS (SELECT count(*) AS common FROM sa, th
            WHERE sa.in_b = 1 AND sa.hv < th.theta),
    ex AS (SELECT count(*) AS union_exact,
                  sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                    AS inter_exact,
                  sum(in_a) AS a_keys, sum(in_b) AS b_keys
           FROM kh),
    wit AS (SELECT count(*) AS below FROM kh, th WHERE kh.hv < th.theta),
    est AS (
      SELECT CASE WHEN th.ck_a >= {_KMV_K} OR th.ck_b >= {_KMV_K}
                  THEN com.common * {_KMV_M} // th.theta
                  ELSE ex.inter_exact END AS est_inter,
             CASE WHEN th.ck_a >= {_KMV_K} OR th.ck_b >= {_KMV_K}
                  THEN samp.n_sample * {_KMV_M} // th.theta
                  ELSE ex.union_exact END AS est_union,
             CASE WHEN th.ck_a >= {_KMV_K} OR th.ck_b >= {_KMV_K}
                  THEN com.common * 1000000 // greatest(samp.n_sample, 1)
                  ELSE ex.inter_exact * 1000000 // greatest(ex.union_exact, 1)
                  END AS jacc_est_e6
      FROM th, com, samp, ex
    )
    SELECT CAST(ex.a_keys AS BIGINT) AS a_keys,
           CAST(ex.b_keys AS BIGINT) AS b_keys,
           CAST(ex.inter_exact AS BIGINT) AS inter_exact,
           CAST(ex.union_exact AS BIGINT) AS union_exact,
           CAST(samp.n_sample AS BIGINT) AS n_sample,
           CAST(com.common AS BIGINT) AS inter_common,
           CAST(est.est_inter AS BIGINT) AS est_inter,
           CAST(est.est_union AS BIGINT) AS est_union,
           CAST(est.jacc_est_e6 AS BIGINT) AS jacc_est_e6,
           CAST(ex.inter_exact * 1000000 // greatest(ex.union_exact, 1)
                AS BIGINT) AS jacc_exact_e6,
           CAST(abs(est.est_inter - ex.inter_exact) * 10000
                // greatest(ex.inter_exact, 1) AS BIGINT) AS err_inter_bp,
           CAST(abs(est.est_union - ex.union_exact) * 10000
                // greatest(ex.union_exact, 1) AS BIGINT) AS err_union_bp,
           CAST(CASE WHEN wit.below = samp.n_sample THEN 1 ELSE 0 END
                AS BIGINT) AS sample_complete
    FROM ex, samp, com, est, wit
    """,
    tags=("B12", "sketch"),
    doc="MERGEABLE set-operation estimates from KMV summaries alone — the "
    "theta-sketch algebra (Beyer et al. 2007, 'On synopses for distinct-"
    "value estimation'), closing the mergeable-summary family: quantiles "
    "b83, frequencies b84, distinct counts b85, incremental refresh b86, "
    "set operations b87.  Two overlapping key populations (distinct "
    "user|type activity keys seen with odd vs even event_ids) each keep "
    "their k smallest (hv, key) pairs; theta = the smaller of the two "
    "kth hashes, and every estimate derives from the summaries ONLY: "
    "the sample is the distinct pairs below theta across both summaries, "
    "the intersection sample is the A-summary pairs below theta flagged "
    "in_b (no join — the side flags ride the summary rows), and the "
    "integer estimators scale by M DIV theta (falling back to the exact "
    "counts when BOTH summaries are complete, i.e. sides smaller than "
    "k).  sample_complete WITNESSES the capture theorem exactly against "
    "the full corpus: any pair with hv < theta <= its side's kth hash "
    "precedes that side's kth pair, so it must sit inside that side's "
    "summary — the corpus count of hv < theta keys equals the summary-"
    "derived sample size by mathematics, not luck.  Scale shape: b86's "
    "scaffold — ONE groupBy(key) corpus exchange with all five branches "
    "(A/B summaries, exact counts, capture witness) pinned to the "
    "identical projection by vacuous-conjunct pruning barriers "
    "(ReusedExchange plan-pinned), every summary probe TakeOrdered, all "
    "estimator algebra on broadcast 1-row relations.",
)
def b87_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    K, M = _KMV_K, _KMV_M
    ev = (
        T(spark, sf_dir, "events")
        # event_id IS NOT NULL, symmetric with the oracle — see b86's note:
        # NULL event_id would NULL the side flags and the ">= 0" barriers
        # would drop the key from the witness branches only.
        .where(
            F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select(
            F.concat_ws(
                "|", F.col("user_id").cast("string"), F.col("event_type")
            ).alias("key"),
            (F.col("event_id") % 2 == 1).cast("int").alias("a"),
            (F.col("event_id") % 2 == 0).cast("int").alias("bb"),
        )
    )
    kd = ev.groupBy("key").agg(
        F.max("a").alias("in_a"), F.max("bb").alias("in_b")
    )
    kh = kd.select(
        F.conv(F.substring(F.sha2(F.col("key").cast("binary"), 256), 1, 12),
               16, 10).cast("bigint").alias("hv"),
        "key",
        "in_a",
        "in_b",
    )
    # Pruning barriers, as in b86: vacuously true conjuncts keep all five
    # branches on the identical projection so ONE corpus exchange serves
    # them all (the flags are max() over non-null 0/1 ints, never filtered
    # by ">= 0"; the optimizer just cannot prove it).
    sa = (
        kh.where((F.col("in_a") == 1) & (F.col("in_b") >= 0))
        .orderBy("hv", "key").limit(K)
    )
    sb = (
        kh.where((F.col("in_b") == 1) & (F.col("in_a") >= 0))
        .orderBy("hv", "key").limit(K)
    )
    ma = sa.agg(
        F.count("*").alias("ck_a"),
        F.coalesce(F.max("hv"), F.lit(0)).cast("bigint").alias("kth_a"),
    )
    mb = sb.agg(
        F.count("*").alias("ck_b"),
        F.coalesce(F.max("hv"), F.lit(0)).cast("bigint").alias("kth_b"),
    )
    th = ma.crossJoin(F.broadcast(mb)).select(
        F.least("kth_a", "kth_b").alias("theta"), "ck_a", "ck_b"
    )
    samp = (
        sa.select("hv", "key")
        .unionByName(sb.select("hv", "key"))
        .distinct()
        .crossJoin(F.broadcast(th.select("theta")))
        .where(F.col("hv") < F.col("theta"))
        .agg(F.count("*").cast("bigint").alias("n_sample"))
    )
    com = (
        sa.crossJoin(F.broadcast(th.select(F.col("theta").alias("th2"))))
        .where((F.col("in_b") == 1) & (F.col("hv") < F.col("th2")))
        .agg(F.count("*").cast("bigint").alias("common"))
    )
    ex = kh.agg(
        F.count("*").cast("bigint").alias("union_exact"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        ).cast("bigint").alias("inter_exact"),
        F.sum("in_a").cast("bigint").alias("a_keys"),
        F.sum("in_b").cast("bigint").alias("b_keys"),
    )
    wit = (
        kh.where((F.col("in_a") >= 0) & (F.col("in_b") >= 0))
        .crossJoin(F.broadcast(th.select(F.col("theta").alias("th3"))))
        .where(F.col("hv") < F.col("th3"))
        .agg(F.count("*").cast("bigint").alias("below"))
    )
    sketchy = (F.col("ck_a") >= K) | (F.col("ck_b") >= K)
    return (
        ex.crossJoin(F.broadcast(th))
        .crossJoin(F.broadcast(samp))
        .crossJoin(F.broadcast(com))
        .crossJoin(F.broadcast(wit))
        .select(
            "a_keys",
            "b_keys",
            "inter_exact",
            "union_exact",
            "n_sample",
            F.col("common").alias("inter_common"),
            F.when(
                sketchy, F.expr(f"common * CAST({M} AS BIGINT) DIV theta")
            ).otherwise(F.col("inter_exact")).cast("bigint").alias("est_inter"),
            F.when(
                sketchy, F.expr(f"n_sample * CAST({M} AS BIGINT) DIV theta")
            ).otherwise(F.col("union_exact")).cast("bigint").alias("est_union"),
            F.when(
                sketchy,
                F.expr("common * 1000000 DIV greatest(n_sample, 1)"),
            ).otherwise(
                F.expr("inter_exact * 1000000 DIV greatest(union_exact, 1)")
            ).cast("bigint").alias("jacc_est_e6"),
            F.expr("inter_exact * 1000000 DIV greatest(union_exact, 1)")
            .cast("bigint").alias("jacc_exact_e6"),
            "below",
        )
        .select(
            "a_keys",
            "b_keys",
            "inter_exact",
            "union_exact",
            "n_sample",
            "inter_common",
            "est_inter",
            "est_union",
            "jacc_est_e6",
            "jacc_exact_e6",
            F.expr(
                "abs(est_inter - inter_exact) * 10000"
                " DIV greatest(inter_exact, 1)"
            ).cast("bigint").alias("err_inter_bp"),
            F.expr(
                "abs(est_union - union_exact) * 10000"
                " DIV greatest(union_exact, 1)"
            ).cast("bigint").alias("err_union_bp"),
            F.when(F.col("below") == F.col("n_sample"), 1)
            .otherwise(0).cast("bigint").alias("sample_complete"),
        )
    )


_PS_K = 256                 # priority-sample size
_PS_M32 = 1 << 32           # 32-bit uniform grid: w * M32 stays under 2^63
# Weight cap ENFORCING the under-2^63 comment above (r10 advisor): without
# it a document with n_chars >= ~2.15M in the planted-heavy branch makes
# w >= 2^31, and w * M32 silently wraps int64 in non-ANSI Spark while
# DuckDB raises — a larger fixture would diverge the engines.  Capped,
# max w = 1e6 * 1000 = 1e9 < 2^31 and w * M32 <= ~4.3e18 < 2^63 on BOTH
# engines (fixture max n_chars ~577, so values are unchanged today).
_PS_W_CAP = 1_000_000


@query(
    "b88_priority_sample",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             least(CAST(n_chars AS BIGINT), {_PS_W_CAP})
               * (CASE WHEN doc_id % 97 = 0 THEN 1000 ELSE 1 END) AS w
      FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    q AS (
      SELECT doc_id, w,
             (w * {_PS_M32}) // (CAST(('0x' ||
                substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                + 1) AS pri
      FROM d
    ),
    topk1 AS (SELECT doc_id, w, pri FROM q
              ORDER BY pri DESC, doc_id LIMIT {_PS_K + 1}),
    tk AS (SELECT count(*) AS ck1, CAST(coalesce(min(pri), 0) AS BIGINT)
                  AS min1 FROM topk1),
    tau AS (SELECT CASE WHEN ck1 = {_PS_K + 1} THEN min1 ELSE 0 END
                   AS tau FROM tk),
    samp AS (SELECT doc_id, w, pri FROM q
             ORDER BY pri DESC, doc_id LIMIT {_PS_K}),
    est AS (SELECT CAST(sum(greatest(w, tau.tau)) AS BIGINT) AS est_total,
                   count(*) AS n_sample,
                   CAST(sum(CASE WHEN w > tau.tau THEN 1 ELSE 0 END)
                        AS BIGINT) AS heavy_in_sample
            FROM samp, tau GROUP BY tau.tau),
    ex AS (SELECT count(*) AS n_docs, CAST(sum(w) AS BIGINT) AS total_w
           FROM d),
    hv AS (SELECT CAST(count(*) AS BIGINT) AS heavy_count FROM q, tau
           WHERE q.w > tau.tau)
    SELECT CAST(ex.n_docs AS BIGINT) AS n_docs,
           CAST(ex.total_w AS BIGINT) AS total_w,
           CAST(est.n_sample AS BIGINT) AS n_sample,
           CAST(tau.tau AS BIGINT) AS tau,
           CAST(est.est_total AS BIGINT) AS est_total,
           CAST(abs(est.est_total - ex.total_w) * 10000 // ex.total_w
                AS BIGINT) AS err_bp,
           CAST(hv.heavy_count AS BIGINT) AS heavy_count,
           CAST(hv.heavy_count - est.heavy_in_sample AS BIGINT)
                AS heavy_missed
    FROM ex, est, tau, hv
    """,
    tags=("B12", "llm", "sketch"),
    doc="Weighted corpus subsampling with unbiased subset-sum estimation — "
    "priority sampling (Duffield, Lund & Thorup 2007, 'Priority sampling "
    "for estimation of arbitrary subset sums'), the sampling operator a "
    "training-data pipeline uses to cut a weighted corpus to k documents "
    "while keeping totals estimable: each document draws the "
    "deterministic 32-bit uniform (hv+1)/M from the portable sha256 of "
    "its id and gets priority w*M DIV (hv+1) (weights are n_chars with "
    "a planted 1000x tail on every 97th doc so the coverage witness "
    "exercises non-trivially); the sample is the top-k "
    "priorities, tau is the (k+1)-th, and the subset-sum estimator "
    "sum(max(w, tau)) over the sample targets the exact corpus total "
    "(err_bp reports the realized error; the integer grid makes both "
    "engines bit-identical, so the oracle is value-exact).  "
    "heavy_missed WITNESSES the scheme's coverage theorem exactly: "
    "priority >= weight (M DIV (hv+1) >= 1), so any document with "
    "w > tau has priority > tau and at most k priorities exceed the "
    "(k+1)-th — every heavy document is in the sample by mathematics, "
    "the property that makes priority sampling safe for long-tailed "
    "corpus weights.  Scale shape: the (k+1) probe is ONE TakeOrdered "
    "over the document relation (weights + hash are row-local; "
    "per-partition top-k + bounded driver merge, never a global sort) "
    "and the k-sample re-sorts those <= k+1 rows instead of re-probing "
    "the corpus; tau and the estimator algebra live on broadcast 1-row "
    "relations; the exact total and the heavy-count witness are two "
    "map-side-combined aggregate passes; no corpus shuffle exists "
    "anywhere in the plan.",
)
def b88_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    K, M32 = _PS_K, _PS_M32
    # weight = n_chars (capped at _PS_W_CAP so w * M32 provably stays under
    # 2^63 on both engines — see the cap's comment), multiplied 1000x for
    # every 97th doc: a long-tailed weight distribution (the realistic
    # corpus case) that makes the heavy-coverage witness NON-trivial —
    # without the tail no document outweighs tau and heavy_count pins
    # 0 = 0 vacuously
    d = (
        T(spark, sf_dir, "documents")
        .where(F.col("n_chars").isNotNull() & (F.col("n_chars") > 0))
        .select(
            "doc_id",
            (
                F.least(F.col("n_chars").cast("bigint"), F.lit(_PS_W_CAP))
                * F.when(F.col("doc_id") % 97 == 0, 1000).otherwise(1)
            ).alias("w"),
        )
    )
    q = d.select(
        "doc_id",
        "w",
        F.expr(
            f"(w * {M32}) DIV (CAST(conv(substring("
            f"sha2(CAST(CAST(doc_id AS STRING) AS BINARY), 256), 1, 8),"
            f" 16, 10) AS BIGINT) + 1)"
        ).alias("pri"),
    )
    topk1 = q.orderBy(F.col("pri").desc(), "doc_id").limit(K + 1)
    # the k-sample is the (k+1) probe minus its last row — re-sorting the
    # materialized <= k+1 rows costs nothing and saves a second corpus probe
    samp = topk1.orderBy(F.col("pri").desc(), "doc_id").limit(K)
    tau = topk1.agg(
        F.count("*").alias("ck1"),
        F.coalesce(F.min("pri"), F.lit(0)).cast("bigint").alias("min1"),
    ).select(
        F.when(F.col("ck1") == K + 1, F.col("min1"))
        .otherwise(0).cast("bigint").alias("tau")
    )
    est = (
        samp.crossJoin(F.broadcast(tau))
        .groupBy("tau")
        .agg(
            F.sum(F.greatest(F.col("w"), F.col("tau")))
            .cast("bigint").alias("est_total"),
            F.count("*").cast("bigint").alias("n_sample"),
            F.sum(F.when(F.col("w") > F.col("tau"), 1).otherwise(0))
            .cast("bigint").alias("heavy_in_sample"),
        )
    )
    ex = d.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("w").cast("bigint").alias("total_w"),
    )
    heavy = (
        q.crossJoin(F.broadcast(tau.select(F.col("tau").alias("t2"))))
        .where(F.col("w") > F.col("t2"))
        .agg(F.count("*").cast("bigint").alias("heavy_count"))
    )
    return (
        ex.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(heavy))
        .select(
            "n_docs",
            "total_w",
            "n_sample",
            F.col("tau").cast("bigint").alias("tau"),
            "est_total",
            (F.abs(F.col("est_total") - F.col("total_w")) * 10000)
            .cast("bigint").alias("_num"),
            "heavy_count",
            (F.col("heavy_count") - F.col("heavy_in_sample"))
            .cast("bigint").alias("heavy_missed"),
        )
        .select(
            "n_docs",
            "total_w",
            "n_sample",
            "tau",
            "est_total",
            F.expr("_num DIV total_w").cast("bigint").alias("err_bp"),
            "heavy_count",
            "heavy_missed",
        )
    )


# b89 introspection for tests: the last run's maintained-state bounds
# (summary-store rows actually exchanged, micro-batch count).  Read-only
# evidence — the query's behavior never depends on it.
_B89_LAST: dict = {}


def _kmv_keys_of(df: DataFrame) -> DataFrame:
    """b85's key derivation, shared by b89's stream and witness branches
    (module-level so tests can plan-pin the per-batch summary shape)."""
    return df.where(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    ).select(
        F.concat_ws(
            "|",
            F.col("user_id").cast("string"),
            F.col("event_type"),
            F.expr("CAST(unix_timestamp(ts) AS BIGINT) DIV 3600").cast(
                "string"
            ),
        ).alias("key")
    )


def _kmv_hv_of(df: DataFrame) -> DataFrame:
    return df.select(
        F.conv(
            F.substring(F.sha2(F.col("key").cast("binary"), 256), 1, 12),
            16,
            10,
        ).cast("bigint").alias("hv")
    )


def _kmv_batch_summary(df: DataFrame, k: int) -> DataFrame:
    """b89's per-batch maintenance plan: one map-side-combined distinct over
    THAT BATCH + one TakeOrdered — never a global sort."""
    return (
        _kmv_hv_of(_kmv_keys_of(df).distinct())
        .distinct()
        .orderBy("hv")
        .limit(k)
    )


@query(
    "b89_stream_kmv_maintain",
    oracle=f"""
    WITH dk AS (
      SELECT DISTINCT user_id || '|' || event_type || '|' ||
               CAST(CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS VARCHAR)
               AS key
      FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    hd AS (
      SELECT DISTINCT CAST(('0x' || substr(sha256(key), 1, 12)) AS BIGINT)
               AS hv
      FROM dk
    ),
    mk AS (
      SELECT count(*) AS ck, CAST(coalesce(max(hv), 0) AS BIGINT) AS kth,
             CAST(coalesce(sum(hv), 0) AS BIGINT) AS sk
      FROM (SELECT hv FROM hd ORDER BY hv LIMIT {_KMV_K})
    ),
    ex AS (SELECT count(*) AS exact_d FROM dk),
    est AS (
      SELECT CASE WHEN mk.ck >= {_KMV_K}
                  THEN ({_KMV_K - 1} * {_KMV_M}) // mk.kth
                  ELSE mk.ck END AS kmv_est
      FROM mk
    )
    -- multi_batch and stream_lossless are RUNTIME witnesses on the Spark
    -- side (>=2 micro-batches actually ran; the maintained summary's k-min
    -- statistics equal the full batch recompute).  The oracle pins their
    -- REQUIRED values: the mergeable-summary theorem guarantees the
    -- maintained k-minima equal the global k-minima for ANY batch split,
    -- so a Spark-side 0 in either column is a defect and hash-mismatches.
    SELECT CAST(mk.ck AS BIGINT) AS summary_k,
           CAST(mk.kth AS BIGINT) AS kth_stream,
           CAST(est.kmv_est AS BIGINT) AS kmv_est,
           CAST(ex.exact_d AS BIGINT) AS exact_distinct,
           CAST(abs(est.kmv_est - ex.exact_d) * 10000 // ex.exact_d
                AS BIGINT) AS err_bp,
           CAST(1 AS BIGINT) AS multi_batch,
           CAST(1 AS BIGINT) AS stream_lossless
    FROM mk, ex, est
    """,
    tags=("B12", "B33", "sketch", "streaming"),
    doc="STREAMING sketch maintenance — the b85 KMV distinct summary kept "
    "up to date as data ARRIVES, fusing the mergeable-summary family "
    "(b83-b88) with the Structured Streaming surface (B30-B33): a "
    "readStream over the events corpus staged as four files "
    "(maxFilesPerTrigger=1, availableNow) runs foreachBatch, and each "
    "micro-batch appends its OWN bounded KMV summary (the k smallest "
    "sha256-derived hash values of the batch's distinct user|type|hour "
    "keys, <= k rows) to a summary store; the maintained global summary "
    "is the b86-style merge of the per-batch summaries ALONE — prior "
    "batches are never re-scanned, the replayed state is <= k rows per "
    "batch.  stream_lossless WITNESSES the mergeable theorem end-to-end: "
    "any hash among the global k minima has at most k-1 smaller values "
    "inside its own batch, so it survives its batch summary, and the "
    "merged k-min statistics (count, kth, sum) equal the full batch "
    "recompute exactly — which also makes the result deterministic under "
    "ANY batch split, hence oracle-checkable; multi_batch witnesses that "
    "the stream really ran >= 2 micro-batches (it runs 4).  Scale shape "
    "(100 TB): the per-batch work is one map-side-combined distinct + "
    "TakeOrdered over THAT BATCH only, the cross-batch state is <= "
    "k*batches summary rows (bigints, never corpus), and the estimator "
    "algebra runs on 1-row broadcast relations — this is the incremental "
    "ingestion story: summaries that update as data arrives instead of "
    "replaying deltas in batch.  The 4-file staging exists only because "
    "the fixture is one parquet file (same staging pattern as "
    "event_windows._events_stream); a production deployment points the "
    "same foreachBatch at a real source.",
)
def b89_stream_kmv_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import uuid

    from ._util import scratch_dir

    K, M = _KMV_K, _KMV_M

    # one-time staging: events split into 4 deterministic files (shared
    # helper: identity-keyed cache, pmod grouping, staged-counts assertion)
    stage = _stage_stream_files(
        spark, sf_dir, "events",
        ("user_id", "event_type", "ts", "event_id"),
        "event_id", "kmv_stream_src",
    )

    run = uuid.uuid4().hex[:12]
    summ_dir = scratch_dir(f"kmv_stream_summ_{run}")
    ckpt = scratch_dir(f"kmv_stream_ckpt_{run}")
    # try/finally: the per-run dirs must not leak when the stream or the
    # merge raises (r11 advisor item 3)
    try:
        return _b89_run(spark, sf_dir, stage, summ_dir, ckpt, K, M)
    finally:
        shutil.rmtree(summ_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def _b89_run(
    spark: SparkSession, sf_dir: str, stage: str, summ_dir: str, ckpt: str,
    K: int, M: int,
) -> DataFrame:
    import os

    def update(batch_df: DataFrame, batch_id: int) -> None:
        # THE maintenance step: this batch's own KMV summary (<= K rows of
        # bigint hv) appended to the store — no prior data touched.  The
        # plan shape of _kmv_batch_summary is pinned in tests/test_plans.py.
        (
            _kmv_batch_summary(batch_df, K)
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            .coalesce(1)
            .write.mode("append")
            .parquet(summ_dir)
        )

    schema = spark.read.parquet(os.path.join(stage, "g0.parquet")).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        src.writeStream.foreachBatch(update)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # ---- merge the maintained summaries (bounded: <= K * n_batches rows) --
    summ = spark.read.parquet(summ_dir)
    merged = summ.select("hv").distinct()

    def kmin_stats(rel: DataFrame, ck: str, kth: str, sk: str) -> DataFrame:
        return rel.orderBy("hv").limit(K).agg(
            F.count("*").alias(ck),
            F.coalesce(F.max("hv"), F.lit(0)).cast("bigint").alias(kth),
            F.coalesce(F.sum("hv"), F.lit(0)).cast("bigint").alias(sk),
        )

    mk = kmin_stats(merged, "ck_m", "kth_m", "sk_m")
    nb = summ.agg(F.countDistinct("batch_id").alias("n_batches"))
    # witness: the full batch recompute over the events table
    full_keys = _kmv_keys_of(T(spark, sf_dir, "events")).distinct()
    full_hv = _kmv_hv_of(full_keys).distinct()
    gk = kmin_stats(full_hv, "ck_g", "kth_g", "sk_g")
    ex = full_keys.agg(F.count("*").cast("bigint").alias("exact_d"))

    est = F.when(
        F.col("ck_m") >= K, F.expr(f"({K - 1} * CAST({M} AS BIGINT)) DIV kth_m")
    ).otherwise(F.col("ck_m"))
    result = (
        mk.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(gk))
        .crossJoin(F.broadcast(ex))
        .withColumn("kmv_est", est.cast("bigint"))
        .select(
            F.col("ck_m").cast("bigint").alias("summary_k"),
            F.col("kth_m").alias("kth_stream"),
            "kmv_est",
            F.col("exact_d").alias("exact_distinct"),
            (F.abs(F.col("kmv_est") - F.col("exact_d")) * 10000)
            .cast("bigint").alias("_num"),
            F.when(F.col("n_batches") >= 2, 1).otherwise(0)
            .cast("bigint").alias("multi_batch"),
            F.when(
                (F.col("ck_m") == F.col("ck_g"))
                & (F.col("kth_m") == F.col("kth_g"))
                & (F.col("sk_m") == F.col("sk_g")),
                1,
            ).otherwise(0).cast("bigint").alias("stream_lossless"),
            F.col("n_batches").cast("bigint").alias("_nb"),
        )
        .select(
            "summary_k",
            "kth_stream",
            "kmv_est",
            "exact_distinct",
            F.expr("_num DIV exact_distinct").cast("bigint").alias("err_bp"),
            "multi_batch",
            "stream_lossless",
            "_nb",
        )
    )
    # Eager 1-row checkpoint so the per-run scratch dirs can be removed by
    # the caller's finally before the result is consumed.
    out = result.localCheckpoint(eager=True)
    row = out.first()
    _B89_LAST.clear()
    _B89_LAST.update(
        {"summary_rows": summ.count(), "n_batches": row["_nb"]}
    )
    return out.drop("_nb")


# b90 introspection for tests, same contract as _B89_LAST.
_B90_LAST: dict = {}


@query(
    "b90_stream_priority_maintain",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             least(CAST(n_chars AS BIGINT), {_PS_W_CAP})
               * (CASE WHEN doc_id % 97 = 0 THEN 1000 ELSE 1 END) AS w
      FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    q AS (
      SELECT doc_id, w,
             (w * {_PS_M32}) // (CAST(('0x' ||
                substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                + 1) AS pri
      FROM d
    ),
    topk1 AS (SELECT doc_id, w, pri FROM q
              ORDER BY pri DESC, doc_id LIMIT {_PS_K + 1}),
    tk AS (SELECT count(*) AS ck1, CAST(coalesce(min(pri), 0) AS BIGINT)
                  AS min1 FROM topk1),
    tau AS (SELECT CASE WHEN ck1 = {_PS_K + 1} THEN min1 ELSE 0 END
                   AS tau FROM tk),
    samp AS (SELECT doc_id, w, pri FROM q
             ORDER BY pri DESC, doc_id LIMIT {_PS_K}),
    est AS (SELECT CAST(sum(greatest(w, tau.tau)) AS BIGINT) AS est_total,
                   count(*) AS n_sample
            FROM samp, tau GROUP BY tau.tau),
    ex AS (SELECT CAST(sum(w) AS BIGINT) AS total_w FROM d)
    -- multi_batch / stream_lossless: Spark-side runtime witnesses with
    -- their REQUIRED values pinned (see b89's oracle note) — the merged
    -- per-batch top-(k+1) summaries equal the global top-(k+1) for ANY
    -- batch split by the k-minima theorem on the (pri DESC, doc_id) order.
    SELECT CAST(est.n_sample AS BIGINT) AS n_sample,
           CAST(tau.tau AS BIGINT) AS tau,
           CAST(est.est_total AS BIGINT) AS est_total,
           CAST(ex.total_w AS BIGINT) AS total_w,
           CAST(abs(est.est_total - ex.total_w) * 10000 // ex.total_w
                AS BIGINT) AS err_bp,
           CAST(1 AS BIGINT) AS multi_batch,
           CAST(1 AS BIGINT) AS stream_lossless
    FROM est, tau, ex
    """,
    tags=("B12", "B33", "llm", "sketch", "streaming"),
    doc="STREAMING weighted-sample maintenance — b88's priority sample "
    "(Duffield-Lund-Thorup 2007) kept up to date as corpus shards ARRIVE, "
    "the b89 scaffold applied to the sampling family: a readStream over "
    "the documents corpus staged as four files (maxFilesPerTrigger=1, "
    "availableNow) runs foreachBatch, each micro-batch appends its OWN "
    "top-(k+1)-priority summary (<= k+1 rows of (doc_id, w, pri)) to a "
    "summary store, and the maintained global sample is the top-k of the "
    "merged per-batch summaries ALONE — prior shards are never re-scanned. "
    "stream_lossless witnesses the merge theorem on the total "
    "(pri DESC, doc_id) order end-to-end: any document among the global "
    "top-(k+1) has at most k rows preceding it inside its own batch, so "
    "it survives its batch summary, and the merged tau and subset-sum "
    "estimator equal the full batch recompute exactly — deterministic "
    "under ANY batch split, hence value-exact against a batch DuckDB "
    "oracle; multi_batch witnesses >= 2 real micro-batches (4 run).  This "
    "is the training-data use case: maintain a fixed-size weighted corpus "
    "sample with an unbiased total estimator while shards stream in, "
    "per-arrival work one TakeOrdered over the arriving batch, cross-"
    "batch state <= (k+1)*batches rows.  Weights, cap, and estimator are "
    "b88's exactly (least(n_chars, cap) with the planted 1000x tail).",
)
def b90_stream_priority_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import uuid

    from ._util import scratch_dir

    # one-time staging: documents split into 4 deterministic files (shared
    # helper: identity-keyed cache, pmod grouping, staged-counts assertion)
    stage = _stage_stream_files(
        spark, sf_dir, "documents", ("doc_id", "n_chars"),
        "doc_id", "pri_stream_src",
    )

    run = uuid.uuid4().hex[:12]
    summ_dir = scratch_dir(f"pri_stream_summ_{run}")
    ckpt = scratch_dir(f"pri_stream_ckpt_{run}")
    # try/finally: the per-run dirs must not leak when the stream or the
    # merge raises (r11 advisor item 3)
    try:
        return _b90_run(spark, sf_dir, stage, summ_dir, ckpt)
    finally:
        shutil.rmtree(summ_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def _b90_run(
    spark: SparkSession, sf_dir: str, stage: str, summ_dir: str, ckpt: str,
) -> DataFrame:
    import os

    K, M32 = _PS_K, _PS_M32

    def pri_of(df: DataFrame) -> DataFrame:
        """b88's weight/priority derivation (cap + planted tail + sha256
        uniform), shared by the stream and the witness."""
        return (
            df.where(F.col("n_chars").isNotNull() & (F.col("n_chars") > 0))
            .select(
                "doc_id",
                (
                    F.least(F.col("n_chars").cast("bigint"), F.lit(_PS_W_CAP))
                    * F.when(F.col("doc_id") % 97 == 0, 1000).otherwise(1)
                ).alias("w"),
            )
            .select(
                "doc_id",
                "w",
                F.expr(
                    f"(w * {M32}) DIV (CAST(conv(substring("
                    f"sha2(CAST(CAST(doc_id AS STRING) AS BINARY), 256), 1, 8),"
                    f" 16, 10) AS BIGINT) + 1)"
                ).alias("pri"),
            )
        )

    def batch_summary(df: DataFrame) -> DataFrame:
        # per-batch maintenance: this batch's top-(k+1) priorities — one
        # TakeOrdered over the arriving batch, <= k+1 rows out
        return pri_of(df).orderBy(F.col("pri").desc(), "doc_id").limit(K + 1)

    def update(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_summary(batch_df)
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            .coalesce(1)
            .write.mode("append")
            .parquet(summ_dir)
        )

    schema = spark.read.parquet(os.path.join(stage, "g0.parquet")).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        src.writeStream.foreachBatch(update)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # maintained sample from the summaries alone (<= (k+1)*batches rows)
    summ = spark.read.parquet(summ_dir)
    m_top1 = summ.orderBy(F.col("pri").desc(), "doc_id").limit(K + 1)
    m_samp = m_top1.orderBy(F.col("pri").desc(), "doc_id").limit(K)
    m_tau = m_top1.agg(
        F.count("*").alias("ck1"),
        F.coalesce(F.min("pri"), F.lit(0)).cast("bigint").alias("min1"),
    ).select(
        F.when(F.col("ck1") == K + 1, F.col("min1"))
        .otherwise(0).cast("bigint").alias("tau")
    )
    m_est = (
        m_samp.crossJoin(F.broadcast(m_tau))
        .groupBy("tau")
        .agg(
            F.sum(F.greatest(F.col("w"), F.col("tau")))
            .cast("bigint").alias("est_total"),
            F.count("*").cast("bigint").alias("n_sample"),
        )
    )
    nb = summ.agg(F.countDistinct("batch_id").alias("n_batches"))
    # witness: the full batch recompute over documents
    full = pri_of(T(spark, sf_dir, "documents"))
    g_top1 = full.orderBy(F.col("pri").desc(), "doc_id").limit(K + 1)
    g_tau = g_top1.agg(
        F.count("*").alias("ck1g"),
        F.coalesce(F.min("pri"), F.lit(0)).cast("bigint").alias("min1g"),
    ).select(
        F.when(F.col("ck1g") == K + 1, F.col("min1g"))
        .otherwise(0).cast("bigint").alias("tau_g")
    )
    g_sum = g_top1.agg(
        F.count("*").cast("bigint").alias("ck_g"),
        F.coalesce(F.sum("pri"), F.lit(0)).cast("bigint").alias("spri_g"),
        F.coalesce(F.sum("w"), F.lit(0)).cast("bigint").alias("sw_g"),
    )
    m_sum = m_top1.agg(
        F.count("*").cast("bigint").alias("ck_m"),
        F.coalesce(F.sum("pri"), F.lit(0)).cast("bigint").alias("spri_m"),
        F.coalesce(F.sum("w"), F.lit(0)).cast("bigint").alias("sw_m"),
    )
    ex = full.agg(F.sum("w").cast("bigint").alias("total_w"))

    result = (
        m_est.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(g_tau))
        .crossJoin(F.broadcast(g_sum))
        .crossJoin(F.broadcast(m_sum))
        .crossJoin(F.broadcast(ex))
        .select(
            "n_sample",
            F.col("tau").cast("bigint").alias("tau"),
            "est_total",
            "total_w",
            (F.abs(F.col("est_total") - F.col("total_w")) * 10000)
            .cast("bigint").alias("_num"),
            F.when(F.col("n_batches") >= 2, 1).otherwise(0)
            .cast("bigint").alias("multi_batch"),
            F.when(
                (F.col("tau") == F.col("tau_g"))
                & (F.col("ck_m") == F.col("ck_g"))
                & (F.col("spri_m") == F.col("spri_g"))
                & (F.col("sw_m") == F.col("sw_g")),
                1,
            ).otherwise(0).cast("bigint").alias("stream_lossless"),
            F.col("n_batches").cast("bigint").alias("_nb"),
        )
        .select(
            "n_sample",
            "tau",
            "est_total",
            "total_w",
            F.expr("_num DIV total_w").cast("bigint").alias("err_bp"),
            "multi_batch",
            "stream_lossless",
            "_nb",
        )
    )
    out = result.localCheckpoint(eager=True)
    row = out.first()
    _B90_LAST.clear()
    _B90_LAST.update(
        {"summary_rows": summ.count(), "n_batches": row["_nb"]}
    )
    return out.drop("_nb")


# b91 introspection for tests, same contract as _B89_LAST/_B90_LAST.
_B91_LAST: dict = {}

_HH_STREAM_B = 4  # staged micro-batches (files); pinned in the oracle


def _hh_batch_summary(df: DataFrame, t_: int) -> DataFrame:
    """b91's per-micro-batch maintenance plan: tokenize THE BATCH, one
    map-side-combined per-term count, retain the terms strictly above the
    batch-local relative-frequency threshold (cnt*T > n_batch — at most
    T-1 rows by pigeonhole), and always emit one NULL-term sentinel row
    carrying the batch token total so an all-light batch still records its
    n_batch for the global bound.  Module-level so tests can plan-pin the
    shape (no global sort, no cartesian, no Python eval)."""
    toks = (
        df.where(F.col("text").isNotNull())
        .select(
            F.explode(
                F.split(F.lower(F.trim("text")), "[ \t\n\r\f]+")
            ).alias("term")
        )
        .where(F.col("term") != "")
    )
    cnts = toks.groupBy("term").agg(F.count("*").cast("bigint").alias("c"))
    tot = cnts.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("ns")
    )
    retained = (
        cnts.crossJoin(F.broadcast(tot))
        .where(F.col("c") * t_ > F.col("ns"))
        .select("term", "c", "ns")
    )
    sentinel = tot.select(
        F.lit(None).cast("string").alias("term"),
        F.lit(0).cast("bigint").alias("c"),
        "ns",
    )
    return retained.unionByName(sentinel)


@query(
    "b91_stream_hh_maintain",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id % {_HH_STREAM_B} AS shard,
             unnest(string_split_regex(lower(trim(text)),
                                       '[ \\t\\n\\r\\f]+')) AS term
      FROM documents WHERE text IS NOT NULL
    ),
    t AS (SELECT shard, term FROM toks WHERE term <> ''),
    cnts AS (SELECT shard, term, count(*) AS c FROM t GROUP BY 1, 2),
    sn AS (SELECT shard, sum(c) AS ns FROM cnts GROUP BY 1),
    summ AS (
      SELECT c.term, c.c FROM cnts c JOIN sn USING (shard)
      WHERE c.c * {_HH_T} > sn.ns
    ),
    cand AS (SELECT term, sum(c) AS est FROM summ GROUP BY 1),
    truth AS (SELECT term, sum(c) AS cnt FROM cnts GROUP BY 1),
    tot AS (SELECT sum(ns) AS n, sum(ns // {_HH_T}) AS bound FROM sn),
    hh AS (SELECT term, cnt FROM truth, tot WHERE cnt * {_HH_T} > n),
    miss AS (SELECT count(*) AS missed FROM hh
             WHERE term NOT IN (SELECT term FROM cand)),
    err AS (SELECT coalesce(max(t2.cnt - cand.est), 0) AS max_under
            FROM cand JOIN truth t2 USING (term))
    -- multi_batch and maintain_matches are RUNTIME witnesses on the Spark
    -- side (the stream really ran {_HH_STREAM_B} micro-batches; the
    -- maintained candidate estimates equal the batch-split recompute
    -- term-for-term).  The oracle pins their REQUIRED values — the merge
    -- is a deterministic function of the batch split, so a Spark-side 0
    -- in either column is a defect and hash-mismatches (b89's discipline).
    SELECT CAST(tot.n AS BIGINT) AS n_tokens,
           CAST({_HH_STREAM_B} AS BIGINT) AS n_batches,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT count(*) FROM hh) AS BIGINT) AS n_true_hh,
           CAST(miss.missed AS BIGINT) AS n_missed_true_hh,
           CAST(err.max_under AS BIGINT) AS max_undercount,
           CAST(tot.bound AS BIGINT) AS undercount_bound,
           CAST(CASE WHEN err.max_under <= tot.bound THEN 1 ELSE 0 END
                AS BIGINT) AS within_bound,
           CAST(1 AS BIGINT) AS multi_batch,
           CAST(1 AS BIGINT) AS maintain_matches
    FROM tot, miss, err
    """,
    tags=("B12", "B33", "sketch", "streaming"),
    doc="STREAMING heavy-hitters maintenance — the missing member of the "
    "streaming-maintenance triple (r11 verdict #3; KMV=b89, priority "
    "sampling=b90): b84's frequency-over-threshold summary kept up to date "
    "as corpus shards ARRIVE.  A readStream over the documents corpus "
    "staged as four files (maxFilesPerTrigger=1, availableNow) runs "
    "foreachBatch; each micro-batch appends its OWN bounded summary — the "
    "terms strictly above the batch-LOCAL relative threshold (cnt*T > "
    "n_batch, <= T-1 rows by pigeonhole) plus one sentinel row carrying "
    "the batch token total — and the maintained candidate set is the "
    "weighted union (sum of retained counts) of the per-batch summaries "
    "ALONE; prior shards are never re-scanned.  The pigeonhole coverage "
    "theorem now holds across BATCH splits exactly as it does across b84's "
    "doc_id shards: a term with global cnt*T > n must clear the local "
    "threshold in >= 1 batch, so n_missed_true_hh = 0 by mathematics while "
    "data streams in, and every merged estimate undercounts by at most "
    "sum(floor(n_batch/T)) (within_bound pins it).  maintain_matches "
    "WITNESSES end-to-end that the streamed merge equals the batch-split "
    "recompute term-for-term (symmetric difference of the two candidate "
    "relations is empty) — which also makes the result deterministic and "
    "value-exact against a batch DuckDB oracle; multi_batch witnesses >= 2 "
    "real micro-batches (4 run).  This is the op a 100 TB ingest pipeline "
    "actually runs — track the heavy vocabulary while shards arrive: "
    "per-arrival work is ONE map-side-combined count over the arriving "
    "batch, cross-batch state <= T*batches rows (never corpus), and the "
    "final metrics pass joins the vocab-sized truth relation once "
    "(b84's single-exchange discipline).",
)
def b91_stream_hh_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import uuid

    from ._util import scratch_dir

    stage = _stage_stream_files(
        spark, sf_dir, "documents", ("doc_id", "text"),
        "doc_id", "hh_stream_src", n_groups=_HH_STREAM_B,
    )
    run = uuid.uuid4().hex[:12]
    summ_dir = scratch_dir(f"hh_stream_summ_{run}")
    ckpt = scratch_dir(f"hh_stream_ckpt_{run}")
    # try/finally: per-run dirs must not leak on any exit path
    try:
        return _b91_run(spark, sf_dir, stage, summ_dir, ckpt)
    finally:
        shutil.rmtree(summ_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def _b91_run(
    spark: SparkSession, sf_dir: str, stage: str, summ_dir: str, ckpt: str,
) -> DataFrame:
    import os

    T_ = _HH_T

    def update(batch_df: DataFrame, batch_id: int) -> None:
        # THE maintenance step: this batch's own <= T-row summary appended
        # to the store — no prior data touched (_hh_batch_summary is
        # plan-pinned in tests/test_plans.py).
        (
            _hh_batch_summary(batch_df, T_)
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            .coalesce(1)
            .write.mode("append")
            .parquet(summ_dir)
        )

    schema = spark.read.parquet(os.path.join(stage, "g0.parquet")).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        src.writeStream.foreachBatch(update)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # ---- maintained state: the per-batch summaries alone ------------------
    # (<= T rows per batch; candidates = weighted union of retained counts,
    # batch totals recovered from the always-present sentinel rows)
    summ = spark.read.parquet(summ_dir)
    cand_m = (
        summ.where(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.sum("c").cast("bigint").alias("est"))
    )
    nb_rel = summ.groupBy("batch_id").agg(F.max("ns").alias("ns"))
    tot = nb_rel.agg(
        F.sum("ns").cast("bigint").alias("n"),
        F.sum(F.expr(f"ns DIV {T_}")).cast("bigint").alias("bound"),
        F.count("*").cast("bigint").alias("n_batches"),
    )

    # ---- witness: the batch-split recompute over the full corpus ----------
    # (b84's exact shape with shard = the staging group; ONE corpus
    # exchange, every derived relation vocab-sized)
    toks = (
        T(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            F.pmod(F.col("doc_id"), F.lit(_HH_STREAM_B)).alias("shard"),
            F.explode(
                F.split(F.lower(F.trim("text")), "[ \t\n\r\f]+")
            ).alias("term"),
        )
        .where(F.col("term") != "")
    )
    cnts = toks.groupBy("shard", "term").agg(F.count("*").alias("c"))
    sn = cnts.groupBy("shard").agg(F.sum("c").alias("ns"))
    summ_r = cnts.join(F.broadcast(sn), "shard").where(
        F.col("c") * T_ > F.col("ns")
    )
    cand_r = summ_r.groupBy("term").agg(F.sum("c").cast("bigint").alias("est_r"))
    truth = cnts.groupBy("term").agg(F.sum("c").cast("bigint").alias("cnt"))

    # maintained-vs-recompute witness: symmetric difference of the two
    # candidate relations (both vocab-bounded) must be EMPTY
    mism = (
        cand_m.join(cand_r, "term", "full")
        .where(
            F.col("est").isNull()
            | F.col("est_r").isNull()
            | (F.col("est") != F.col("est_r"))
        )
        .agg(F.count("*").cast("bigint").alias("n_mismatch"))
    )

    is_cand = F.col("est").isNotNull()
    is_hh = F.col("cnt") * T_ > F.col("n")
    under = F.max(F.when(is_cand, F.col("cnt") - F.col("est")))
    result = (
        truth.crossJoin(F.broadcast(tot))
        .join(F.broadcast(cand_m), "term", "left")
        .crossJoin(F.broadcast(mism))
        .agg(
            F.max("n").cast("bigint").alias("n_tokens"),
            F.max("n_batches").cast("bigint").alias("n_batches"),
            F.sum(F.when(is_cand, 1).otherwise(0))
            .cast("bigint").alias("n_candidates"),
            F.sum(F.when(is_hh, 1).otherwise(0))
            .cast("bigint").alias("n_true_hh"),
            F.sum(F.when(is_hh & ~is_cand, 1).otherwise(0))
            .cast("bigint").alias("n_missed_true_hh"),
            F.coalesce(under, F.lit(0)).cast("bigint").alias("max_undercount"),
            F.max("bound").cast("bigint").alias("undercount_bound"),
            F.when(F.coalesce(under, F.lit(0)) <= F.max("bound"), 1)
            .otherwise(0).cast("bigint").alias("within_bound"),
            F.when(F.max("n_batches") >= 2, 1)
            .otherwise(0).cast("bigint").alias("multi_batch"),
            F.when(F.max("n_mismatch") == 0, 1)
            .otherwise(0).cast("bigint").alias("maintain_matches"),
        )
    )
    # Eager 1-row checkpoint so the per-run scratch dirs can be removed by
    # the caller's finally before the result is consumed.
    out = result.localCheckpoint(eager=True)
    row = out.first()
    _B91_LAST.clear()
    _B91_LAST.update(
        {"summary_rows": summ.count(), "n_batches": row["n_batches"]}
    )
    return out
