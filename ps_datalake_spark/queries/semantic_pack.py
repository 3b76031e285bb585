"""Round-6 semantic-curation operators: SemDeDup-style cluster-pruned
embedding dedup, per-domain unigram KL divergence, OOV-rate filtering
against a bounded frequency vocabulary, exact substring (n-gram span)
duplication metrics, and per-dimension embedding standardisation — five
further stages of a 100 TB pre-training curation pipeline.

Scale design notes (100 TB):
  * SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): embeddings are clustered
    first, and the O(n²) cosine comparison happens only WITHIN a cluster —
    the pairwise cost is Σ|cluster|², never corpus².  The cluster pass here
    is one broadcast nested-loop over a bounded k-row centroid relation
    (identical shape to b71_kmeans_step); the within-cluster pairwise stage
    is a cluster-keyed shuffle into ONE exact int64 GEMM per cluster
    (Arrow-batched grouped map, the b36 block-GEMM shape) — the pair
    self-join formulation evaluated ~25M interpreted zip_with lambdas at
    10x sf0.1 (65 s vs 6 s).  At 100 TB k grows to ~√n and the per-cluster
    populations stay bounded, so one cluster always fits its task.
  * unigram KL: both distributions reduce to one bounded-width aggregate
    over the token postings (map-side combined); the per-(source, token)
    relation joins the global token relation on the token key.  Per-term
    log-ratios are quantised onto an exact 1e-6 integer grid BEFORE the
    weighted sum (the b70 DSIR discipline), so the divergence is an
    associative BIGINT sum — deterministic under any partitioning.
  * OOV rate: the vocabulary is a BOUNDED relation (top 1000 tokens) at any
    corpus size, so membership is a broadcast left join — no shuffle of the
    posting relation at all.
  * substring dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): the w-token shingle postings shuffle once on
    the shingle key; per-key work is bounded by document frequency, never
    corpus².  At 100 TB the shingle string is first collapsed to an 8-byte
    xxhash64 so the shuffle carries fixed-width keys (here the exact string
    is kept so the DuckDB oracle groups on identical values).
  * z-score standardisation: the statistics relation is one bounded-width
    aggregate (64 rows — map-side combined sums/sum-of-squares in exact
    DECIMAL), broadcast back over the corpus — the apply pass is
    shuffle-free.  sqrt and division are IEEE-correctly-rounded, so
    identical exact-integer moments give identical doubles on both engines.

Determinism: every count is an exact integer; each ln() receives an
identical IEEE double on both engines (a ratio of exact integers), is
quantised to a 1e-6-grid BIGINT, and only integers are summed thereafter.
The cosine threshold test is exact integer arithmetic throughout —
dot² · 10⁴ ≥ τ²·10⁴ · |a|² · |b|² evaluated in DECIMAL(38,0)/HUGEINT, no
floating point at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ._util import T, tiny_sort

_K = 8          # SemDeDup cluster count (bounded => centroids broadcast)
_TAU2_E4 = 1225  # cosine threshold τ=0.35 → τ²·10000 = 1225
# (the synthetic embedding fixture is near-isotropic — max pairwise cosine
#  ≈ 0.51, p99 ≈ 0.29 — so a web-scale τ of 0.9 would never fire; 0.35
#  exercises the prune on a meaningful fraction of within-cluster pairs)
_V = 16         # OOV vocabulary size (fixture vocab is 31 distinct
                # tokens; production V ~1e5 is equally bounded/broadcast)


def _quantised(emb_col):
    """Embedding components on the exact 1e-6 integer grid (b71 discipline)."""
    return F.transform(
        emb_col, lambda x: F.round(x.cast("double") * 1000000.0).cast("bigint")
    )


@query(
    "b72_semdedup",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS e
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    c AS (SELECT vec_id AS cid, e AS ce FROM q ORDER BY vec_id LIMIT {_K}),
    d AS (
      SELECT q.vec_id, c.cid, q.e,
             CAST(list_sum(list_transform(generate_series(1, 64),
               i -> (q.e[i] - c.ce[i]) * (q.e[i] - c.ce[i]))) AS BIGINT) AS dist
      FROM q, c
    ),
    a AS (
      SELECT vec_id, cid, e FROM (
        SELECT vec_id, cid, e,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d) WHERE rn = 1
    ),
    n AS (
      SELECT vec_id, cid, e,
             CAST(list_sum(list_transform(e, x -> x * x)) AS BIGINT) AS nrm
      FROM a
    ),
    dup AS (
      SELECT DISTINCT vec_id FROM (
        SELECT b.vec_id,
               CAST(list_sum(list_transform(generate_series(1, 64),
                 i -> a.e[i] * b.e[i])) AS BIGINT) AS dot,
               a.nrm AS a_nrm, b.nrm AS b_nrm
        FROM n AS a JOIN n AS b
          ON a.cid = b.cid AND a.vec_id < b.vec_id)
      WHERE dot > 0
        AND CAST(dot AS HUGEINT) * dot * 10000
            >= {_TAU2_E4} * CAST(a_nrm AS HUGEINT) * b_nrm
    )
    SELECT n.cid,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(count(*) FILTER (dup.vec_id IS NOT NULL) AS BIGINT) AS n_dropped,
           CAST(sum(n.vec_id) FILTER (dup.vec_id IS NULL) AS BIGINT)
             AS kept_checksum
    FROM n LEFT JOIN dup ON n.vec_id = dup.vec_id
    GROUP BY n.cid ORDER BY n.cid
    """,
    tags=("B36", "llm", "curation"),
    doc="SemDeDup semantic deduplication: embeddings quantised to an exact "
    "1e-6 integer grid are assigned to the nearest of k seed centroids "
    "(exact BIGINT L2, deterministic tie-break — the b71_kmeans_step "
    "cluster pass), then WITHIN each cluster a vector is dropped when any "
    "lower-vec_id member has cosine similarity > 0.35 — the greedy "
    "keep-first variant of the paper's per-cluster pruning.  The cosine "
    "test is exact integer arithmetic (dot²·10⁴ ≥ 1225·|a|²·|b|², float64 "
    "screen + arbitrary-precision recheck of the ambiguous sliver), so no "
    "float decides any pair.  Pairwise cost is Σ|cluster|², never corpus², "
    "organised as one int64 GEMM per cluster inside an Arrow-batched "
    "grouped map (the b36 block-GEMM shape) — each cluster's quadratic "
    "work is one C-loop matmul local to its task.",
)
def b72_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = T(spark, sf_dir, "embeddings").where(F.col("embedding").isNotNull())
    q = emb.select("vec_id", _quantised(F.col("embedding")).alias("e"))
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
    assigned = (
        q.crossJoin(F.broadcast(cent))
        .select("vec_id", "cid", "e", dist)
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("vec_id").orderBy("dist", "cid")),
        )
        .where(F.col("rn") == 1)
        .select(
            "vec_id",
            "cid",
            "e",
            F.aggregate(
                F.transform("e", lambda x: x * x),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("nrm"),
        )
        # three consumers (both pair-join sides + the final rollup) — without
        # the checkpoint each re-runs the k-way crossJoin + per-vector window
        # (measured ~2/3 of total query time at 10x sf0.1)
        .localCheckpoint(eager=False)
    )
    # Within-cluster pairwise stage as ONE int64 GEMM per cluster (the
    # b36_cosine_neardup block-GEMM shape): the self-join + zip_with dot
    # product evaluated ~25M 64-element higher-order lambdas at 10x sf0.1
    # (65 s); the grouped-map matmul is C-loop numpy over the same exact
    # integers (components <= 1e6, so |dot| <= 64e12 — no int64 overflow).
    # The threshold decision stays EXACT: a float64 screen classifies pairs
    # whose two sides differ by > 1e-9 relative (float64 error ~1e-16), and
    # the ambiguous sliver is re-checked in arbitrary-precision Python ints.
    import numpy as np
    import pandas as pd

    def _cluster_dups(key, pdf):
        if len(pdf) < 2:
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64")})
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy(np.int64)
        E = np.asarray([np.asarray(v, dtype=np.int64) for v in pdf["e"]])
        G = E @ E.T
        nrm = np.diag(G)
        ii, jj = np.triu_indices(len(ids), k=1)  # ids sorted => id[ii] < id[jj]
        dot = G[ii, jj]
        lf = dot.astype(np.float64) ** 2 * 10000.0
        rf = float(_TAU2_E4) * nrm[ii].astype(np.float64) * nrm[jj].astype(np.float64)
        pos = dot > 0
        band = 1e-9 * np.maximum(lf, rf)
        keep = pos & (lf - rf > band)
        for k in np.nonzero(pos & (np.abs(lf - rf) <= band))[0]:
            d, na, nb = int(dot[k]), int(nrm[ii[k]]), int(nrm[jj[k]])
            if d * d * 10000 >= _TAU2_E4 * na * nb:
                keep[k] = True
        return pd.DataFrame({"vec_id": np.unique(ids[jj[keep]])})

    dup = (
        assigned.select("cid", "vec_id", "e")
        .groupBy("cid")
        .applyInPandas(_cluster_dups, "vec_id long")
        .withColumn("is_dup", F.lit(True))
    )
    out = (
        assigned.join(dup, "vec_id", "left")
        .groupBy("cid")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.count(F.when(F.col("is_dup"), 1)).cast("bigint").alias("n_dropped"),
            F.sum(F.when(F.col("is_dup").isNull(), F.col("vec_id")))
            .cast("bigint")
            .alias("kept_checksum"),
        )
    )
    return tiny_sort(out, "cid")


@query(
    "b72_domain_kl",
    oracle=r"""
    WITH toks AS (
      SELECT source, unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
      FROM documents WHERE text IS NOT NULL
    ),
    sc AS (SELECT source, w, count(*) AS c_sw FROM toks GROUP BY source, w),
    gc AS (SELECT w, count(*) AS c_w FROM toks GROUP BY w),
    ns AS (SELECT source, sum(c_sw) AS n_s FROM sc GROUP BY source),
    n AS (SELECT sum(c_w) AS n FROM gc),
    terms AS (
      SELECT sc.source, sc.c_sw,
             CAST(round(ln((CAST(sc.c_sw AS DOUBLE) * n.n)
                           / (CAST(ns.n_s AS DOUBLE) * gc.c_w))
                        * 1000000.0) AS BIGINT) AS k_e6
      FROM sc JOIN gc USING (w) JOIN ns USING (source) CROSS JOIN n
    )
    SELECT terms.source,
           CAST(ns.n_s AS BIGINT) AS n_tokens,
           CAST(round(CAST(sum(terms.c_sw * terms.k_e6) AS DOUBLE) / ns.n_s)
                AS BIGINT) AS kl_e6
    FROM terms JOIN ns ON terms.source = ns.source
    GROUP BY terms.source, ns.n_s
    ORDER BY terms.source
    """,
    tags=("B37", "llm", "curation"),
    doc="Per-domain unigram KL divergence KL(P_source || P_corpus) — the "
    "domain-distinctiveness score a mixture designer reads before setting "
    "sampling weights.  Each term's log probability ratio "
    "ln(c_sw·N / (N_s·c_w)) is a function of four exact integers, "
    "quantised to a 1e-6-grid BIGINT before the weighted sum, so the "
    "divergence is an associative integer sum divided once at the end.  "
    "Both unigram relations are map-side-combined aggregates over the "
    "token postings; the term join is keyed on the token.",
)
def b72_domain_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = docs.select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    )
    # tokenize + aggregate ONCE (the b64_bm25 discipline): the per-(source,
    # token) counts are bounded by |sources| x |vocab|, so every downstream
    # relation (global token counts, per-source totals, the corpus total)
    # derives from this checkpointed relation instead of re-tokenizing the
    # corpus once per consumer branch — one pass over 100 TB, not four
    sc = (
        toks.groupBy("source", "w")
        .agg(F.count("*").alias("c_sw"))
        .localCheckpoint(eager=False)
    )
    gc = sc.groupBy("w").agg(F.sum("c_sw").alias("c_w"))
    ns = sc.groupBy("source").agg(F.sum("c_sw").alias("n_s"))
    n = gc.agg(F.sum("c_w").alias("n"))
    terms = (
        sc.join(gc, "w")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "c_sw",
            "n_s",
            F.round(
                F.log(
                    (F.col("c_sw").cast("double") * F.col("n"))
                    / (F.col("n_s").cast("double") * F.col("c_w"))
                )
                * 1000000.0
            )
            .cast("bigint")
            .alias("k_e6"),
        )
    )
    out = (
        terms.groupBy("source", "n_s")
        .agg(F.sum(F.col("c_sw") * F.col("k_e6")).alias("s_e6"))
        .select(
            "source",
            F.col("n_s").cast("bigint").alias("n_tokens"),
            F.round(F.col("s_e6").cast("double") / F.col("n_s"))
            .cast("bigint")
            .alias("kl_e6"),
        )
    )
    return tiny_sort(out, "source")


@query(
    "b72_oov_rate",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
      FROM documents WHERE text IS NOT NULL
    ),
    vocab AS (
      SELECT w FROM (
        SELECT w, count(*) AS c FROM toks GROUP BY w
        ORDER BY c DESC, w LIMIT {_V})
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (vocab.w IS NULL) AS BIGINT) AS n_oov,
           CAST(round(CAST(count(*) FILTER (vocab.w IS NULL) AS DOUBLE)
                      * 1000000.0 / count(*)) AS BIGINT) AS oov_ppm
    FROM toks LEFT JOIN vocab USING (w)
    GROUP BY doc_id
    """,
    tags=("B37", "llm", "curation"),
    doc="Out-of-vocabulary rate per document against the corpus's top-V "
    "frequency vocabulary (ties broken by token string) — the cheap "
    "garbled-text / wrong-language filter that runs before expensive "
    "model-based scoring.  The vocabulary is a bounded relation at any "
    "corpus size, so membership is a broadcast left join over the token "
    "postings: no shuffle of the corpus-proportional side at all.  All "
    "counts exact integers; the ppm ratio is one double division of "
    "identical integers on both engines.",
)
def b72_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    )
    vocab = (
        toks.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(_V)
        .select("w", F.lit(True).alias("in_vocab"))
    )
    out = (
        toks.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.count(F.when(F.col("in_vocab").isNull(), 1))
            .cast("bigint")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov").cast("double") * 1000000.0 / F.col("n_tokens"))
            .cast("bigint")
            .alias("oov_ppm"),
        )
    )
    return out


_W = 5  # shingle width (production w≈50 tokens; fixture docs are 20-70
        # tokens, and w=5 duplicates ~9% of shingles — non-degenerate)


@query(
    "b73_substring_dedup",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
      FROM documents WHERE text IS NOT NULL
    ),
    sh AS (
      SELECT doc_id, array_to_string(ws[i:i+{_W - 1}], ' ') AS g
      FROM toks, unnest(range(1, len(ws) - {_W} + 2)) AS t(i)
      WHERE len(ws) >= {_W}
    ),
    df AS (SELECT g, count(DISTINCT doc_id) AS n_docs FROM sh GROUP BY g)
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(*) FILTER (df.n_docs > 1) AS BIGINT) AS n_dup,
           CAST(round(CAST(count(*) FILTER (df.n_docs > 1) AS DOUBLE)
                      * 1000000.0 / count(*)) AS BIGINT) AS dup_ppm
    FROM sh JOIN df USING (g)
    GROUP BY sh.doc_id
    """,
    tags=("B34", "llm", "curation"),
    doc="Exact substring duplication metrics (Lee et al. 2022): every "
    f"{_W}-token shingle of every document is posted, shingles occurring "
    "in more than one document are marked, and each document reports its "
    "duplicated-span fraction — the signal the dedup pass uses to cut "
    "verbatim-repeated boilerplate out of pre-training text.  Shape: the "
    "checkpointed shingle postings feed (a) a map-side-combining min/max "
    "aggregate whose min(doc)!=max(doc) rows form the dup-shingle set and "
    "(b) a shuffle_hash join against that set (never broadcast — the set "
    "is corpus-proportional); per-doc totals come straight from the token "
    "counts, no join.  The shingle collapses to xxhash64 BEFORE the "
    "checkpoint, so the postings relation and both shuffles carry 8-byte "
    "keys instead of ~w-word strings (measured 13.1 s -> under the 2x bar "
    "at the 10x corpus).  Collision safety: 64-bit keys over ~1e8 distinct "
    "shingles give a ~3e-7 birthday probability of ANY colliding pair, and "
    "a collision only perturbs the dup marking of one shingle; the DuckDB "
    "oracle joins on the exact string, so the driver hash-match "
    "independently witnesses collision-freeness at fixture scale.",
)
def b73_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("ws")
    ).where(F.size("ws") >= _W)
    # generate the shingle postings ONCE (the b64_bm25 single-
    # materialization discipline): three consumers read the checkpointed
    # relation instead of re-tokenizing the corpus per branch
    # xxhash64 the shingle at generation time: the checkpointed postings and
    # every downstream shuffle carry an 8-byte key, not a w-word string
    # (width was the 10x-corpus bottleneck — 13.1 s with string keys).
    sh = (
        toks.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - (_W - 1)),
                    lambda i: F.xxhash64(F.array_join(F.slice("ws", i, _W), " ")),
                )
            ).alias("g"),
        )
        .localCheckpoint(eager=False)
    )
    # per-doc totals need no join at all: every position is a shingle
    totals = toks.select(
        "doc_id", (F.size("ws") - (_W - 1)).cast("bigint").alias("n_shingles")
    )
    # cross-document occurrence == min(doc) != max(doc): a plain min/max
    # aggregate that combines map-side, instead of count_distinct's
    # expand-to-(g,doc) two-phase plan that shuffles every posting row.
    # The dup-shingle relation is CORPUS-PROPORTIONAL: it must never
    # broadcast (a size misestimate OOMs the driver at 10x sf0.1 — the b69
    # broadcast-limit bug class); shuffle_hash keeps the per-key build
    # bounded by the partition, not the corpus.
    dupset = (
        sh.groupBy("g")
        .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
        .where(F.col("mn") != F.col("mx"))
        .select("g")
    )
    ndup = (
        sh.join(dupset.hint("shuffle_hash"), "g")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_dup"))
    )
    out = (
        totals.join(ndup, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_dup", F.lit(0)).cast("bigint").alias("n_dup"),
            F.round(
                F.coalesce("n_dup", F.lit(0)).cast("double")
                * 1000000.0
                / F.col("n_shingles")
            )
            .cast("bigint")
            .alias("dup_ppm"),
        )
    )
    return out


@query(
    "b73_zscore_normalize",
    oracle=r"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS e
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    d AS (
      SELECT q.vec_id, t.i AS dim, q.e[t.i] AS v
      FROM q, unnest(range(1, len(q.e) + 1)) AS t(i)
    ),
    s AS (
      SELECT dim, count(*) AS n, sum(v) AS s1,
             sum(CAST(v AS HUGEINT) * v) AS s2
      FROM d GROUP BY dim
    ),
    st AS (
      SELECT dim,
             CAST(round(CAST(s1 AS DOUBLE) / n) AS BIGINT) AS mean_e6,
             CAST(round(sqrt(CAST(n * s2 - CAST(s1 AS HUGEINT) * s1
                                  AS DOUBLE)) / n) AS BIGINT) AS std_e6
      FROM s
    )
    SELECT d.vec_id,
           CAST(sum(CAST(round((d.v - st.mean_e6) * 10000.0 / st.std_e6)
                         AS BIGINT)) AS BIGINT) AS z_sum_e4,
           CAST(min(CAST(round((d.v - st.mean_e6) * 10000.0 / st.std_e6)
                         AS BIGINT)) AS BIGINT) AS z_min_e4,
           CAST(max(CAST(round((d.v - st.mean_e6) * 10000.0 / st.std_e6)
                         AS BIGINT)) AS BIGINT) AS z_max_e4
    FROM d JOIN st USING (dim)
    GROUP BY d.vec_id
    """,
    tags=("B36", "llm", "curation"),
    doc="Per-dimension z-score standardisation of the embedding corpus — "
    "the feature-scaling pass before clustering or linear probes.  "
    "Components are quantised to the exact 1e-6 integer grid; per-dimension "
    "moments are exact DECIMAL sums (map-side combined, 64-row result); "
    "mean and std are single IEEE-correctly-rounded ops on identical exact "
    "integers, so both engines see bit-identical statistics.  The apply "
    "pass joins the broadcast 64-row stats relation — shuffle-free over "
    "the corpus — and reports per-vector checksum/min/max of the "
    "1e-4-quantised z-scores.",
)
def b73_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = T(spark, sf_dir, "embeddings").where(F.col("embedding").isNotNull())
    q = emb.select("vec_id", _quantised(F.col("embedding")).alias("e"))
    d = q.select("vec_id", F.posexplode("e").alias("dim", "v"))
    s = d.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("s2"),
    )
    st = s.select(
        "dim",
        F.round(F.col("s1").cast("double") / F.col("n"))
        .cast("bigint")
        .alias("mean_e6"),
        F.round(
            F.sqrt(
                (
                    F.col("n").cast("decimal(38,0)") * F.col("s2")
                    - F.col("s1").cast("decimal(38,0)") * F.col("s1")
                ).cast("double")
            )
            / F.col("n")
        )
        .cast("bigint")
        .alias("std_e6"),
    )
    z = F.round(
        (F.col("v") - F.col("mean_e6")) * F.lit(10000.0) / F.col("std_e6")
    ).cast("bigint")
    out = (
        d.join(F.broadcast(st), "dim")
        .groupBy("vec_id")
        .agg(
            F.sum(z).cast("bigint").alias("z_sum_e4"),
            F.min(z).cast("bigint").alias("z_min_e4"),
            F.max(z).cast("bigint").alias("z_max_e4"),
        )
    )
    return out
