"""Deduplication operators for large-scale text corpora.

Four tiers, all deterministic:

* exact:       sha2 content hash + groupBy            (b34)
* n-gram Jaccard: exact set similarity on shingles    (b35, oracle-checkable)
* MinHash+LSH: banded signatures, candidate join      (b35, scale path)
* SimHash:     64-bit fingerprints + hamming banding  (b35, scale path)

Scale design (100 TB): every pairwise step is keyed — shingle join for the
exact tier (bounded by shingle df), (band_idx, band_hash) join for LSH — never
an unkeyed cross join. Signatures are fixed-width (K longs), so the LSH
shuffle is O(docs × bands), independent of document length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plandump import dump_plan


def tokenize(text: Column) -> Column:
    """Lowercased whitespace tokens (matches DuckDB string_split_regex)."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def _spread(df: DataFrame) -> DataFrame:
    """Ensure enough partitions to parallelize an Arrow-batched Python pass.

    A small corpus under a large maxPartitionBytes scans as 1-2 tasks, which
    serializes the per-document Python work (shingling/signatures) onto one
    worker — measured 13.6 s for the 10x-scale MinHash pass that the cluster
    should spread 32-way. Conditional: at real scale the scan already has
    plenty of splits and the repartition (a full shuffle of raw text) would
    be pure waste, so only widen when the source is narrower than half the
    available parallelism."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a MATERIALIZED token-array column.

    ``toks`` must reference a column that already holds the token array
    (project :func:`tokenize` into its own select first): slicing an inline
    split() expression re-runs the regex split per element — O(tokens^2)
    per document, the defect class the round-6 scale re-measure caught in
    b70_memorization_rate.

    Guarded for short docs: Spark's sequence(1, 0) is *descending*, so the
    index range must be gated on size ≥ n.
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(F.size(toks) >= n, F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )).otherwise(F.array().cast("array<string>"))


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Content-hash dedup: one row per distinct content, keeper = min id.

    Mirrors the reference's content-addressed put-idempotence
    (/root/reference/src/store/mod.rs:321-326) at corpus scale.
    """
    h = F.sha2(F.col(content_col).cast("binary"), 256).alias("content_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("copies"),
        )
    )


def jaccard_pairs_lazy(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.3,
    spread: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Exact n-gram Jaccard pairs, UNMATERIALIZED: returns (pairs, shingles).

    The caller must run exactly one action (or checkpoint) over ``pairs``
    and then unpersist the returned ``shingles`` handle.  Exists so a
    pipeline whose next step is itself a materialization barrier (b42's
    final aggregate) can FUSE the two barriers into one eager action
    instead of two serial ones (guide §5 driver; r13 A/B: b42 12.32 ->
    11.72 s at 10x, 1.40 -> 1.35 s at sf0.1, fused won every settled
    round).  :func:`jaccard_pairs` is the materializing wrapper with the
    original contract.
    """
    # One shingle materialization feeds both join sides AND the size table
    # (shingling via interpreted higher-order expressions computed 3× tripled
    # the cost of this operator). Shingles are generated in Arrow batches and
    # hashed to int64 (blake2b/8B) immediately: the posting-list join then
    # shuffles and compares fixed-width longs instead of ~20-char strings.
    # (Collision probability over n shingles ≈ n²/2^65 — irrelevant here.)
    #
    # Plan shape, A/B-measured at the 10x probe (r5): |A|,|B| come from a
    # separate per-doc `sizes` aggregate re-joined after the posting join —
    # NOT carried on every posting row.  The carried-size variant ships 50%
    # wider rows through BOTH sides of the self-join shuffle (the dominant
    # cost) and was 25% slower at 10x (24.7 s vs 31.1 s end-to-end in b42);
    # the sizes aggregate is map-side-combined to ~one row per doc per task,
    # and AQE converts the two size re-joins to broadcasts.  persist: the two
    # self-join sides cannot share a scan via exchange reuse (Python map
    # stages are planner-nondeterministic), so the Arrow pass would run twice
    # without the cache.
    import hashlib

    import pandas as pd

    def _shingle_rows(batches):
        for pdf in batches:
            out_doc, out_sh = [], []
            for doc, text in zip(pdf["doc"], pdf["text"]):
                if text is None:  # dirty rows are skipped, not fatal
                    continue
                toks = text.lower().split()
                if len(toks) < n:
                    continue
                grams = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
                for g in grams:
                    out_doc.append(doc)
                    out_sh.append(
                        int.from_bytes(
                            hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest(),
                            "big",
                            signed=True,
                        )
                    )
            yield pd.DataFrame(
                {"doc": pd.Series(out_doc, dtype="int64"), "sh": pd.Series(out_sh, dtype="int64")}
            )

    src = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("text"))
    # spread=False lets a caller whose input is already post-shuffle (e.g. the
    # b42 pipeline after its dedup window) skip the widening exchange, which
    # at small scale costs more than the Python pass it parallelizes
    sh = (_spread(src) if spread else src).mapInPandas(
        _shingle_rows, "doc long, sh long"
    ).persist()
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
    return out, sh


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.3,
    spread: bool = True,
) -> DataFrame:
    """Materialized exact n-gram Jaccard pairs (id_a < id_b, j >= threshold).

    Shuffle is keyed on the shingle (posting-list join), so cost is
    sum(df_shingle²) not docs² — the standard exact-verification stage after
    an LSH candidate pass at scale.
    """
    out, sh = jaccard_pairs_lazy(
        df, id_col, text_col, n=n, threshold=threshold, spread=spread
    )
    try:
        dump_plan(out, "jaccard_pairs_builder")  # pre-checkpoint builder job
        return out.localCheckpoint(eager=True)
    finally:
        sh.unpersist()


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 64, n: int = 3
) -> DataFrame:
    """K-permutation MinHash signatures, vectorized in Arrow batches.

    One blake2b per distinct shingle, then K affine permutations as a numpy
    matrix op; the signature is the per-permutation min. Shuffle-free.
    """
    # blake2b per distinct shingle, then K affine permutations
    # h_i = (a_i*h + b_i) mod 2^31-1 — the classic universal-hashing MinHash
    # construction, fully vectorized in numpy over Arrow batches. Shuffle-free
    # and embarrassingly parallel (the shape a 100 TB corpus needs). An
    # Arrow-batched UDF beats the pure-expression alternatives here: Spark
    # higher-order-function lambdas execute interpreted (~10× slower), and a
    # 64-aggregate groupBy adds a pointless shuffle.
    import hashlib

    import numpy as np
    import pandas as pd

    P = (1 << 31) - 1
    rnd = __import__("random").Random(42)
    A = np.array([rnd.randrange(1, P) for _ in range(k)], dtype=np.int64)[:, None]
    B = np.array([rnd.randrange(0, P) for _ in range(k)], dtype=np.int64)[:, None]

    def _sign(batches):
        for pdf in batches:
            out_doc, out_sig = [], []
            for doc, text in zip(pdf["doc"], pdf["text"]):
                if text is None:  # dirty rows are skipped, not fatal
                    continue
                toks = text.lower().split()
                if len(toks) < n:
                    continue
                grams = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
                h = np.frombuffer(
                    b"".join(
                        hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest()
                        for g in sorted(grams)
                    ),
                    dtype=">i8",
                ) % P
                sig = ((A * h[None, :] + B) % P).min(axis=1)
                out_doc.append(doc)
                out_sig.append(sig.tolist())
            yield pd.DataFrame(
                {
                    "doc": pd.Series(out_doc, dtype="int64"),
                    # object dtype: an all-skipped batch must not degrade the
                    # empty column to float64 (Arrow needs list<int64>)
                    "sig": pd.Series(out_sig, dtype="object"),
                }
            )

    src = _spread(df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("text")))
    return src.mapInPandas(_sign, "doc long, sig array<long>")


def banded_signatures(sig_df: DataFrame, bands: int = 16, sig_len: int = 64) -> DataFrame:
    """The banded-LSH relation (doc, band_idx, band_hash) — one row per
    (doc, band).  This relation IS the near-dup index an incremental
    pipeline persists (b92): 16 bigint rows per document, proportional to
    document COUNT, never to text size.

    `sig_len` must be a positive multiple of `bands` — with rows-per-band 0
    every band hash would collide and the join degenerates to all-pairs; a
    non-multiple would silently drop the tail signature components.
    """
    if bands <= 0 or sig_len <= 0 or bands > sig_len or sig_len % bands != 0:
        raise ValueError(f"sig_len ({sig_len}) must be a positive multiple of bands ({bands})")
    r = sig_len // bands
    return sig_df.select(
        "doc",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        F.concat_ws(
                            ",",
                            *[F.col("sig").getItem(b * r + i).cast("string") for i in range(r)],
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )


def lsh_candidate_pairs(sig_df: DataFrame, bands: int = 16, sig_len: int = 64) -> DataFrame:
    """Banded LSH: docs agreeing on any band of the signature become candidates.

    Bucket-aggregate shape (r13, guide §2.1/§2.4): the banded relation is
    BANDED ONCE and crosses ONE hash exchange — groupBy (band_idx,
    band_hash) collects each bucket's sorted doc array and pairs are
    generated in-partition by higher-order expressions (x from position i
    pairs with every later y, so id_a < id_b with no duplicates inside a
    bucket; a doc appears at most once per bucket by construction).  The
    previous self-join evaluated the banding expression on BOTH join sides
    (two Generate branches over the cached signatures — exchange/subtree
    reuse cannot fire across the planner-nondeterministic Python signature
    stage) and then either built a bucket-count-sized broadcast hash
    relation per run (the executed AQE plan at the probes,
    plans/r13/b35_lsh_candidates_10x_before.txt) or, above the broadcast
    threshold at real scale, paid two full hash exchanges into the join.
    Interleaved A/B: 3.528 -> 3.383 s at the 10x corpus (won every round;
    sf0.1 a wash at ~1.7 s).  Output pair multiset is identical; the same
    trailing distinct dedups across bands.  A pathological all-duplicates
    bucket costs one 8m-byte array here vs a streamed m-row join partition
    before — both shapes then pay the same O(m²) candidate explosion
    downstream, so the memory delta is not the binding constraint."""
    banded = banded_signatures(sig_df, bands=bands, sig_len=sig_len)
    buckets = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.array_sort(F.collect_list("doc")).alias("ds"))
        .where(F.size("ds") >= 2)
    )
    return (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ds, (x, i) -> "
                    "transform(slice(ds, i + 2, size(ds)), "
                    "y -> struct(x AS id_a, y AS id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def minhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """MinHash-LSH near-dup detection with estimated-Jaccard scoring.

    est_jaccard = fraction of the K signature components that agree.
    """
    # persist: the signature computation feeds the band join AND both sides
    # of the verification join — without it the shingle pass runs 3×;
    # checkpoint the (small) result so the cache can be released eagerly
    sigs = minhash_signatures(df, id_col, text_col, k=k, n=n).persist()
    try:
        cands = lsh_candidate_pairs(sigs, bands=bands, sig_len=k)
        sa = sigs.select(F.col("doc").alias("id_a"), F.col("sig").alias("sig_a"))
        sb = sigs.select(F.col("doc").alias("id_b"), F.col("sig").alias("sig_b"))
        agree = F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        )
        out = (
            cands.join(sa, "id_a")
            .join(sb, "id_b")
            .select("id_a", "id_b", (agree / F.lit(k)).alias("est_jaccard"))
            .where(F.col("est_jaccard") >= threshold)
        )
        dump_plan(out, "minhash_neardup_pairs_builder")  # pre-checkpoint job
        return out.localCheckpoint(eager=True)
    finally:
        sigs.unpersist()


def connected_components(
    pairs: DataFrame, nodes: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Connected components over near-dup pairs: label propagation to the
    minimum id (the classic iterative Spark pattern; dedup clustering's last
    step — each cluster keeps its min-id doc).

    `pairs` has (id_a, id_b); `nodes` has (doc). Returns (doc, cluster) where
    cluster = min doc id reachable. Each iteration is one join + groupBy-min;
    lineage is cut per round with localCheckpoint so plans stay flat. Converges
    in O(log(diameter)) rounds for near-dup graphs (tiny diameters).
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = nodes.select(F.col("doc"), F.col("doc").alias("cluster"))
    for _ in range(max_iter):
        # neighbor's best label, merged with own
        candidate = (
            edges.join(labels, edges.dst == labels.doc)
            .select(F.col("src").alias("doc"), F.col("cluster"))
            .unionByName(labels)
            .groupBy("doc")
            .agg(F.min("cluster").alias("cluster"))
            .localCheckpoint(eager=True)
        )
        changed = (
            candidate.alias("n")
            .join(labels.alias("o"), "doc")
            .where(F.col("n.cluster") != F.col("o.cluster"))
            .limit(1)
            .count()
        )
        labels = candidate
        if changed == 0:
            break
    edges.unpersist()
    return labels


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash fingerprints (Arrow-batched pandas UDF for bit packing).

    Token hashing uses blake2b(digest_size=8) — deterministic across
    processes (unlike Python's salted hash()).
    """
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies them,
    # which pandas_udf's hint inference can't resolve → legacy SCALAR mode
    @pandas_udf("long")
    def _simhash(texts):
        shifts = np.arange(64, dtype=np.uint64)
        one = np.uint64(1)
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            acc = np.zeros(64, dtype=np.int64)
            for tok in (t.lower().split() if t is not None else ()):
                h = np.uint64(
                    int.from_bytes(
                        hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "big"
                    )
                )
                bits = (h >> shifts) & one
                acc += np.where(bits == one, 1, -1)
            fp = np.bitwise_or.reduce(np.where(acc > 0, one << shifts, np.uint64(0)))
            out[i] = np.int64(fp.view(np.int64)) if isinstance(fp, np.uint64) else int(fp)
        return pd.Series(out)

    return _spread(df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("text"))).select(
        "doc", _simhash(F.col("text")).alias("simhash")
    )


def simhash_neardup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs: band the 64 bits into 4×16-bit keys (any equal
    band → candidate, guaranteed to catch hamming ≤ 3 by pigeonhole), then
    exact hamming via bit_count(xor)."""
    fps = simhash64(df, id_col, text_col)
    banded = fps.select(
        "doc",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("band_idx", "band_key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)
