"""Similarity search over embedding columns (array<float>).

Brute-force cosine is the correctness baseline (JVM-side zip_with/aggregate —
no Python in the loop). The scale path is deterministic random-projection LSH:
bucket on sign bits, search only within buckets.

Scale design (100 TB): brute-force top-k broadcasts the (small) query set and
scans the corpus once — no shuffle of the corpus itself. LSH reduces the
candidate set per query to one bucket; bucket skew is bounded by n_planes.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col) -> Column:
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """NULL (not NaN) for zero-norm vectors — NaN sorts above every real
    score in Spark, which would silently win every top-k."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def quantize_int8(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Per-vector symmetric int8 quantization — the storage-compression path
    of a 100 TB embedding store (4× smaller than float32, 8× than float64).

    scale = max(|v|)/127; q_i = floor(v_i/scale + 0.5) clamped to [-127,127]
    (explicit half-up floor so an oracle reproduces the exact integers —
    engine round() half-even/half-up differences never enter). Zero vectors
    quantize to zeros with scale 0. Everything is JVM higher-order
    expressions: no Python, shuffle-free, embarrassingly parallel."""
    v = _as_double(vec_col)
    absmax = F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
    scale = absmax / F.lit(127.0)
    q = F.when(scale == 0, F.transform(v, lambda x: F.lit(0).cast("int"))).otherwise(
        F.transform(
            v,
            lambda x: F.greatest(
                F.lit(-127), F.least(F.lit(127), F.floor(x / scale + F.lit(0.5)).cast("int"))
            ),
        )
    )
    return emb.select(
        F.col(id_col),
        scale.alias("q_scale"),
        q.alias("q"),
        F.transform(q, lambda qi: qi.cast("double") * scale).alias("dequant"),
        v.alias("_orig"),
    )


def cosine_topk(
    emb: DataFrame, id_col: str, vec_col: str, query_ids: list[int], k: int = 3
) -> DataFrame:
    """Brute-force cosine top-k: query matrix shipped to every task, one
    corpus scan, BLAS matmul per Arrow batch, JVM-side top-k merge.

    The query set is collected to the driver (it is small by contract) and
    closed over as a normalized numpy matrix — the standard exact-kNN shape:
    no corpus shuffle, per-batch GEMM, then a row_number window over the
    (batch × queries) scores. ~10× faster than expression-tree dot products
    (Spark higher-order lambdas are interpreted) and the arithmetic matches
    the oracle because everything is float64.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.window import Window

    q_rows = (
        emb.where(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("qid"), _as_double(vec_col).alias("qvec"))
        .collect()
    )
    q_ids = np.array([r["qid"] for r in q_rows], dtype=np.int64)
    Q = np.stack([np.asarray(r["qvec"], dtype=np.float64) for r in q_rows])
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)

    def _score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["cvec"]])
            # zero-norm guard: a zero vector scores 0 against everything
            # instead of producing NaNs that outrank real matches
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
            S = Cn @ Qn.T  # (batch, n_queries)
            cand = pdf["cand_id"].to_numpy()
            n_c, n_q = S.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids[None, :], n_c, axis=0).ravel(),
                    "cand_id": np.repeat(cand, n_q),
                    "cos": S.ravel(),
                }
            )

    base = emb.select(F.col(id_col).alias("cand_id"), _as_double(vec_col).alias("cvec"))
    scored = base.mapInPandas(_score, "query_id long, cand_id long, cos double").where(
        F.col("cand_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "cand_id", "cos", F.col("rnk").cast("bigint").alias("rnk"))
    )


def cosine_neardup_pairs(emb: DataFrame, id_col: str, vec_col: str, threshold: float) -> DataFrame:
    """All pairs with cosine >= threshold (brute force, id_a < id_b).

    TEST-ONLY oracle baseline: the theta-join is an unkeyed cartesian —
    O(n^2) rows through a BroadcastNestedLoopJoin.  Production paths are
    :func:`cosine_neardup_blocked` (exact, keyed block-GEMM) and
    :func:`cosine_neardup_lsh` (sub-quadratic, for true near-dup thresholds).
    """
    a = emb.select(F.col(id_col).alias("id_a"), _as_double(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), _as_double(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def cosine_neardup_blocked(
    emb: DataFrame, id_col: str, vec_col: str, threshold: float, n_blocks: int = 8
) -> DataFrame:
    """Exact all-pairs cosine >= threshold without a cartesian product.

    Exact all-pairs at an arbitrary threshold is inherently O(n^2) *compute*;
    the scalable shape is to organize it as block-GEMM rather than a
    row-by-row nested loop: hash every vector into one of ``n_blocks``
    buckets, enumerate the O(n_blocks^2) unordered block pairs as join keys,
    co-locate each block pair with a keyed shuffle (each row is replicated
    ~n_blocks times — O(n * n_blocks) rows moved, tunable), and run one BLAS
    matmul per block pair inside applyInPandas.  Every unordered id pair is
    scored in exactly one task: the task keyed (min(block_a, block_b),
    max(block_a, block_b)).  The plan is a hash shuffle + grouped map — no
    CartesianProduct / BroadcastNestedLoopJoin node (asserted in
    tests/test_plans.py).

    At 100 TB: n_blocks scales with the corpus so one block fits executor
    memory; replication cost n*n_blocks is the standard exact-all-pairs
    trade.  For genuine near-dup thresholds (>= ~0.8) prefer
    :func:`cosine_neardup_lsh`, which is sub-quadratic.

    ``id_col`` must be an integral type: the output schema is
    ``id_a long, id_b long`` and pair canonicalisation uses numeric
    min/max over the id domain.  String/decimal ids raise up front rather
    than coercing silently (ADVICE r2).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as SqlT

    id_type = emb.schema[id_col].dataType
    if not isinstance(id_type, (SqlT.ByteType, SqlT.ShortType, SqlT.IntegerType, SqlT.LongType)):
        raise TypeError(
            f"cosine_neardup_blocked requires an integral id column; "
            f"{id_col!r} is {id_type.simpleString()} (hash it to BIGINT first)"
        )

    base = emb.select(
        F.col(id_col).alias("vid"), _as_double(vec_col).alias("vec")
    ).withColumn("blk", F.pmod(F.xxhash64(F.col("vid")), F.lit(n_blocks)).cast("int"))

    # side L: this block as p, partnered with every q >= p
    left = base.select(
        F.col("blk").alias("p"),
        F.explode(F.sequence(F.col("blk"), F.lit(n_blocks - 1))).alias("q"),
        F.lit("L").alias("side"),
        "vid",
        "vec",
    )
    # side R: this block as q, partnered with every p <= q
    right = base.select(
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("p"),
        F.col("blk").alias("q"),
        F.lit("R").alias("side"),
        "vid",
        "vec",
    )
    tagged = left.unionByName(right)

    def _score(key, pdf):
        p, q = key
        lmask = pdf["side"] == "L"
        L = pdf[lmask]
        R = pdf[~lmask]
        if len(L) == 0 or len(R) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos": "float64"}
            )
        Lx = np.stack([np.asarray(v, dtype=np.float64) for v in L["vec"]])
        Rx = np.stack([np.asarray(v, dtype=np.float64) for v in R["vec"]])
        Ln = Lx / np.maximum(np.linalg.norm(Lx, axis=1, keepdims=True), 1e-300)
        Rn = Rx / np.maximum(np.linalg.norm(Rx, axis=1, keepdims=True), 1e-300)
        S = Ln @ Rn.T
        lid = L["vid"].to_numpy()
        rid = R["vid"].to_numpy()
        ii, jj = np.nonzero(S >= threshold)
        if p == q:
            # same set on both sides: keep strictly-lower id pairs once
            keep = lid[ii] < rid[jj]
        else:
            # disjoint hash blocks: every (L, R) pair is distinct
            keep = lid[ii] != rid[jj]
        ii, jj = ii[keep], jj[keep]
        id_a = np.minimum(lid[ii], rid[jj])
        id_b = np.maximum(lid[ii], rid[jj])
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "cos": S[ii, jj]})

    return tagged.groupBy("p", "q").applyInPandas(_score, "id_a long, id_b long, cos double")


def cosine_neardup_lsh(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_planes: int = 64,
    band_bits: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Sub-quadratic near-dup pairs: banded sign-signature LSH candidates,
    exact cosine verification on candidates only.

    Each vector gets an ``n_planes``-bit sign signature (one GEMM against the
    deterministic blake2b planes, Arrow-batched); the signature splits into
    ``n_planes / band_bits`` bands and a pair becomes a candidate iff it
    collides in at least one band — a keyed equi-join on (band_idx,
    band_val), O(sum of bucket^2) not O(n^2).  Candidates are deduped then
    verified with exact cosine.

    Collision probability per plane is 1 - angle/pi, so recall is high only
    for genuine near-dup thresholds (cos >= ~0.8); vectors that differ by a
    positive per-coordinate scaling have *identical* signatures and are
    recalled with probability 1.  For exhaustive low-threshold scans use
    :func:`cosine_neardup_blocked`.
    """
    import numpy as np
    import pandas as pd

    if n_planes % band_bits != 0:
        raise ValueError(f"n_planes={n_planes} must be a multiple of band_bits={band_bits}")
    n_bands = n_planes // band_bits
    if dim is None:
        first = emb.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"]) if first else 0
    planes = np.asarray(_projection_planes(n_planes, dim), dtype=np.float64)

    base = emb.select(F.col(id_col).alias("vid"), _as_double(vec_col).alias("vec"))

    def _bands(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
            bits = (X @ planes.T) > 0  # (n, n_planes)
            vid = pdf["vid"].to_numpy()
            out = []
            for b in range(n_bands):
                chunk = bits[:, b * band_bits : (b + 1) * band_bits]
                vals = chunk @ (1 << np.arange(band_bits, dtype=np.int64))
                out.append(
                    pd.DataFrame({"vid": vid, "band_idx": np.int32(b), "band_val": vals})
                )
            yield pd.concat(out, ignore_index=True)

    sigs = base.mapInPandas(_bands, "vid long, band_idx int, band_val long")
    cand = (
        sigs.alias("a")
        .join(
            sigs.alias("b"),
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.vid") < F.col("b.vid"),
            ],
        )
        .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"))
        .distinct()
    )
    va = base.select(F.col("vid").alias("id_a"), F.col("vec").alias("va"))
    vb = base.select(F.col("vid").alias("id_b"), F.col("vec").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def ivf_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 3,
    n_clusters: int = 16,
    iters: int = 2,
    nprobe: int = 2,
) -> DataFrame:
    """ANN via an IVF (inverted-file) index: deterministic k-means coarse
    quantizer, exact cosine inside the nprobe nearest cells.

    Centroid init = the vectors of the n_clusters smallest ids (deterministic,
    no RNG); `iters` Lloyd rounds with assignment as a per-batch numpy argmax
    (corpus never shuffles) and centroid update as a driver-side reduce of
    per-batch partial sums (n_clusters×dim floats — KB-sized at any corpus
    scale). At 100 TB the corpus is *written* partitioned by cell so probing
    nprobe cells is partition pruning; here the cell join expresses the plan.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.window import Window

    base = emb.select(F.col(id_col).alias("cand_id"), _as_double(vec_col).alias("cvec"))
    base = base.persist()
    try:
        seed_rows = base.orderBy("cand_id").limit(n_clusters).collect()
        n_clusters = min(n_clusters, len(seed_rows))  # corpus smaller than k
        if n_clusters == 0:
            return emb.sparkSession.createDataFrame(
                [], "query_id long, cand_id long, cos double, rnk bigint"
            )
        C = np.stack(
            [np.asarray(r["cvec"], dtype=np.float64) for r in seed_rows[:n_clusters]]
        )
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)

        for _ in range(iters):
            Cb = C  # capture

            def _partials(batches, Cb=Cb):
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["cvec"]])
                    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
                    assign = (Xn @ Cb.T).argmax(axis=1)
                    out = {"cell": [], "n": [], "vsum": []}
                    for c in np.unique(assign):
                        out["cell"].append(int(c))
                        out["n"].append(int((assign == c).sum()))
                        out["vsum"].append(Xn[assign == c].sum(axis=0).tolist())
                    yield pd.DataFrame(out)

            # JVM-side partial reduce: posexplode the per-batch partial sums
            # and hash-aggregate per (cell, dim) so the driver collects one
            # already-reduced n_clusters x dim table (not O(batches) rows).
            # Each source row repeats n across its dims; counting it at dim 0
            # only yields the per-cell row count in the same aggregation.
            parts = base.mapInPandas(_partials, "cell int, n long, vsum array<double>")
            reduced = (
                parts.select("cell", "n", F.posexplode("vsum").alias("pos", "val"))
                .groupBy("cell", "pos")
                .agg(
                    F.sum("val").alias("s"),
                    F.sum(F.when(F.col("pos") == 0, F.col("n")).otherwise(0)).alias("cnt0"),
                )
                .collect()
            )
            sums = np.zeros_like(C)
            counts = np.zeros(n_clusters)
            for r in reduced:
                sums[r["cell"], r["pos"]] = r["s"]
                if r["pos"] == 0:
                    counts[r["cell"]] = r["cnt0"]
            nonzero = counts > 0
            C[nonzero] = sums[nonzero] / counts[nonzero, None]
            C = C / np.linalg.norm(C, axis=1, keepdims=True)

        Cf = C

        def _assign(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["cvec"]])
                Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
                yield pdf.assign(cell=(Xn @ Cf.T).argmax(axis=1).astype("int32"))

        cells = base.mapInPandas(_assign, "cand_id long, cvec array<double>, cell int")

        # queries probe their nprobe nearest cells
        q_rows = base.where(F.col("cand_id").isin(query_ids)).collect()
        probe_rows = []
        for r in q_rows:
            qv = np.asarray(r["cvec"], dtype=np.float64)
            qn = qv / np.linalg.norm(qv)
            order = np.argsort(-(Cf @ qn))[:nprobe]
            for cell in order:
                probe_rows.append((int(r["cand_id"]), int(cell)))
        probes = F.broadcast(
            emb.sparkSession.createDataFrame(probe_rows, "query_id long, cell int")
        )
        qvecs = F.broadcast(
            base.where(F.col("cand_id").isin(query_ids)).select(
                F.col("cand_id").alias("query_id"), F.col("cvec").alias("qvec")
            )
        )
        scored = (
            cells.join(probes, "cell")
            .join(qvecs, "query_id")
            .where(F.col("cand_id") != F.col("query_id"))
            .select(
                "query_id", "cand_id", cosine(F.col("qvec"), F.col("cvec")).alias("cos")
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("query_id", "cand_id", "cos", F.col("rnk").cast("bigint").alias("rnk"))
            .localCheckpoint(eager=True)
        )
    finally:
        base.unpersist()


def _projection_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from blake2b — no RNG state."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.blake2b(struct.pack("<II", p, d), digest_size=8).digest()
            u = int.from_bytes(h, "big") / 2**64  # [0, 1)
            row.append(u - 0.5)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id of a vector under the projection planes (JVM expr)."""
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(w) for w in plane])
        bit = (dot(vec, lit_plane) > 0).cast("bigint")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def _probe_buckets(n_planes: int, radius: int) -> list[int]:
    """XOR masks for multi-probe: all bucket codes within hamming ≤ radius."""
    from itertools import combinations

    masks = [0]
    for r in range(1, radius + 1):
        for bits in combinations(range(n_planes), r):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


def ann_lsh_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 3,
    n_planes: int = 6,
    dim: int | None = None,
    probe_radius: int = 1,
) -> DataFrame:
    """ANN: random-projection LSH bucketing + multi-probe, exact cosine within
    the probed buckets.

    At scale the corpus is written bucketed by `bucket` (partition pruning →
    each query reads only its probed buckets); here the bucket join expresses
    the same plan. Multi-probe (hamming ≤ probe_radius around the query's
    bucket) trades bounded extra reads for recall — the standard remedy when
    neighbors sit near the decision boundary of a projection.
    """
    from pyspark.sql.window import Window

    if dim is None:
        # infer from the data: a wrong dim makes zip_with null-pad and every
        # bucket NULL → silently empty results
        first = emb.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"]) if first else 0
    planes = _projection_planes(n_planes, dim)
    base = emb.select(
        F.col(id_col).alias("cand_id"),
        _as_double(vec_col).alias("cvec"),
    ).withColumn("bucket", lsh_bucket(F.col("cvec"), planes))
    masks = _probe_buckets(n_planes, probe_radius)
    qs = F.broadcast(
        base.where(F.col("cand_id").isin(query_ids))
        .select(
            F.col("cand_id").alias("query_id"),
            F.col("cvec").alias("qvec"),
            F.explode(
                F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
            ).alias("qbucket"),
        )
    )
    scored = (
        base.join(qs, F.col("bucket") == F.col("qbucket"))
        .where(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cosine(F.col("qvec"), F.col("cvec")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "cand_id", "cos", F.col("rnk").cast("bigint").alias("rnk"))
    )
