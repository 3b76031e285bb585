"""Quality checks for the hash-family operators that can't be oracle-matched:
MinHash-LSH recall vs exact Jaccard, ANN-LSH recall vs brute-force cosine,
SimHash sanity."""

from __future__ import annotations

from ps_datalake_spark.io import load_table
from ps_datalake_spark.operators import dedup as D
from ps_datalake_spark.operators import similarity as S


def test_minhash_recall_vs_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in D.jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in D.minhash_neardup_pairs(
            docs, "doc_id", "text", k=64, bands=16, threshold=0.3
        ).collect()
    }
    assert exact, "fixture should contain planted near-dups"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"MinHash-LSH recall {recall:.2f} < 0.9 ({exact - approx})"


def test_ann_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qids = list(range(10))
    exact = {
        (r.query_id, r.cand_id)
        for r in S.cosine_topk(emb, "vec_id", "embedding", qids, k=1).collect()
    }
    approx = {
        (r.query_id, r.cand_id)
        for r in S.ann_lsh_topk(
            emb, "vec_id", "embedding", qids, k=3, n_planes=4, probe_radius=2
        ).collect()
    }
    # multi-probe (hamming ≤ 2 of 4 planes) should recover the true top-1 for
    # most queries even on this near-random fixture (top-1 cosine ≈ 0.5)
    hits = sum(1 for pair in exact if pair in approx)
    assert hits >= len(exact) * 0.5, f"ANN recall too low: {hits}/{len(exact)}"


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qids = list(range(10))
    exact = {
        (r.query_id, r.cand_id)
        for r in S.cosine_topk(emb, "vec_id", "embedding", qids, k=1).collect()
    }
    approx = {
        (r.query_id, r.cand_id)
        for r in S.ivf_topk(
            emb, "vec_id", "embedding", qids, k=3, n_clusters=8, nprobe=3
        ).collect()
    }
    hits = sum(1 for pair in exact if pair in approx)
    assert hits >= len(exact) * 0.5, f"IVF recall too low: {hits}/{len(exact)}"


def test_blocked_neardup_matches_bruteforce(spark, sf_dir):
    """Exact block-GEMM all-pairs must equal the brute-force theta-join
    (same pairs, cos within 1e-9) — the brute path is test-only."""
    emb = load_table(spark, sf_dir, "embeddings")
    brute = {
        (r.id_a, r.id_b): r.cos
        for r in S.cosine_neardup_pairs(emb, "vec_id", "embedding", threshold=0.4).collect()
    }
    blocked = {
        (r.id_a, r.id_b): r.cos
        for r in S.cosine_neardup_blocked(
            emb, "vec_id", "embedding", threshold=0.4, n_blocks=5
        ).collect()
    }
    assert brute, "fixture should contain pairs above 0.4"
    assert set(brute) == set(blocked)
    for k in brute:
        assert abs(brute[k] - blocked[k]) < 1e-9, k


def test_lsh_neardup_recall_vs_bruteforce(spark, sf_dir):
    """Banded-LSH near-dup at a moderate threshold: candidates must recover
    most brute-force pairs; every surviving pair must be genuine (precision 1
    by construction — exact verify)."""
    emb = load_table(spark, sf_dir, "embeddings")
    brute = {
        (r.id_a, r.id_b)
        for r in S.cosine_neardup_pairs(emb, "vec_id", "embedding", threshold=0.5).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in S.cosine_neardup_lsh(
            emb, "vec_id", "embedding", threshold=0.5, n_planes=64, band_bits=4
        ).collect()
    }
    assert lsh <= brute, "exact verify must make precision 1"
    if brute:
        recall = len(brute & lsh) / len(brute)
        assert recall >= 0.8, f"LSH recall {recall:.2f} < 0.8"


def test_null_text_rows_are_skipped_not_fatal(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, None), (3, "alpha beta gamma delta zeta")],
        "doc_id long, text string",
    )
    assert D.jaccard_pairs(df, "doc_id", "text", threshold=0.1).count() >= 0
    assert D.minhash_signatures(df, "doc_id", "text").count() == 2  # null skipped
    assert D.simhash64(df, "doc_id", "text").count() == 3  # null → empty-token fp


def test_lsh_band_validation():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        D.lsh_candidate_pairs(None, bands=16, sig_len=8)  # bands > sig_len
    with _pytest.raises(ValueError):
        D.lsh_candidate_pairs(None, bands=12, sig_len=64)  # non-multiple


def test_xxhash64_replica_matches_spark(spark):
    """The b39_frame_sample oracle predicts Spark's xxhash64 with a pure-Python
    XXH64 replica — byte-for-byte equality over a signed id range is the
    load-bearing invariant (a drift here silently breaks the planted oracle)."""
    from pyspark.sql import functions as F

    from ps_datalake_spark.operators.multimodal import xxhash64_long

    rows = spark.range(-500, 2500).select("id", F.xxhash64("id").alias("h")).collect()
    assert rows, "range collect must not be empty"
    for r in rows:
        assert r.h == xxhash64_long(r.id), f"xxhash64 mismatch at id={r.id}"


def test_simhash_is_deterministic_and_selective(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fp1 = {r.doc: r.simhash for r in D.simhash64(docs, "doc_id", "text").collect()}
    fp2 = {r.doc: r.simhash for r in D.simhash64(docs, "doc_id", "text").collect()}
    assert fp1 == fp2
    pairs = D.simhash_neardup_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    n_docs = docs.count()
    assert len(pairs) < n_docs * 5, "simhash should be selective, not all-pairs"


def test_png_codec_roundtrip_all_filters():
    """encode_png/_parse_png: every scanline filter type (None/Sub/Up/
    Average/Paeth) must reconstruct the identical pixel array — byte-level,
    no Spark involved. Uses a gradient+bands image so filters see nonzero
    deltas in both axes (uniform bands alone would under-exercise Paeth)."""
    import numpy as np

    from ps_datalake_spark.operators import multimodal as M

    for ft in range(5):
        for w, h in ((1, 1), (4, 7), (13, 5)):
            raw = M.encode_png(w, h, (10, 200, 30), (255, 0, 127), filter_type=ft)
            img = M._parse_png(raw)
            want = np.zeros((h, w, 3), dtype=np.uint8)
            want[: h // 2] = (10, 200, 30)
            want[h // 2 :] = (255, 0, 127)
            assert img.shape == (h, w, 3), (ft, w, h)
            assert (img == want).all(), f"filter {ft} {w}x{h} mismatch"

    # adversarial content: deterministic pseudo-random pixels, all filters
    rng = np.random.RandomState(7)
    for ft in range(5):
        pix = rng.randint(0, 256, size=(6, 9, 3), dtype=np.uint8)
        # build via the private path: monkey-encode by temporarily treating
        # the random image as bands is impossible, so filter the actual
        # array through encode internals — re-encode with filter 0 via zlib
        import struct
        import zlib

        stride = 9 * 3
        body = bytearray()
        prev = np.zeros(stride, dtype=int)
        for y in range(6):
            line = pix[y].reshape(-1).astype(int)
            left = np.concatenate([np.zeros(3, dtype=int), line[:-3]])
            if ft == 0:
                out = line
            elif ft == 1:
                out = (line - left) % 256
            elif ft == 2:
                out = (line - prev) % 256
            elif ft == 3:
                out = (line - (left + prev) // 2) % 256
            else:
                upleft = np.concatenate([np.zeros(3, dtype=int), prev[:-3]])
                pred = np.array(
                    [M._paeth_predict(int(a), int(b), int(c))
                     for a, b, c in zip(left, prev, upleft)]
                )
                out = (line - pred) % 256
            body.append(ft)
            body.extend(out.astype(np.uint8).tobytes())
            prev = line
        ihdr = struct.pack(">IIBBBBB", 9, 6, 8, 2, 0, 0, 0)
        png = (
            b"\x89PNG\r\n\x1a\n"
            + M._png_chunk(b"IHDR", ihdr)
            + M._png_chunk(b"IDAT", zlib.compress(bytes(body)))
            + M._png_chunk(b"IEND", b"")
        )
        got = M._parse_png(png)
        assert (got == pix).all(), f"random-content filter {ft} mismatch"


def test_png_rejects_unsupported_variants():
    import pytest as _pytest

    from ps_datalake_spark.operators import multimodal as M

    with _pytest.raises(ValueError):
        M._parse_png(b"NOTAPNG")
    with _pytest.raises(ValueError):
        M.encode_png(2, 2, (0, 0, 0), (1, 1, 1), filter_type=9)


def test_tfidf_planted_vocab_collision_free(spark):
    """b37_tfidf_ml's value-level oracle is only valid while the planted
    vocabulary maps to DISTINCT HashingTF buckets (no murmur3 collisions at
    numFeatures=2^16) and contains no English stopwords; a vocab edit that
    introduces either would silently invalidate the textbook-formula oracle."""
    from pyspark.ml.feature import HashingTF, StopWordsRemover, Tokenizer

    from ps_datalake_spark.queries.llm_ops import _TFIDF_STOPWORDS, _TFIDF_VOCAB

    df = spark.createDataFrame([(0, " ".join(_TFIDF_VOCAB))], ["doc_id", "text"])
    words = Tokenizer(inputCol="text", outputCol="words").transform(df)
    tf = HashingTF(inputCol="words", outputCol="tf", numFeatures=1 << 16)
    vec = tf.transform(words).head().tf
    assert vec.numNonzeros() == len(_TFIDF_VOCAB), "HashingTF bucket collision in planted vocab"

    english = set(StopWordsRemover.loadDefaultStopWords("english"))
    assert not set(_TFIDF_VOCAB) & english, "planted vocab term is a stopword"
    assert set(_TFIDF_STOPWORDS) <= english, "planted stopword not in remover's list"


def test_audio_pcm_roundtrip_properties(spark):
    """synth_pcm packs int16-LE bytes that audio_features recovers exactly:
    byte length = 2 * n_samples, features equal a direct numpy evaluation of
    the closed-form waveform, and NULL-free output for every input id."""
    import numpy as np

    from ps_datalake_spark.operators import multimodal as M

    ids = spark.range(0, 17).withColumnRenamed("id", "vec_id")
    feats = {
        r["id"]: r
        for r in M.audio_features(M.synth_pcm(ids, "vec_id")).collect()
    }
    assert len(feats) == 17
    for i in range(17):
        n = 800 + (i % 5) * 80
        f = 3 + i % 7
        s = ((np.arange(n, dtype=np.int64) * f) % 2000) - 1000
        r = feats[i]
        assert r["n_bytes"] == 2 * n
        assert r["n_samples"] == n
        assert r["rms"] == float(np.sqrt((s * s).sum() / n))
        assert r["peak"] == int(np.abs(s).max())
        assert r["zero_crossings"] == int((s[:-1] * s[1:] < 0).sum())
        assert r["sample_sum"] == int(s.sum())


def test_video_container_roundtrip_and_errors(spark):
    """PSV1 pack/parse round-trip invariants plus the two corruption paths
    (bad magic, payload/header mismatch) — the decode must FAIL LOUDLY on a
    torn blob, never mis-reshape silently."""
    import struct

    import numpy as np
    import pytest

    from ps_datalake_spark.operators import multimodal as M

    from pyspark.sql import functions as F

    ids = spark.range(0, 25).select(F.col("id").alias("vec_id"))
    feats = M.video_features(M.synth_video(ids, "vec_id"), every_nth=5).collect()
    assert len(feats) == 25
    for r in feats:
        w, h, n = 8 + r.id % 9, 8 + (r.id * 3) % 9, 12 + r.id % 19
        assert (r.width, r.height, r.n_frames) == (w, h, n)
        assert r.n_bytes == 16 + n * w * h
        assert r.n_sampled == (n + 4) // 5
        # sampled mean luma stays inside the pixel range
        assert 0 <= r.luma_sum <= 255 * r.n_sampled * w * h
        assert r.motion_sum >= 0

    # direct (non-Spark) corruption paths through the same batch fn
    import pandas as pd

    good = M.VIDEO_MAGIC + struct.pack("<HHIH2x", 2, 2, 1, 24) + bytes(4)
    bad_magic = b"XXXX" + good[4:]
    torn = good[:-2]  # payload shorter than header claims

    def run(buf):
        df = spark.createDataFrame(
            pd.DataFrame({"id": [0], "video": [buf], "n_frames": [1]})
        )
        return M.video_features(df).collect()

    assert run(good)[0].luma_sum == 0
    with pytest.raises(Exception, match="magic"):
        run(bad_magic)
    with pytest.raises(Exception, match="mismatch"):
        run(torn)
