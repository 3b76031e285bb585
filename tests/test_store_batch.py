"""Distributed get_blobs + maintenance ops (compact, stats)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ps_datalake_spark.lake import Store
from ps_datalake_spark.lake.store import MAX_DECRYPTED_SIZE


def _blob(n: int) -> bytes:
    return bytes((i * 17 + n) % 256 for i in range(n))


def test_get_blobs_all_tiers(spark, tmp_path):
    store = Store.create(spark, str(tmp_path / "batch_store"), prefix_len=1)
    sizes = [0, 10, 128, 500, 5000, MAX_DECRYPTED_SIZE + 5000]
    blobs = {i: _blob(n) for i, n in enumerate(sizes)}
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in blobs.items()], "id long, data binary"
    )
    hkeys = store.put_blobs(df)
    back = store.get_blobs(hkeys)
    got = {r["id"]: bytes(r["data"]) if r["data"] is not None else None for r in back.collect()}
    assert set(got) == set(blobs)
    for i, b in blobs.items():
        assert got[i] == b, f"blob {i} (size {sizes[i]}) mismatched"


def test_duplicate_large_blobs_one_batch(spark, tmp_path):
    """Two identical tree-tier blobs in ONE batch must not duplicate manifest
    rows (regression: double-concatenated tree reads)."""
    store = Store.create(spark, str(tmp_path / "dup_tree_store"), prefix_len=1)
    big = _blob(MAX_DECRYPTED_SIZE + 4096)
    df = spark.createDataFrame(
        [(1, bytearray(big)), (2, bytearray(big))], "id long, data binary"
    )
    hkeys = {r["id"]: r["hkey"] for r in store.put_blobs(df).collect()}
    assert hkeys[1] == hkeys[2]
    n_kids = store.manifests().count()
    assert (
        store.manifests().select("root_hash", "seq").distinct().count() == n_kids
    ), "manifest rows must be unique per (root_hash, seq)"
    assert store.get(hkeys[1]) == big


def test_get_blobs_missing_tree_manifest_is_null(spark, tmp_path):
    store = Store.create(spark, str(tmp_path / "tree_miss_store"), prefix_len=1)
    df = spark.createDataFrame(
        [(9, "tree:" + "0" * 64 + ":123")], "id long, hkey string"
    )
    rows = store.get_blobs(df).collect()
    assert len(rows) == 1 and rows[0]["id"] == 9 and rows[0]["data"] is None


def test_open_detects_wrong_chunk_schema(spark, tmp_path):
    import os

    import pytest as _pytest

    from ps_datalake_spark.errors import Corrupted

    path = str(tmp_path / "schema_store")
    Store.create(spark, path, prefix_len=1)
    # clobber chunks/ with a wrong-typed dataset
    import shutil

    shutil.rmtree(os.path.join(path, "chunks"))
    spark.createDataFrame([("x", "not-a-long", "e", bytearray(b"d"), "p")],
        "hash string, size string, enc string, data binary, hash_prefix string"
    ).write.parquet(os.path.join(path, "chunks"))
    with _pytest.raises(Corrupted):
        Store.open(spark, path)


def test_get_blobs_missing_hash_is_null(spark, tmp_path):
    store = Store.create(spark, str(tmp_path / "miss_store"), prefix_len=1)
    df = spark.createDataFrame(
        [(1, "enc:" + "0" * 64 + ":" + "0" * 64 + ":10")], "id long, hkey string"
    )
    rows = store.get_blobs(df).collect()
    assert len(rows) == 1 and rows[0]["data"] is None


def test_vacuum_sweeps_unreachable(spark, tmp_path):
    store = Store.create(spark, str(tmp_path / "vac_store"), prefix_len=1)
    keep1 = _blob(500)
    keep2 = _blob(MAX_DECRYPTED_SIZE + 4096)  # tree tier
    drop1 = _blob(700)
    hk_keep1 = store.put_blob(keep1)
    hk_keep2 = store.put_blob(keep2)
    hk_drop = store.put_blob(drop1)
    roots = spark.createDataFrame([(hk_keep1,), (hk_keep2,)], "hkey string")
    removed = store.vacuum(roots)
    assert removed >= 1
    # kept blobs still read back; dropped one is gone
    assert store.get(hk_keep1) == keep1
    assert store.get(hk_keep2) == keep2
    import pytest as _pytest

    from ps_datalake_spark.errors import NotFound

    with _pytest.raises(NotFound):
        store.get(hk_drop)
    # vacuum is idempotent
    assert store.vacuum(roots) == 0


def test_compact_and_stats(spark, tmp_path):
    store = Store.create(spark, str(tmp_path / "compact_store"), prefix_len=1)
    # several appends → several files per partition
    for batch in range(3):
        df = spark.createDataFrame(
            [(batch * 10 + i, bytearray(_blob(300 + batch * 10 + i))) for i in range(8)],
            "id long, data binary",
        )
        store.put_blobs(df).count()
    before = store.stats()
    assert before["n_chunks"] == 25  # 24 blobs + sentinel
    n_files = store.compact(target_file_bytes=1 << 20)
    after = store.stats()
    assert after["n_chunks"] == before["n_chunks"], "compaction must not change content"
    assert after["plain_bytes"] == before["plain_bytes"]
    assert n_files <= after["n_partitions"] * 2
    # content still readable after compaction
    assert store.has(store.chunks().select("hash").head()["hash"])


def test_maintenance_is_atomic_for_readers(spark, tmp_path):
    """A reader that planned against the pre-compact generation keeps working
    through (and after) the compaction commit: maintenance publishes a new
    generation directory via an atomic manifest-pointer swap and retains the
    superseded generation (depth 1) instead of deleting the dataset in place
    (r2 verdict #5)."""
    import os

    store = Store.create(spark, str(tmp_path / "atomic_store"), prefix_len=1)
    df = spark.createDataFrame(
        [(i, bytearray(_blob(400 + i))) for i in range(10)], "id long, data binary"
    )
    store.put_blobs(df).count()

    reader = store.chunks()  # plan bound to the pre-compact generation
    n = reader.count()
    store.compact(target_file_bytes=1 << 20)
    # in-flight reader still sees a complete dataset (old generation retained)
    assert reader.count() == n
    # fresh plans resolve the new generation with identical content
    assert store.chunks().count() == n

    # writes after the swap land in the ACTIVE generation and are visible
    store.put_blobs(
        spark.createDataFrame([(99, bytearray(_blob(999)))], "id long, data binary")
    ).count()
    assert store.chunks().count() == n + 1

    # a second maintenance op retires the oldest generation: only the active
    # and its immediate predecessor remain on disk
    store.compact(target_file_bytes=1 << 20)
    gens = [d for d in os.listdir(store.path) if d.startswith("chunks")]
    assert len(gens) == 2
    assert store.chunks().count() == n + 1

    # reopening resolves the pointer from disk (persisted, not in-memory state)
    reopened = Store.open(spark, store.path)
    assert reopened.chunks().count() == n + 1


def test_put_blobs_null_payload_raises(spark, tmp_path):
    """The NULL-payload guard must still fail loudly now that it rides the
    tier-counts aggregate instead of its own head(1) probe job (r12
    optimization: one fewer serial driver action per put)."""
    import pytest

    store = Store.create(spark, str(tmp_path / "null_store"), prefix_len=1)
    df = spark.createDataFrame(
        [(1, bytearray(b"ok")), (2, None)], "id long, data binary"
    )
    with pytest.raises(ValueError, match="NULL 'data' for id 2"):
        store.put_blobs(df)
    # nothing must have been stored besides the create-time sentinel
    assert store.chunks().count() == 1
