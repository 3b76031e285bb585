"""The ``pslake`` Python Data Source (Spark 4 DataSource API): partition
planning from the store's hash_prefix fan-out, reader-side hash
verification, generation time travel, and the not-a-store error path."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ps_datalake_spark.lake.store import Store
from ps_datalake_spark.sources import PsLakeDataSource
from ps_datalake_spark.sources.pslake_source import (
    _list_chunk_files,
    _resolve_chunks_dir,
)


@pytest.fixture()
def store(spark, tmp_path):
    st = Store.create(spark, str(tmp_path / "store"), prefix_len=1)
    blobs = spark.createDataFrame(
        [(i, bytearray(f"blob-{i}-".encode() * 40)) for i in range(20)],
        "id long, data binary",
    )
    st.put_blobs(blobs).count()
    return st


def _read(spark, st, **opts):
    spark.dataSource.register(PsLakeDataSource)
    r = spark.read.format("pslake").option("path", st.path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_rows_match_catalog_and_hashes_verify(spark, store):
    df = _read(spark, store)
    rows = df.collect()
    assert len(rows) == store.chunks().count()
    assert all(r["hash_ok"] == 1 for r in rows)
    # recorded plaintext size and on-disk length both survive the reader
    cat = {r["hash"]: r for r in store.chunks().collect()}
    for r in rows:
        assert r["size"] == cat[r["hash"]]["size"]
        assert r["stored_len"] == len(bytes(cat[r["hash"]]["data"]))
        assert r["hash_prefix"] == r["hash"][:1]


def test_partition_planning_is_per_chunk_file(store):
    chunks_dir = _resolve_chunks_dir(store.path, 0)
    files = _list_chunk_files(chunks_dir)
    assert len(files) >= 2, "prefix fan-out should yield multiple files"
    reader = PsLakeDataSource(options={"path": store.path}).reader(None)
    assert len(reader.partitions()) == len(files)


def test_generation_time_travel(spark, store):
    with pytest.raises(ValueError, match="no previous chunks generation"):
        _resolve_chunks_dir(store.path, -1)
    n_before = store.chunks().count()
    store.compact(target_file_bytes=1 << 20)
    snap = _read(spark, store, generation="-1")
    cur = _read(spark, store, generation="0")
    assert snap.count() == n_before
    assert cur.count() == n_before  # compact preserves content
    # compact coalesced the per-prefix files — the generations differ on disk
    assert _resolve_chunks_dir(store.path, 0) != _resolve_chunks_dir(store.path, -1)


def test_not_a_store_raises(tmp_path):
    bad = tmp_path / "not_a_store"
    bad.mkdir()
    with pytest.raises(FileNotFoundError):
        _resolve_chunks_dir(str(bad), 0)
    (bad / "manifest.json").write_text(json.dumps({"something": "else"}))
    with pytest.raises(ValueError, match="not a ps-datalake store"):
        _resolve_chunks_dir(str(bad), 0)


def test_corrupted_chunk_is_flagged_not_hidden(spark, store, tmp_path):
    """Flip one byte in one chunk file's data page region → the reader must
    report hash_ok=0 for exactly the damaged rows, never silently pass."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    chunks_dir = _resolve_chunks_dir(store.path, 0)
    f, _prefix = _list_chunk_files(chunks_dir)[0]
    t = pq.read_table(f)
    datas = t.column("data").to_pylist()
    datas[0] = bytes(datas[0][:-1]) + bytes([datas[0][-1] ^ 0xFF])
    cols = {c: t.column(c) for c in t.column_names}
    cols["data"] = pa.array(datas, type=pa.binary())
    pq.write_table(pa.table(cols), f)

    df = _read(spark, store)
    bad = df.where(F.col("hash_ok") == 0).count()
    assert bad == 1
