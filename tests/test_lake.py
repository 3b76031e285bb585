"""Lake-core property tests (SURVEY.md §5.2-1): round-trips across every size
routing threshold, put idempotence/dedup, federation precedence + waterfall,
readonly/corruption handling, hkey codec bijectivity, config round-trip,
convergent-encryption determinism."""

from __future__ import annotations

import json
import os

import pytest

from ps_datalake_spark.config import LakeConfig, StoreEntry
from ps_datalake_spark.errors import Corrupted, NotFound, OutOfStores, StoreReadOnly
from ps_datalake_spark.lake import Hkey, Lake, Store
from ps_datalake_spark.lake import crypto
from ps_datalake_spark.lake.store import MAX_DECRYPTED_SIZE, MAX_SIZE_RAW


@pytest.fixture()
def store(spark, tmp_path):
    return Store.create(spark, str(tmp_path / "store1"), prefix_len=1)


SIZES = [
    0,
    1,
    MAX_SIZE_RAW - 1,
    MAX_SIZE_RAW,
    MAX_SIZE_RAW + 1,
    4096,
    MAX_DECRYPTED_SIZE - 1,
    MAX_DECRYPTED_SIZE,
    MAX_DECRYPTED_SIZE + 1,
    int(MAX_DECRYPTED_SIZE * 2.5),
]


def _blob(n: int) -> bytes:
    # deterministic, non-repeating-ish content
    return bytes((i * 131 + i // 251) % 256 for i in range(n))


def test_roundtrip_every_threshold(store):
    blobs = {n: _blob(n) for n in SIZES}
    hkeys = {n: store.put_blob(b) for n, b in blobs.items()}
    for n, b in blobs.items():
        assert store.get(hkeys[n]) == b, f"round-trip failed at size {n}"
    # routing kinds
    assert hkeys[MAX_SIZE_RAW].startswith("raw:")
    assert hkeys[MAX_SIZE_RAW + 1].split(":")[0] in ("enc", "plain")
    assert hkeys[MAX_DECRYPTED_SIZE + 1].startswith("tree:")


def test_put_idempotent_dedup(store, spark):
    data = _blob(5000)
    hk1 = store.put_blob(data)
    n_chunks = store.chunks().count()
    hk2 = store.put_blob(data)
    assert hk1 == hk2, "convergent encryption must make puts deterministic"
    assert store.chunks().count() == n_chunks, "second put must not add chunks"


def test_distributed_put_blobs(store, spark):
    df = spark.createDataFrame(
        [(i, bytearray(_blob(200 + i))) for i in range(20)], "id long, data binary"
    )
    out = {r["id"]: r["hkey"] for r in store.put_blobs(df).collect()}
    assert len(out) == 20
    for i in range(20):
        assert store.get(out[i]) == _blob(200 + i)


def test_readonly_store_rejects_writes(spark, tmp_path):
    path = str(tmp_path / "ro")
    Store.create(spark, path, prefix_len=1)
    ro = Store.open(spark, path, readonly=True)
    with pytest.raises(StoreReadOnly):
        ro.put_blob(b"x" * 500)


def test_corrupted_manifest(spark, tmp_path):
    path = str(tmp_path / "bad")
    Store.create(spark, path, prefix_len=1)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump({"magic": "not-a-datalake"}, f)
    with pytest.raises(Corrupted):
        Store.open(spark, path)
    with pytest.raises(Corrupted):
        Store.open(spark, str(tmp_path / "never-created"))


def test_get_missing_hash_raises(store):
    with pytest.raises(NotFound):
        store.get("enc:" + "0" * 64 + ":" + "0" * 64 + ":10")


def test_federation_waterfall_and_precedence(spark, tmp_path):
    cfg = LakeConfig(
        stores=(
            StoreEntry(filename=str(tmp_path / "s1")),
            StoreEntry(filename=str(tmp_path / "s2")),
        )
    )
    lake = Lake.open(spark, cfg, prefix_len=1)
    # writes land in the first writable store
    hk = lake.put_blob(_blob(600))
    assert lake.get(hk) == _blob(600)
    assert lake.writable[0].has(Hkey.decode(hk).hash)
    assert not lake.writable[1].has(Hkey.decode(hk).hash)
    # blob only in the second store is still found (waterfall)
    hk2 = lake.writable[1].put_blob(_blob(700))
    assert lake.get(hk2) == _blob(700)
    # readonly-first config: writes skip to the writable store
    cfg2 = LakeConfig(
        stores=(
            StoreEntry(filename=str(tmp_path / "s1"), readonly=True),
            StoreEntry(filename=str(tmp_path / "s2")),
        )
    )
    lake2 = Lake.open(spark, cfg2, prefix_len=1)
    hk3 = lake2.put_blob(_blob(800))
    assert lake2.writable[0].path.endswith("s2")
    assert lake2.get(hk3) == _blob(800)
    # all-readonly lake: OutOfStores
    cfg3 = LakeConfig(stores=(StoreEntry(filename=str(tmp_path / "s1"), readonly=True),))
    lake3 = Lake.open(spark, cfg3, prefix_len=1)
    with pytest.raises(OutOfStores):
        lake3.put_blob(b"z" * 500)


def test_federated_chunks_first_match(spark, tmp_path):
    cfg = LakeConfig(
        stores=(
            StoreEntry(filename=str(tmp_path / "fa")),
            StoreEntry(filename=str(tmp_path / "fb")),
        )
    )
    lake = Lake.open(spark, cfg, prefix_len=1)
    data = _blob(900)
    lake.writable[0].put_blob(data)
    lake.writable[1].put_blob(data)  # same content in both stores
    fed = lake.chunks()
    dup_hash = Hkey.decode(lake.writable[0].put_blob(data)).hash
    rows = fed.where(fed.hash == dup_hash).collect()
    assert len(rows) == 1 and rows[0]["store_priority"] == 0


def test_hkey_codec_bijective():
    cases = [
        Hkey(kind="raw", inline=b"\x00\xffhello", size=0),
        Hkey(kind="plain", hash="ab" * 32, size=12345),
        Hkey(kind="enc", hash="cd" * 32, key="ef" * 32, size=999),
        Hkey(kind="tree", hash="12" * 32, size=10_000_000),
    ]
    for hk in cases:
        assert Hkey.decode(hk.encode()) == hk


def test_config_roundtrip():
    cfg = LakeConfig(
        stores=(StoreEntry("/a/b", readonly=True), StoreEntry("/c/d", readonly=False))
    )
    assert LakeConfig.from_toml_str(cfg.to_toml_string()) == cfg


def test_decrypt_branches_on_recorded_cipher():
    """Readers must decrypt with the cipher RECORDED for the chunk, never the
    environment default (ADVICE: blake2b store read where 'cryptography' is
    installed previously failed or silently returned garbage)."""
    p = _blob(5_000)
    k = crypto.convergent_key(p)
    c_blake = crypto.encrypt_as("blake2b-ctr", p, k)
    # blake2b-written chunk reads fine regardless of environment default
    assert crypto.decrypt_as("blake2b-ctr", c_blake, k) == p
    if crypto.cipher_available("aes-gcm-siv"):
        c_aes = crypto.encrypt_as("aes-gcm-siv", p, k)
        assert crypto.decrypt_as("aes-gcm-siv", c_aes, k) == p
        assert c_aes != c_blake
        # cross-cipher decryption is a loud Corrupted, not silent garbage
        with pytest.raises(Corrupted):
            crypto.decrypt_as("aes-gcm-siv", c_blake, k)
        assert crypto.decrypt_as("blake2b-ctr", c_aes, k) != p  # unauthenticated XOR
    with pytest.raises(Corrupted):
        crypto.decrypt_as("rot13", b"x", k)


def test_open_rejects_unknown_cipher(spark, tmp_path):
    path = str(tmp_path / "weird-cipher")
    Store.create(spark, path, prefix_len=1)
    mf = os.path.join(path, "manifest.json")
    with open(mf) as f:
        manifest = json.load(f)
    manifest["cipher"] = "rot13"
    with open(mf, "w") as f:
        json.dump(manifest, f)
    with pytest.raises(Corrupted):
        Store.open(spark, path)


def test_convergent_encryption_properties():
    p = _blob(10_000)
    k = crypto.convergent_key(p)
    c1 = crypto.encrypt(p, k)
    c2 = crypto.encrypt(p, k)
    assert c1 == c2, "encryption must be deterministic (dedup depends on it)"
    assert crypto.decrypt(c1, k) == p
    assert c1 != p
    # different plaintext → different key → different ciphertext
    p2 = _blob(10_001)
    assert crypto.encrypt(p2, crypto.convergent_key(p2)) != c1


# -- A20 analog: exclusive write lease (src/store/atomic.rs:8-57) -----------


def _hold_lease(path: str, pid: int | None = None, age_sec: float = 0.0) -> str:
    """Simulate another writer's lease file."""
    import time

    lease = os.path.join(path, "write.lease")
    with open(lease, "w") as f:
        json.dump(
            {"pid": os.getpid() if pid is None else pid, "ts": time.time() - age_sec,
             "op": "test"},
            f,
        )
    return lease


def test_write_lease_blocks_concurrent_mutation(store, spark):
    """put/compact/vacuum against a store whose lease another LIVE process
    holds must fail cleanly with StoreBusy — never interleave silently
    (the put-during-vacuum lost-write scenario from the r3 verdict)."""
    from ps_datalake_spark.errors import StoreBusy

    store.put_blob(_blob(4096))  # some content, lease released afterwards
    assert not os.path.exists(os.path.join(store.path, "write.lease"))

    _hold_lease(store.path)  # our own live pid plays the "other writer"
    with pytest.raises(StoreBusy):
        store.put_blob(_blob(500))
    with pytest.raises(StoreBusy):
        store.compact()
    with pytest.raises(StoreBusy):
        store.vacuum(spark.createDataFrame([("plain:deadbeef:1",)], "hkey string"))
    os.unlink(os.path.join(store.path, "write.lease"))

    # after release: mutation works again and the lease is cleaned up
    hk = store.put_blob(_blob(600))
    assert store.get(hk) == _blob(600)
    assert not os.path.exists(os.path.join(store.path, "write.lease"))


def test_write_lease_breaks_stale_holders(store):
    """Leases of dead pids or beyond TTL are broken (poisoned-lock recovery,
    src/error.rs:71-75 analog), so a crashed writer never bricks the store."""
    # dead-pid lease
    _hold_lease(store.path, pid=2**22 + 12345)  # beyond linux default pid_max
    hk = store.put_blob(_blob(700))
    assert store.get(hk) == _blob(700)
    # expired lease (live pid, ancient timestamp)
    _hold_lease(store.path, age_sec=Store._LEASE_TTL_SEC + 10)
    hk2 = store.put_blob(_blob(800))
    assert store.get(hk2) == _blob(800)
    assert not os.path.exists(os.path.join(store.path, "write.lease"))


def test_write_lease_release_is_identity_checked(store):
    """If an op outlives the TTL, another writer may break our lease and hold
    its own; release must NOT unlink that successor's live lease (r4 advice).
    Conversely a successor's fresh lease judged through _stale_lease_ino must
    come back live (None), never breakable by inode mismatch alone."""
    lease_path = os.path.join(store.path, "write.lease")
    ctx = store._write_lease("test-op")
    ctx.__enter__()
    # simulate: TTL elapsed, another live writer broke our lease + took over
    os.unlink(lease_path)
    _hold_lease(store.path, pid=os.getpid())  # live successor, different ts
    ctx.__exit__(None, None, None)
    assert os.path.exists(lease_path), "release removed a successor's live lease"
    assert store._stale_lease_ino(lease_path) is None, "live lease judged stale"
    os.unlink(lease_path)
    # normal path: own lease is released
    with store._write_lease("test-op2"):
        assert os.path.exists(lease_path)
    assert not os.path.exists(lease_path)


def test_lake_waterfall_skips_busy_store(spark, tmp_path):
    """Federation put must treat a busy store like a readonly one: waterfall
    to the next writable store instead of failing the write."""
    cfg = LakeConfig(
        stores=(
            StoreEntry(filename=str(tmp_path / "busy1")),
            StoreEntry(filename=str(tmp_path / "idle2")),
        )
    )
    lake = Lake.open(spark, cfg, prefix_len=1)
    _hold_lease(str(tmp_path / "busy1"))
    hk = lake.put_blob(_blob(900))
    assert lake.get(hk) == _blob(900)
    # landed in the second store
    assert lake.writable[1].has(hk.split(":")[1])


def test_commit_generation_spares_prefix_sharing_siblings(store, spark):
    """Maintenance of 'chunks' must not sweep a sibling dataset whose name
    merely shares the prefix (ADVICE r3: bare startswith matching)."""
    decoy = os.path.join(store.path, "chunks_index")
    os.makedirs(decoy, exist_ok=True)
    with open(os.path.join(decoy, "marker"), "w") as f:
        f.write("keep me")
    store.put_blob(_blob(4096))
    store.compact()
    store.compact()  # second rotation sweeps generation N-2
    assert os.path.exists(os.path.join(decoy, "marker")), "decoy dir was swept"


def test_inline_max_is_a_config_knob(spark, tmp_path):
    """The reference's MAX_SIZE_RAW lives in an unvendored dep, so the inline
    threshold is a per-store manifest knob (r3 verdict, What's missing #4):
    routing, round-trips, and the vacuum sentinel all follow the RECORDED
    value, and open() validates it."""
    from ps_datalake_spark.lake.store import Hkey

    path = str(tmp_path / "tiny-inline")
    st = Store.create(spark, path, prefix_len=1, inline_max=16)
    hk_small = st.put_blob(_blob(16))   # at threshold: inline raw, not stored
    hk_big = st.put_blob(_blob(17))     # over: encrypted single-chunk tier
    assert Hkey.decode(hk_small).kind == "raw"
    assert Hkey.decode(hk_big).kind in ("enc", "plain")
    assert st.get(hk_small) == _blob(16)
    assert st.get(hk_big) == _blob(17)

    # reopened store keeps the recorded threshold
    st2 = Store.open(spark, path)
    assert st2.inline_max == 16

    # vacuum computes the sentinel under the recorded inline_max — the
    # page-0 analog must survive a GC that keeps only hk_big
    removed = st2.vacuum(spark.createDataFrame([(hk_big,)], "hkey string"))
    assert removed >= 0
    assert st2.get(hk_big) == _blob(17)
    assert st2.stats()["n_chunks"] >= 2  # kept chunk + sentinel

    # open() rejects a corrupted threshold
    mf = os.path.join(path, "manifest.json")
    with open(mf) as f:
        manifest = json.load(f)
    manifest["inline_max"] = "huge"
    with open(mf, "w") as f:
        json.dump(manifest, f)
    with pytest.raises(Corrupted):
        Store.open(spark, path)


def test_chunks_at_time_travel(store, spark):
    """chunks_at(-1) must read the generation retained by the last
    maintenance op; before any maintenance it raises NotFound; only
    generations 0/-1 are addressable (retention depth 1)."""
    with pytest.raises(NotFound):
        store.chunks_at(-1)
    hk_a = store.put_blob(_blob(5000))
    hk_b = store.put_blob(_blob(6000))
    n_before = store.chunks().count()
    store.vacuum(spark.createDataFrame([(hk_a,)], "hkey string"))
    assert store.chunks().count() < n_before, "vacuum must drop unreachable chunks"
    snap = store.chunks_at(-1)
    assert snap.count() == n_before, "snapshot must hold the pre-vacuum state"
    assert store.chunks_at(0).count() == store.chunks().count()
    with pytest.raises(ValueError):
        store.chunks_at(-2)
    # a second maintenance op supersedes the snapshot (depth-1 retention)
    store.compact(target_file_bytes=1 << 20)
    assert store.chunks_at(-1).count() == store.chunks().count()


def test_torn_create_is_not_reusable(spark, tmp_path):
    """Crash-ordering discipline (10x-sweep finding): the sentinel/chunks
    data commits BEFORE manifest.json publishes, so (a) a directory with
    chunks but no manifest fails sniff (the half-written state the new
    order can leave), and (b) a manifest with no chunks dataset — the
    state the OLD order could leave and which once produced a
    forever-one-short chunk count — is rejected as Corrupted by open()."""
    import json
    import shutil

    from ps_datalake_spark.errors import Corrupted
    from ps_datalake_spark.lake.store import MAGIC, Store

    # (a) chunks-without-manifest: sniff must reject -> caller recreates
    p1 = str(tmp_path / "s1")
    Store.create(spark, p1, prefix_len=1)
    (tmp_path / "s1" / "manifest.json").unlink()
    assert not Store.sniff(p1)

    # (b) manifest-without-chunks: open must raise Corrupted
    p2 = str(tmp_path / "s2")
    (tmp_path / "s2").mkdir()
    with open(tmp_path / "s2" / "manifest.json", "w") as f:
        json.dump(
            {"magic": MAGIC, "prefix_len": 1, "cipher": "aes-gcm-siv",
             "quota_bytes": None, "inline_max": 256},
            f,
        )
    assert Store.sniff(p2)
    try:
        Store.open(spark, p2)
        raise AssertionError("open() accepted a torn create")
    except Corrupted as e:
        assert "torn create" in str(e)
    shutil.rmtree(p2, ignore_errors=True)


def test_b38_put_dedup_uses_fresh_per_run_store(spark, sf_dir):
    """r13 (r12 verdict #1): the bench-TIMED put path must not reuse a store
    across runs — a warm store lets the timed puts dedup against a previous
    run's appends and skip the encrypt+append work a cold run pays.  Two
    invocations must (a) agree (idempotent counts), and (b) leave no
    q_store_dedup_run_* scratch behind (fresh dir per run, removed in
    finally)."""
    import glob
    import os

    from ps_datalake_spark.queries._util import scratch_dir
    from ps_datalake_spark.queries.lake_ops import b38_put_dedup

    pattern = os.path.join(
        os.path.dirname(scratch_dir("x")), "q_store_dedup_run_*"
    )
    r1 = b38_put_dedup(spark, sf_dir).collect()
    leftover_after_first = glob.glob(pattern)
    r2 = b38_put_dedup(spark, sf_dir).collect()
    assert r1 == r2
    assert leftover_after_first == [], leftover_after_first
    assert glob.glob(pattern) == []
