"""Store: one content-addressed chunk store = a directory of partitioned
Parquet datasets + a JSON manifest.

reference ↔ Spark mapping (SURVEY.md §1.4):
  mmap'd file w/ header+index+pages      → chunks/ Parquet dataset partitioned
                                           by hash_prefix (+ manifest.json as
                                           the header: magic, version, layout)
  open-addressing hash index (A6/A7)     → partition pruning on hash_prefix +
                                           Parquet min/max stats on hash
  bump allocator / pages (A10)           → Parquet append mode
  8 load-time corruption checks (A4)     → manifest magic/version/layout checks
                                           + dataset schema assertion
  sentinel page 0 (store/mod.rs:231-235) → sentinel chunk written at create

Size routing (A11–A14, store/mod.rs:399-436):
  ≤ MAX_SIZE_RAW        → inline raw hkey, nothing stored
  ≤ MAX_DECRYPTED_SIZE  → convergent-encrypt, store under sha256(ciphertext)
  else                  → split into TREE_CHUNK_SIZE chunks → child puts +
                          manifests rows keyed by sha256(plaintext)

Scale notes: every put is one anti-join (dedup, A10's probe-then-write) + one
partitioned append; no driver-side loops over rows. hash_prefix gives 16^n
balanced partitions (content hashes are uniform); point reads prune to one
partition and one row group via min/max stats on `hash`.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..errors import Corrupted, NotFound, StoreBusy, StoreOutOfSpace, StoreReadOnly
from . import crypto
from .hkey import Hkey

MAGIC = "datalake/v1"
SENTINEL = b"<< DATA SEGMENT BEGINS HERE >>"

# Default inline threshold. The reference's MAX_SIZE_RAW constant lives in
# its unvendored ps-hkey dependency (/root/reference/src/store/mod.rs:400,429;
# BASELINE.md), so the true value is unknowable from public source — hence a
# per-store CONFIG KNOB (`inline_max` in manifest.json, set at create) rather
# than a hard constant: a deployment matching a known reference value just
# sets it, and every routing decision plus the sentinel layout follows the
# recorded manifest value, not this default.
MAX_SIZE_RAW = 128
MAX_DECRYPTED_SIZE = 1 << 20  # single-chunk ceiling (reference: MAX_DECRYPTED_SIZE)
TREE_CHUNK_SIZE = 256 << 10  # chunk-tree split size
_AEAD_OVERHEAD = 16  # allowed ciphertext growth before the A12 plain fallback

CHUNKS_SCHEMA = StructType(
    [
        StructField("hash", StringType(), False),
        StructField("size", LongType(), False),
        StructField("enc", StringType(), False),  # 'plain' | cipher name
        StructField("data", BinaryType(), False),
        StructField("hash_prefix", StringType(), False),
    ]
)

MANIFESTS_SCHEMA = StructType(
    [
        StructField("root_hash", StringType(), False),
        StructField("seq", IntegerType(), False),
        StructField("child_hash", StringType(), False),
        StructField("child_key", StringType(), True),
        StructField("child_enc", StringType(), False),
        StructField("length", LongType(), False),
    ]
)

_ENC_RESULT_SCHEMA = (
    "id long, hash string, size long, enc string, data binary, key string, kind string"
)


def _encrypt_batches_for(cname: str):
    """mapInPandas worker factory: convergent-encrypt payloads under the
    STORE's manifest-recorded cipher (not the ambient environment's pick),
    with the A12 guard (store plaintext if the ciphertext expands beyond the
    AEAD allowance).  Writing with the environment default would break
    convergent dedup the moment the environment's cipher changes: the same
    plaintext would produce a different ciphertext and hence a different
    chunk hash."""

    def _encrypt_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {"id": [], "hash": [], "size": [], "enc": [], "data": [], "key": [], "kind": []}
            for blob_id, payload in zip(pdf["id"], pdf["data"]):
                plain = bytes(payload)
                key = crypto.convergent_key(plain)
                cipher = crypto.encrypt_as(cname, plain, key)
                if len(cipher) > len(plain) + _AEAD_OVERHEAD:
                    stored, enc, key_hex, kind = plain, "plain", None, "plain"
                else:
                    stored, enc, key_hex, kind = cipher, cname, key.hex(), "enc"
                out["id"].append(blob_id)
                out["hash"].append(hashlib.sha256(stored).hexdigest())
                out["size"].append(len(plain))
                out["enc"].append(enc)
                out["data"].append(stored)
                out["key"].append(key_hex)
                out["kind"].append(kind)
            yield pd.DataFrame(out)

    return _encrypt_batches


def _split_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: split oversized blobs into tree chunks."""
    import hashlib

    for pdf in batches:
        out = {"id": [], "root_hash": [], "root_size": [], "seq": [], "data": []}
        for blob_id, payload in zip(pdf["id"], pdf["data"]):
            plain = bytes(payload)
            root = hashlib.sha256(plain).hexdigest()
            for seq, off in enumerate(range(0, len(plain), TREE_CHUNK_SIZE)):
                out["id"].append(blob_id)
                out["root_hash"].append(root)
                out["root_size"].append(len(plain))
                out["seq"].append(seq)
                out["data"].append(plain[off : off + TREE_CHUNK_SIZE])
        yield pd.DataFrame(out)


def acquire_write_lease(path: str, op: str):
    """Module-level write-lease protocol (see Store._write_lease for the
    reference mapping).  Context manager; raises StoreBusy when contended.
    Shared by Store mutations AND the pslake sink's driver-side commit, which
    runs in a plain Python worker with no SparkSession."""
    import contextlib
    import time as _time

    lease_path = os.path.join(path, "write.lease")

    @contextlib.contextmanager
    def _ctx():
        fd = None
        for attempt in (0, 1):
            try:
                fd = os.open(lease_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                stale_ino = Store._stale_lease_ino(lease_path)
                if stale_ino is None and not os.path.exists(lease_path):
                    continue  # holder released in between — retry create
                if attempt == 1 or stale_ino is None:
                    raise StoreBusy(
                        f"{path}: write lease held "
                        f"({Store._lease_holder(lease_path)}) for op {op!r}"
                    ) from None
                # Stale (dead pid / expired): break it BY IDENTITY, not
                # path — between the staleness judgment and the unlink a
                # competing writer may have broken the same stale lease
                # and created its own fresh one; unlinking blindly would
                # remove the successor's LIVE lease and let two writers
                # proceed (r4 advice, medium). The successor's file is a
                # different inode, so re-stat and only unlink the exact
                # file that was judged stale; on any mismatch treat the
                # store as contended (second loop iteration → StoreBusy).
                with contextlib.suppress(OSError):
                    if os.stat(lease_path).st_ino == stale_ino:
                        os.unlink(lease_path)
        if fd is None:
            # both attempts fell through via `continue` (holder released
            # and a new contender re-created the lease each time): the
            # store is contended — fail fast like any other lost race
            # (a bare loop exit here used to crash with UnboundLocalError)
            raise StoreBusy(f"{path}: write lease contended for op {op!r}")
        mine = {"pid": os.getpid(), "ts": _time.time(), "op": op}
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(mine, f)
            yield
        finally:
            Store._release_lease(lease_path, mine)

    return _ctx()


class Store:
    def __init__(self, spark: SparkSession, path: str, readonly: bool, manifest: dict):
        from ..session import configure

        configure(spark)  # UTC/nanos confs + ship package zip to Python workers
        self.spark = spark
        self.path = path
        self.readonly = readonly
        self.manifest = manifest
        self.prefix_len = int(manifest.get("prefix_len", 2))
        self.quota_bytes = manifest.get("quota_bytes")
        # per-store inline threshold (see MAX_SIZE_RAW comment): older
        # manifests without the field keep the historical default
        self.inline_max = int(manifest.get("inline_max", MAX_SIZE_RAW))

    # -- lifecycle (A1 / A4 / A5) -------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        prefix_len: int = 2,
        quota_bytes: int | None = None,
        inline_max: int = MAX_SIZE_RAW,
    ) -> "Store":
        if not 0 <= inline_max <= MAX_DECRYPTED_SIZE:
            raise ValueError(f"inline_max out of range: {inline_max}")
        # mirror Store.open's check: creating with an out-of-range prefix_len
        # would mint a store every subsequent open rejects as Corrupted
        if not isinstance(prefix_len, int) or not 1 <= prefix_len <= 8:
            raise ValueError(f"invalid prefix_len: {prefix_len!r}")
        os.makedirs(path, exist_ok=True)
        manifest = {
            "magic": MAGIC,
            "prefix_len": prefix_len,
            "cipher": crypto.cipher_name(),
            "quota_bytes": quota_bytes,
            "inline_max": inline_max,
        }
        # sentinel chunk ↔ reference's reserved page 0 (store/mod.rs:231-235);
        # written directly (driver-side encrypt) — no distributed pipeline for
        # one 158-byte row.  WRITE ORDER IS THE CRASH DISCIPLINE: the sentinel
        # data lands BEFORE manifest.json is published, mirroring the
        # reference's publish-index-slot-last rule (store/mod.rs:348-362) — a
        # create() interrupted between the two steps leaves a directory that
        # sniff() rejects (no magic), so the next caller recreates it instead
        # of reusing a sentinel-less store (caught by the 10x robustness
        # sweep: a crashed create left a sniffable store whose chunk count
        # was forever one short).
        import hashlib
        import uuid

        plain = SENTINEL + b"\0" * inline_max
        key = crypto.convergent_key(plain)
        cipher = crypto.encrypt_as(manifest["cipher"], plain, key)
        h = hashlib.sha256(cipher).hexdigest()
        # Direct pyarrow write of the one-row sentinel (r13, guide §5): a
        # distributed write job for 158 bytes is pure job-launch overhead —
        # one full Spark job per Store.create, paid per run by every
        # fresh-store query path.  The file lands in the same
        # chunks/hash_prefix=<p>/ directory layout partitionBy produced;
        # every reader supplies CHUNKS_SCHEMA explicitly, so nothing depends
        # on writer-specific metadata.
        import pyarrow as pa
        import pyarrow.parquet as pq

        part_dir = os.path.join(path, "chunks", f"hash_prefix={h[:prefix_len]}")
        os.makedirs(part_dir, exist_ok=True)
        table = pa.table(
            {
                "hash": [h],
                "size": [len(plain)],
                "enc": [manifest["cipher"]],
                "data": [cipher],
            },
            schema=pa.schema(
                [
                    ("hash", pa.string()),
                    ("size", pa.int64()),
                    ("enc", pa.string()),
                    ("data", pa.binary()),
                ]
            ),
        )
        pq.write_table(
            table, os.path.join(part_dir, f"part-00000-{uuid.uuid4().hex}.parquet")
        )
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        return cls(spark, path, readonly=False, manifest=manifest)

    @staticmethod
    def sniff(path: str) -> bool:
        """Magic sniff (A5, lake/util.rs:7-24): is this directory a store?"""
        mf = os.path.join(path, "manifest.json")
        if not os.path.exists(mf):
            return False
        try:
            with open(mf) as f:
                return json.load(f).get("magic") == MAGIC
        except (OSError, json.JSONDecodeError):
            return False

    @classmethod
    def open(cls, spark: SparkSession, path: str, readonly: bool = False) -> "Store":
        """Open + the corruption-check battery (A4, store/mod.rs:98-170 analog)."""
        mf_path = os.path.join(path, "manifest.json")
        if not os.path.isdir(path):
            raise Corrupted(f"store path missing: {path}")
        if not os.path.exists(mf_path):
            raise Corrupted("missing manifest.json")
        try:
            with open(mf_path) as f:
                manifest = json.load(f)
        except json.JSONDecodeError as e:
            raise Corrupted(f"manifest unparseable: {e}") from e
        if manifest.get("magic") != MAGIC:
            raise Corrupted(f"magic mismatch: {manifest.get('magic')!r}")
        prefix_len = manifest.get("prefix_len")
        if not isinstance(prefix_len, int) or not (1 <= prefix_len <= 8):
            raise Corrupted(f"invalid prefix_len: {prefix_len!r}")
        inline_max = manifest.get("inline_max", MAX_SIZE_RAW)
        if not isinstance(inline_max, int) or not (0 <= inline_max <= MAX_DECRYPTED_SIZE):
            raise Corrupted(f"invalid inline_max: {inline_max!r}")
        cipher = manifest.get("cipher")
        if cipher not in crypto.KNOWN_CIPHERS:
            raise Corrupted(f"unknown store cipher: {cipher!r}")
        if not crypto.cipher_available(cipher):
            # fail fast: the store's chunks are (overwhelmingly) this cipher,
            # so every get would raise — surface the environment problem at
            # open time instead of per-read
            raise Corrupted(
                f"store cipher {cipher!r} unavailable in this environment "
                "(install 'cryptography' for aes-gcm-siv)"
            )
        store = cls(spark, path, readonly=readonly, manifest=manifest)
        # schema check must read the ACTUAL file footers (chunks() imposes the
        # expected schema on read, which would make this check vacuous)
        chunks_path = store._active_path("chunks")
        if os.path.isdir(chunks_path):
            try:
                got = {f.name: f.dataType for f in spark.read.parquet(chunks_path).schema.fields}
            except Exception as e:
                raise Corrupted(f"chunks dataset unreadable: {e}") from e
            want = {f.name: f.dataType for f in CHUNKS_SCHEMA.fields}
            for name, dtype in want.items():
                # the partition column surfaces as string either way
                if name == "hash_prefix":
                    continue
                if got.get(name) != dtype:
                    raise Corrupted(f"chunks schema mismatch on {name!r}: {got.get(name)}")
        else:
            # a valid store ALWAYS has a committed chunks dataset (the
            # sentinel is written before the manifest publishes) — a
            # manifest with no chunks data is a torn create from a writer
            # that predates the manifest-last discipline, or lost data
            raise Corrupted("manifest present but chunks dataset missing (torn create)")
        return store

    # -- exclusive write lease (A20, src/store/atomic.rs:8-57) ---------------

    _LEASE_TTL_SEC = 3600.0  # a crashed writer's lease is breakable after this

    def _write_lease(self, op: str):
        """Exclusive write lease over the store directory.

        The reference serializes mutation behind an exclusive write guard
        (DataStoreWriteGuard, src/store/atomic.rs:8-57); without the analog,
        a put appending to the OLD chunks generation while a compact/vacuum
        writes the new one is silently dropped at the pointer swap. The lease
        is an O_CREAT|O_EXCL file (atomic on POSIX) holding pid/time/op; a
        second writer fails fast with StoreBusy (the federation router treats
        that like readonly and waterfalls to the next store). Leases of dead
        processes or older than _LEASE_TTL_SEC are broken — the poisoned-lock
        recovery analog (src/error.rs:71-75).

        The protocol itself lives in the module-level
        :func:`acquire_write_lease` so non-Store writers (the ``pslake``
        DataSource sink's driver-side commit, which has no SparkSession and
        therefore no Store handle) take the SAME lease file with the SAME
        staleness rules.
        """
        return acquire_write_lease(self.path, op)

    @staticmethod
    def _release_lease(lease_path: str, mine: dict) -> None:
        """Release only OUR lease. If this op outlived _LEASE_TTL_SEC another
        writer may have legitimately broken our lease and written its own —
        unlinking unconditionally would free the store under that live writer
        (r4 advice, medium). Re-read and compare pid+ts (both round-trip
        exactly through JSON); on mismatch or unreadable content leave the
        file alone — the TTL reaper will collect it if it is truly dead."""
        import contextlib

        try:
            with open(lease_path) as f:
                held = json.load(f)
        except (OSError, json.JSONDecodeError):
            return
        if held.get("pid") == mine["pid"] and held.get("ts") == mine["ts"]:
            with contextlib.suppress(OSError):
                os.unlink(lease_path)

    @staticmethod
    def _lease_holder(lease_path: str) -> str:
        try:
            with open(lease_path) as f:
                return json.dumps(json.load(f))
        except (OSError, json.JSONDecodeError):
            return "unreadable lease"

    @classmethod
    def _stale_lease_ino(cls, lease_path: str) -> int | None:
        """Judge staleness and return the judged file's inode (None = live).

        The inode is captured BEFORE the content read: if the file is
        replaced in between, the content judged belongs to the newer file and
        the stat at break time will mismatch either way, so the caller falls
        back to StoreBusy rather than breaking the wrong lease."""
        import time as _time

        try:
            ino = os.stat(lease_path).st_ino
        except OSError:
            return None  # vanished — let the caller's O_EXCL retry race for it
        try:
            with open(lease_path) as f:
                lease = json.load(f)
        except (OSError, json.JSONDecodeError):
            # unreadable/half-written: only age can prove staleness
            try:
                age = _time.time() - os.path.getmtime(lease_path)
            except OSError:
                return None  # vanished meanwhile
            return ino if age > cls._LEASE_TTL_SEC else None
        if _time.time() - float(lease.get("ts", 0)) > cls._LEASE_TTL_SEC:
            return ino
        pid = lease.get("pid")
        if not isinstance(pid, int):
            return ino
        try:
            os.kill(pid, 0)  # signal 0: existence probe only
            return None
        except ProcessLookupError:
            return ino
        except PermissionError:
            return None  # exists, owned by another user

    # -- dataset accessors ---------------------------------------------------

    def _active_path(self, sub: str) -> str:
        """Resolve the ACTIVE generation directory for a dataset.

        Maintenance ops (compact/vacuum) never replace a dataset directory in
        place — they write a new generation and atomically swap the pointer in
        manifest.json (single os.replace), so a concurrent reader always sees
        a complete dataset (r2 verdict #5: rmtree+replace had a
        missing-dataset window).  Re-reading manifest.json here lets
        long-lived Store handles follow pointer swaps."""
        try:
            with open(os.path.join(self.path, "manifest.json")) as f:
                gen = json.load(f).get(f"{sub}_dir")
        except Exception:
            gen = self.manifest.get(f"{sub}_dir")
        return os.path.join(self.path, gen or sub)

    def _commit_generation(self, sub: str, new_dir: str) -> None:
        """Atomically publish ``new_dir`` as the active generation of ``sub``.

        The pointer swap is one os.replace of manifest.json (atomic on POSIX).
        The just-superseded generation is RETAINED so readers that resolved
        the old pointer keep working; generations older than that (and
        crashed half-written ones) are removed — retention depth 1, the
        minimum that makes maintenance non-disruptive for in-flight queries.
        """
        import shutil as _sh

        # Re-read the ON-DISK manifest first: the write lease serializes
        # maintenance ops but does not refresh THIS handle's memory — a
        # long-lived handle whose last read predates another process's
        # compact would otherwise derive `old` from a stale pointer (sweeping
        # the generation concurrent readers hold) and clobber every other
        # pointer that process committed (e.g. manifests_dir) when it dumps
        # its stale dict back to disk.
        mf_path = os.path.join(self.path, "manifest.json")
        try:
            with open(mf_path) as f:
                self.manifest = json.load(f)
        except (OSError, json.JSONDecodeError):
            pass  # keep the in-memory view (fresh store mid-create)
        old = self.manifest.get(f"{sub}_dir") or sub
        self.manifest[f"{sub}_dir"] = new_dir
        # time-travel pointer: the retained generation stays addressable
        # (Store.chunks_at(-1)) until the NEXT maintenance op supersedes it —
        # retention depth 1, matching the sweep below
        self.manifest[f"{sub}_prev_dir"] = old
        tmp = mf_path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=2)
        os.replace(tmp, mf_path)
        import re as _re

        keep = {new_dir, old}
        # precise generation-dir match: a sibling dataset whose name merely
        # shares the prefix (e.g. 'chunks_index' during 'chunks' maintenance)
        # must never be swept (ADVICE r3)
        gen_pat = _re.compile(rf"^{_re.escape(sub)}(_g[0-9a-f]{{8}})?$")
        for d in os.listdir(self.path):
            if gen_pat.match(d) and d not in keep:
                full = os.path.join(self.path, d)
                if os.path.isdir(full):
                    _sh.rmtree(full, ignore_errors=True)

    def _read_or_empty(self, sub: str, schema: StructType) -> DataFrame:
        p = self._active_path(sub)
        try:
            return self.spark.read.schema(schema).parquet(p)
        except Exception:
            return self.spark.createDataFrame([], schema)

    def chunks(self) -> DataFrame:
        return self._read_or_empty("chunks", CHUNKS_SCHEMA)

    def chunks_at(self, generation: int = 0) -> DataFrame:
        """Time-travel read of the chunks dataset.

        ``generation=0`` is the active generation (same as ``chunks()``);
        ``generation=-1`` is the snapshot superseded by the most recent
        maintenance op (compact/vacuum), which ``_commit_generation`` retains
        on disk with a ``chunks_prev_dir`` manifest pointer — the reader-side
        half of the copy-on-write generation swap, the same contract as a
        table format's snapshot read. Retention depth is 1: the next
        maintenance op supersedes (and sweeps) this snapshot.
        """
        if generation == 0:
            return self.chunks()
        if generation != -1:
            raise ValueError(f"only generations 0 and -1 are retained, got {generation}")
        try:
            with open(os.path.join(self.path, "manifest.json")) as f:
                prev = json.load(f).get("chunks_prev_dir")
        except Exception:
            prev = self.manifest.get("chunks_prev_dir")
        if not prev:
            raise NotFound(
                "no previous chunks generation (no maintenance op has run)"
            )
        return self.spark.read.schema(CHUNKS_SCHEMA).parquet(
            os.path.join(self.path, prev)
        )

    def manifests(self) -> DataFrame:
        return self._read_or_empty("manifests", MANIFESTS_SCHEMA)

    def stored_bytes(self) -> int:
        row = self.chunks().agg(F.coalesce(F.sum("size"), F.lit(0)).alias("s")).head()
        return int(row["s"])

    # -- write path (A10–A14) ------------------------------------------------

    def put_blobs(self, df: DataFrame, id_col: str = "id", data_col: str = "data") -> DataFrame:
        """Distributed size-routed put. Returns (id, hkey) DataFrame.

        Pipeline: route by size → encrypt (Arrow batches) / split+encrypt →
        anti-join against existing hashes (the A7 probe) → partitioned append
        (the A10 publish) → hkey assembly. Content addressing makes the whole
        thing idempotent.
        """
        if self.readonly:
            raise StoreReadOnly(self.path)
        src = df.select(
            F.col(id_col).cast("long").alias("id"), F.col(data_col).alias("data")
        ).withColumn("_sz", F.length("data").cast("long"))
        with self._write_lease("put_blobs"):
            src.persist()
            try:
                return self._put_blobs_inner(src, data_col)
            finally:
                src.unpersist()

    def _put_blobs_inner(self, src: DataFrame, data_col: str = "data") -> DataFrame:
        # one cheap pass over sizes decides which tiers exist → absent tiers
        # cost zero jobs (important: most workloads are single-tier); the
        # NULL-payload guard rides the same aggregate — a separate head(1)
        # probe job per put was pure serial-job overhead (r12 optimization:
        # one fewer driver action per put on every put path)
        tier_counts = src.agg(
            F.sum(F.col("data").isNull().cast("long")).alias("n_null"),
            F.max(F.when(F.col("data").isNull(), F.col("id"))).alias("null_id"),
            F.sum((F.col("_sz") <= self.inline_max).cast("long")).alias("n_raw"),
            F.sum(
                ((F.col("_sz") > self.inline_max) & (F.col("_sz") <= MAX_DECRYPTED_SIZE)).cast(
                    "long"
                )
            ).alias("n_mid"),
            F.sum((F.col("_sz") > MAX_DECRYPTED_SIZE).cast("long")).alias("n_big"),
            F.coalesce(F.sum("_sz"), F.lit(0)).alias("total"),
            F.coalesce(
                F.sum(F.when(F.col("_sz") <= self.inline_max, F.col("_sz")).otherwise(0)),
                F.lit(0),
            ).alias("raw_bytes"),
        ).head()
        # NULL payloads match no size tier and would silently vanish from the
        # returned (id, hkey) mapping — fail loudly instead (get_blobs makes
        # the opposite guarantee: every input id appears in its output)
        if int(tier_counts["n_null"] or 0):
            raise ValueError(
                f"put_blobs: NULL {data_col!r} for id {tier_counts['null_id']} — "
                "blobs must be non-null bytes (use b'' for empty)"
            )
        n_raw, n_mid, n_big = (
            int(tier_counts["n_raw"] or 0),
            int(tier_counts["n_mid"] or 0),
            int(tier_counts["n_big"] or 0),
        )

        if self.quota_bytes is not None:
            # conservative admission: counts storable tiers (mid+big) at full
            # size — content already present dedups to 0 bytes at write time,
            # so this can refuse early rather than admit over quota. The raw
            # tier is inline-only and never counted.
            storable = int(tier_counts["total"]) - int(tier_counts["raw_bytes"] or 0)
            if self.stored_bytes() + storable > self.quota_bytes:
                raise StoreOutOfSpace(f"{self.path}: quota {self.quota_bytes}")

        hkey_parts: list[DataFrame] = []

        # raw tier: inline base64url hkey, nothing stored (A11/A14 fast path)
        if n_raw:
            hkey_parts.append(
                src.where(F.col("_sz") <= self.inline_max).select(
                    "id",
                    # translate() also strips the \r\n that Spark 3.3-3.5's
                    # RFC-2045 MIME-chunked base64() inserts every 76 chars
                    # (payloads > 57 bytes) — keeps raw hkeys byte-identical
                    # to Hkey.encode's Python base64 on any Spark version
                    F.concat(
                        F.lit("raw:"),
                        F.translate(F.base64("data"), "+/\r\n", "-_"),
                    ).alias("hkey"),
                )
            )

        # single-chunk tier: convergent encrypt + store
        mid_enc = None
        if n_mid:
            mid = src.where(
                (F.col("_sz") > self.inline_max) & (F.col("_sz") <= MAX_DECRYPTED_SIZE)
            )
            # NOT widened before the Python pass: a conditional repartition
            # (the b64/_spread treatment) was A/B-measured here and REJECTED
            # — interleaved at sf0.1 the spread drew 3.01 s vs 2.70 s without
            # (every round), because the per-blob crypto is cheap relative to
            # the blob-bytes exchange + 32-task scheduling it buys.  At real
            # scale the scan has many splits and the question is moot.
            mid_enc = (
                mid.select("id", "data")
                .mapInPandas(_encrypt_batches_for(self.manifest["cipher"]), _ENC_RESULT_SCHEMA)
                .persist()
            )

        # tree tier: split into chunks, encrypt each child
        children = None
        if n_big:
            big = src.where(F.col("_sz") > MAX_DECRYPTED_SIZE)
            pieces = big.select("id", "data").mapInPandas(
                _split_batches, "id long, root_hash string, root_size long, seq int, data binary"
            )
            # checkpoint: the synthetic join key (monotonically_increasing_id)
            # must never be recomputed — a divergent recomputation could pair
            # one chunk's metadata with another's ciphertext. Checkpointing
            # also keeps the expensive re-chunking from running once per
            # downstream branch.
            pieces_enc = (
                pieces.withColumnRenamed("id", "blob_id")
                .withColumn("id", F.monotonically_increasing_id())
                .select("blob_id", "root_hash", "root_size", "seq", "id", "data")
                .localCheckpoint(eager=True)
            )
            child_enc = pieces_enc.select("id", "data").mapInPandas(
                _encrypt_batches_for(self.manifest["cipher"]), _ENC_RESULT_SCHEMA
            )
            children = pieces_enc.drop("data").join(child_enc, "id").drop("id").persist()

        # everything that lands in chunks/
        store_parts = []
        if mid_enc is not None:
            store_parts.append(mid_enc.select("hash", "size", "enc", "data"))
        if children is not None:
            store_parts.append(children.select("hash", "size", "enc", "data"))
        if store_parts:
            to_store = store_parts[0]
            for p in store_parts[1:]:
                to_store = to_store.unionByName(p)
            self._append_chunks(to_store)

        # manifests for the tree tier (A13)
        if children is not None:
            self._append_manifests(
                children.select(
                    "root_hash",
                    F.col("seq").cast("int").alias("seq"),
                    F.col("hash").alias("child_hash"),
                    F.col("key").alias("child_key"),
                    F.col("enc").alias("child_enc"),
                    F.col("size").alias("length"),
                )
            )

        if mid_enc is not None:
            hkey_parts.append(
                mid_enc.select(
                    "id",
                    F.when(
                        F.col("kind") == "enc",
                        F.concat_ws(
                            ":",
                            F.lit("enc"),
                            F.col("hash"),
                            F.col("key"),
                            F.col("size").cast("string"),
                        ),
                    )
                    .otherwise(
                        F.concat_ws(
                            ":", F.lit("plain"), F.col("hash"), F.col("size").cast("string")
                        )
                    )
                    .alias("hkey"),
                )
            )
        if children is not None:
            hkey_parts.append(
                children.groupBy("blob_id", "root_hash", "root_size")
                .agg(F.count("*"))
                .select(
                    F.col("blob_id").alias("id"),
                    F.concat_ws(
                        ":", F.lit("tree"), F.col("root_hash"), F.col("root_size").cast("string")
                    ).alias("hkey"),
                )
            )

        if not hkey_parts:
            result = self.spark.createDataFrame([], "id long, hkey string")
        else:
            result = hkey_parts[0]
            for p in hkey_parts[1:]:
                result = result.unionByName(p)
            # cut lineage: callers' actions must not re-run encryption/writes
            result = result.localCheckpoint(eager=True)
        if mid_enc is not None:
            mid_enc.unpersist()
        if children is not None:
            children.unpersist()
        return result

    def _append_chunks(self, rows: DataFrame) -> None:
        """Dedup anti-join (A7 probe / A10 short-circuit) then partitioned append."""
        staged = (
            rows.dropDuplicates(["hash"])
            .join(self.chunks().select("hash"), "hash", "left_anti")
            .withColumn("hash_prefix", F.substring("hash", 1, self.prefix_len))
        )
        # repartition on the partition column: exactly one file per prefix per
        # append (at scale: avoids the tasks×partitions small-file explosion)
        staged = staged.repartition("hash_prefix")
        from ..plandump import dump_plan

        dump_plan(staged, "put_blobs_append_chunks")  # the put's write job
        staged.write.mode("append").partitionBy(
            "hash_prefix"
        ).parquet(self._active_path("chunks"))

    def _append_manifests(self, rows: DataFrame) -> None:
        # in-batch dedup first: two identical large blobs in one put batch
        # produce the same (root_hash, seq) rows twice — without this, tree
        # reads would double-concatenate and fail the length check
        staged = rows.dropDuplicates(["root_hash", "seq"]).join(
            self.manifests().select("root_hash").distinct(), "root_hash", "left_anti"
        )
        staged.write.mode("append").parquet(self._active_path("manifests"))

    def put_blob(self, data: bytes) -> str:
        """Single-blob convenience over the distributed path (A14)."""
        out = self.put_blobs(
            self.spark.createDataFrame([(0, bytearray(data))], "id long, data binary")
        )
        return out.head()["hkey"]

    # -- read path (A7/A8/A15 analog) ---------------------------------------

    def _chunk_row(self, hash_hex: str):
        rows = (
            self.chunks()
            .where(
                (F.col("hash_prefix") == hash_hex[: self.prefix_len])
                & (F.col("hash") == hash_hex)
            )
            .head(1)
        )
        if not rows:
            raise NotFound(hash_hex)
        return rows[0]

    def get(self, hkey_str: str) -> bytes:
        """Reconstruct a blob from its hkey (point lookup, partition-pruned)."""
        hk = Hkey.decode(hkey_str)
        if hk.kind == "raw":
            return hk.inline or b""
        if hk.kind == "plain":
            return bytes(self._chunk_row(hk.hash)["data"])
        if hk.kind == "enc":
            row = self._chunk_row(hk.hash)
            return crypto.decrypt_as(row["enc"], bytes(row["data"]), bytes.fromhex(hk.key))
        # tree: manifest rows → children → decrypt → ordered concat (A13 read)
        kids = (
            self.manifests()
            .where(F.col("root_hash") == hk.hash)
            .orderBy("seq")
            .collect()
        )
        if not kids:
            raise NotFound(hk.hash)
        parts = []
        hashes = [k["child_hash"] for k in kids]
        rows = {
            r["hash"]: r
            for r in self.chunks()
            .where(F.col("hash_prefix").isin({h[: self.prefix_len] for h in hashes})
                   & F.col("hash").isin(hashes))
            .collect()
        }
        for k in kids:
            r = rows.get(k["child_hash"])
            if r is None:
                raise NotFound(k["child_hash"])
            data = bytes(r["data"])
            if k["child_enc"] != "plain":
                data = crypto.decrypt_as(k["child_enc"], data, bytes.fromhex(k["child_key"]))
            parts.append(data)
        blob = b"".join(parts)
        if len(blob) != hk.size:
            raise Corrupted(f"tree length mismatch for {hk.hash}: {len(blob)} != {hk.size}")
        return blob

    def has(self, hash_hex: str) -> bool:
        try:
            self._chunk_row(hash_hex)
            return True
        except NotFound:
            return False

    def get_blobs(self, hkeys: DataFrame, id_col: str = "id", hkey_col: str = "hkey") -> DataFrame:
        """Distributed batch get: (id, hkey) → (id, data).

        raw hkeys decode inline (JVM-side unbase64); plain/enc join the chunk
        table on hash (partition-pruned by the join's hash keys at scale) and
        decrypt in Arrow batches; tree hkeys join manifests → children →
        ordered binary concat. Missing hashes surface as NULL data (batch
        semantics — the point-read path raises NotFound instead).
        """
        src = hkeys.select(F.col(id_col).alias("id"), F.col(hkey_col).alias("hkey"))
        parts = F.split(F.col("hkey"), ":")
        parsed = src.select(
            "id", parts.getItem(0).alias("kind"), parts.alias("p"), "hkey"
        )

        out_parts: list[DataFrame] = []
        raw = parsed.where(F.col("kind") == "raw").select(
            "id", F.unbase64(F.translate(F.col("p").getItem(1), "-_", "+/")).alias("data")
        )
        out_parts.append(raw)

        chunk_data = self.chunks().select(
            F.col("hash"), F.col("enc"), F.col("data").alias("stored")
        )

        def _decrypt_batch(batches):
            for pdf in batches:
                datas = []
                for stored, enc, key in zip(pdf["stored"], pdf["enc"], pdf["key"]):
                    if stored is None:
                        datas.append(None)
                    elif enc == "plain" or key is None:
                        datas.append(bytes(stored))
                    else:
                        datas.append(crypto.decrypt_as(enc, bytes(stored), bytes.fromhex(key)))
                yield pd.DataFrame({"id": pdf["id"], "data": datas})

        single = (
            parsed.where(F.col("kind").isin("plain", "enc"))
            .select(
                "id",
                F.col("p").getItem(1).alias("hash"),
                F.when(F.col("kind") == "enc", F.col("p").getItem(2)).alias("key"),
            )
            .join(chunk_data, "hash", "left")
            .select("id", "stored", "enc", "key")
        )
        out_parts.append(single.mapInPandas(_decrypt_batch, "id long, data binary"))

        trees = parsed.where(F.col("kind") == "tree").select(
            "id", F.col("p").getItem(1).alias("root_hash")
        )
        kids = (
            trees.join(self.manifests(), "root_hash")  # missing roots → NULL via final left join
            .join(
                chunk_data.withColumnRenamed("hash", "child_hash"),
                "child_hash",
                "left",
            )
            .select(
                "id",
                "seq",
                "stored",
                F.col("child_enc").alias("enc"),
                F.col("child_key").alias("key"),
            )
        )
        kid_plain = kids.mapInPandas(
            lambda batches: (
                pdf.assign(
                    data=[
                        None
                        if stored is None
                        else (
                            bytes(stored)
                            if enc == "plain" or key is None
                            else crypto.decrypt_as(enc, bytes(stored), bytes.fromhex(key))
                        )
                        for stored, enc, key in zip(pdf["stored"], pdf["enc"], pdf["key"])
                    ]
                )[["id", "seq", "data"]]
                for pdf in batches
            ),
            "id long, seq int, data binary",
        )
        def _assemble(pdf: pd.DataFrame) -> pd.DataFrame:
            # linear reassembly: sort by seq and b''.join once.  The previous
            # F.aggregate(concat) fold rebuilt the accumulator per child —
            # O(n²) bytes copied per blob, terabytes of memory traffic for a
            # GB-scale tree; join is one pass, matching the point-read path.
            pdf = pdf.sort_values("seq")
            if pdf["data"].isna().any():
                data = None  # a missing child poisons the blob (batch contract)
            else:
                data = b"".join(bytes(x) for x in pdf["data"])
            return pd.DataFrame({"id": [int(pdf["id"].iloc[0])], "data": [data]})

        assembled = kid_plain.groupBy("id").applyInPandas(
            _assemble, "id long, data binary"
        )
        out_parts.append(assembled)

        result = out_parts[0]
        for p in out_parts[1:]:
            result = result.unionByName(p)
        # contract: EVERY input id appears exactly once; tree hkeys with no
        # manifest rows (and unknown kinds) must surface as NULL data, not
        # disappear from the output
        return src.select("id").join(result, "id", "left")

    # -- maintenance (the file ops a 100 TB lake needs) ----------------------

    def compact(self, target_file_bytes: int = 128 << 20) -> int:
        """Rewrite the chunk dataset with size-targeted files per partition.

        Appends accumulate one file per partition per batch; compaction
        rewrites each hash_prefix partition into ceil(bytes/target) files and
        publishes the rewrite with an atomic manifest pointer swap
        (_commit_generation) — a concurrent reader never observes a missing
        or half-written dataset. Single-writer op, ENFORCED by the exclusive
        write lease (_write_lease): a put racing this rewrite would append to
        the superseded generation and be dropped at the swap."""
        import glob
        import uuid

        if self.readonly:
            raise StoreReadOnly(self.path)
        with self._write_lease("compact"):
            chunks_path = self._active_path("chunks")
            if not os.path.isdir(chunks_path):
                return 0
            df = self.chunks()
            total = df.agg(F.coalesce(F.sum("size"), F.lit(0))).head()[0] or 0
            n_files = max(1, int(total // target_file_bytes) + 1)
            new_dir = f"chunks_g{uuid.uuid4().hex[:8]}"
            (
                df.repartition(n_files, "hash_prefix")
                .write.mode("overwrite")
                .partitionBy("hash_prefix")
                .parquet(os.path.join(self.path, new_dir))
            )
            self._commit_generation("chunks", new_dir)
            return len(glob.glob(os.path.join(self.path, new_dir, "*", "*.parquet")))

    def vacuum(self, roots: DataFrame, hkey_col: str = "hkey") -> int:
        """Mark-and-sweep GC: keep only chunks reachable from the given root
        hkeys (plain/enc hashes + every tree child via manifests + sentinel).

        Content-addressed stores can't know liveness locally — the caller
        supplies the root set (e.g. a catalog of live hkeys). Returns the
        number of chunks removed. At scale this is one semi-join + rewrite,
        same shape as compact(). Single-writer op, enforced by the exclusive
        write lease (_write_lease).
        """
        if self.readonly:
            raise StoreReadOnly(self.path)
        with self._write_lease("vacuum"):
            return self._vacuum_inner(roots, hkey_col)

    def _vacuum_inner(self, roots: DataFrame, hkey_col: str) -> int:
        if not os.path.isdir(self._active_path("chunks")):
            return 0
        parts = F.split(F.col(hkey_col), ":")
        parsed = roots.select(
            parts.getItem(0).alias("kind"), parts.getItem(1).alias("href")
        )
        direct = parsed.where(F.col("kind").isin("plain", "enc")).select(
            F.col("href").alias("hash")
        )
        tree_roots = parsed.where(F.col("kind") == "tree").select(
            F.col("href").alias("root_hash")
        )
        tree_kids = tree_roots.join(self.manifests(), "root_hash").select(
            F.col("child_hash").alias("hash")
        )
        import hashlib as _hl

        sentinel_plain = SENTINEL + b"\0" * self.inline_max
        # the sentinel was written at create time under the cipher recorded in
        # the manifest; recomputing with the current environment's cipher
        # would mis-hash it and garbage-collect the reference page-0 analog
        sentinel_hash = _hl.sha256(
            crypto.encrypt_as(
                self.manifest["cipher"], sentinel_plain, crypto.convergent_key(sentinel_plain)
            )
        ).hexdigest()
        sentinel = self.spark.createDataFrame([(sentinel_hash,)], "hash string")
        live = direct.unionByName(tree_kids).unionByName(sentinel).distinct()

        import uuid

        before = self.chunks().count()
        kept = self.chunks().join(live, "hash", "left_semi")
        new_chunks = f"chunks_g{uuid.uuid4().hex[:8]}"
        kept.repartition("hash_prefix").write.mode("overwrite").partitionBy(
            "hash_prefix"
        ).parquet(os.path.join(self.path, new_chunks))
        self._commit_generation("chunks", new_chunks)
        # manifests for unreachable tree roots are swept too — same atomic
        # generation swap
        live_roots = tree_roots.distinct()
        if os.path.isdir(self._active_path("manifests")):
            kept_manifests = self.manifests().join(live_roots, "root_hash", "left_semi")
            new_manifests = f"manifests_g{uuid.uuid4().hex[:8]}"
            kept_manifests.write.mode("overwrite").parquet(
                os.path.join(self.path, new_manifests)
            )
            self._commit_generation("manifests", new_manifests)
        return before - self.chunks().count()

    def stats(self) -> dict:
        """Store-level statistics (manifest-header analog of the reference's
        free_chunk/index accounting)."""
        row = (
            self.chunks()
            .agg(
                F.count("*").alias("n_chunks"),
                F.coalesce(F.sum("size"), F.lit(0)).alias("plain_bytes"),
                F.coalesce(F.sum(F.length("data")), F.lit(0)).alias("stored_bytes"),
                F.countDistinct("hash_prefix").alias("n_partitions"),
            )
            .head()
        )
        n_roots = self.manifests().select("root_hash").distinct().count()
        return {
            "n_chunks": int(row["n_chunks"]),
            "plain_bytes": int(row["plain_bytes"]),
            "stored_bytes": int(row["stored_bytes"]),
            "n_partitions": int(row["n_partitions"]),
            "n_tree_roots": int(n_roots),
            "prefix_len": self.prefix_len,
            "cipher": self.manifest.get("cipher"),
        }
