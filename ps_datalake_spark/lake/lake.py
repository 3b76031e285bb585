"""Lake: ordered federation of stores (reference /root/reference/src/lake/mod.rs).

  get       — waterfall across readable stores in priority order, first hit
              wins, NotFound only if every store misses (A15, lake/mod.rs:54-68)
  put       — waterfall across writable stores, skipping readonly/out-of-space,
              OutOfStores if none accepts (A16, lake/mod.rs:70-112)
  open      — per config entry: readonly → open; else sniff magic, open
              existing or create fresh (A17, lake/mod.rs:27-52)
  chunks()  — batch federation: union of store chunk tables with a priority
              column, first-match-per-hash via a window (the set-scale analog
              of A15's loop)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import LakeConfig
from ..errors import (
    DataLakeError,
    NotFound,
    OutOfStores,
    StoreBusy,
    StoreOutOfSpace,
    StoreReadOnly,
)
from .store import Store


class Lake:
    def __init__(self, spark: SparkSession, readable: list[Store], writable: list[Store]):
        self.spark = spark
        self.readable = readable
        self.writable = writable

    @classmethod
    def open(cls, spark: SparkSession, config: LakeConfig, prefix_len: int = 2) -> "Lake":
        readable: list[Store] = []
        writable: list[Store] = []
        for entry in config.stores:
            if entry.readonly:
                store = Store.open(spark, entry.filename, readonly=True)
            elif Store.sniff(entry.filename):
                store = Store.open(spark, entry.filename, readonly=False)
            else:
                store = Store.create(spark, entry.filename, prefix_len=prefix_len)
            readable.append(store)
            if not store.readonly:
                writable.append(store)
        return cls(spark, readable, writable)

    # -- reads ---------------------------------------------------------------

    def get(self, hkey_str: str) -> bytes:
        """First-hit-wins waterfall; remembers the last non-NotFound error
        (mirrors lake/mod.rs:54-68)."""
        last_err: DataLakeError | None = None
        for store in self.readable:
            try:
                return store.get(hkey_str)
            except NotFound:
                continue
            except DataLakeError as e:
                last_err = e
        raise last_err or NotFound(hkey_str)

    def chunks(self) -> DataFrame:
        """Federated chunk table: first store (by priority) wins per hash."""
        from pyspark.sql.window import Window

        parts = [
            s.chunks().withColumn("store_priority", F.lit(i))
            for i, s in enumerate(self.readable)
        ]
        if not parts:
            raise NotFound("no stores")
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        w = Window.partitionBy("hash").orderBy("store_priority")
        return (
            u.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    # -- writes --------------------------------------------------------------

    def put_blobs(self, df: DataFrame, id_col: str = "id", data_col: str = "data") -> DataFrame:
        """Route to the first writable store that accepts (lake/mod.rs:70-112).
        Busy stores (write lease held by another process) are skipped like
        readonly ones — the waterfall finds an idle store or OutOfStores."""
        last_err: DataLakeError | None = None
        for store in self.writable:
            try:
                return store.put_blobs(df, id_col=id_col, data_col=data_col)
            except (StoreReadOnly, StoreOutOfSpace, StoreBusy) as e:
                last_err = e
                continue
        raise OutOfStores(str(last_err) if last_err else "no writable stores")

    def put_blob(self, data: bytes) -> str:
        last_err: DataLakeError | None = None
        for store in self.writable:
            try:
                return store.put_blob(data)
            except (StoreReadOnly, StoreOutOfSpace, StoreBusy) as e:
                last_err = e
                continue
        raise OutOfStores(str(last_err) if last_err else "no writable stores")

    # -- catalog surface (SURVEY.md §3.4: lake.sql / lake.table) -------------

    def attach(self, name: str, df: DataFrame) -> None:
        """Register a DataFrame as a queryable lake table (temp view)."""
        df.createOrReplaceTempView(name)

    def attach_dir(self, sf_dir: str, tables: tuple[str, ...] | None = None) -> None:
        """Register parquet tables from a directory (the driver's testdata shape)."""
        from ..io import TABLES, register_views

        register_views(self.spark, sf_dir, tables or TABLES)

    def attach_internal(self) -> None:
        """Expose the lake's own metadata as tables: `lake_chunks` (federated,
        first-match per hash) and `lake_manifests`."""
        self.attach("lake_chunks", self.chunks().drop("data"))
        parts = [s.manifests() for s in self.readable]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        self.attach("lake_manifests", u.dropDuplicates(["root_hash", "seq"]))

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def sql(self, text: str) -> DataFrame:
        """SQL entry point: full Catalyst lifecycle over attached tables."""
        return self.spark.sql(text)
