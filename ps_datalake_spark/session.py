"""SparkSession construction + runtime conf hardening.

The driver may hand us an already-built SparkSession, so every conf we depend
on for correctness must either be runtime-settable (applied in ``configure``)
or degraded around gracefully.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe (and desired) to set at session-build time.
BUILD_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # driver testdata events.parquet stores TIMESTAMP(NANOS) which Spark
    # cannot read natively; read as long and convert in io.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    # local[32] with 128 GiB: modest shuffle parallelism; AQE coalesces down.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.driver.memory": "8g",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
}

# Single-node (local[N]) only: shuffle/broadcast bytes never cross a network,
# so compression is pure CPU overhead, and the web UI + console progress cost
# a few ms per stage — measurable across a 13-query comparable set (~12%).
# A REAL cluster wants compression ON (network >> CPU there); these are
# therefore applied only when the master is local, never baked into
# RUNTIME_CONFS for externally provided sessions.
LOCAL_ONLY_CONFS = {
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    "spark.shuffle.compress": "false",
    "spark.shuffle.spill.compress": "false",
    "spark.broadcast.compress": "false",
    "spark.rdd.compress": "false",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
}

# Subset that is runtime-settable: applied defensively to externally provided
# sessions (the driver's) before we read anything.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # the pslake reader implements pushFilters (A7 point lookup as partition
    # pruning); Spark 4.1 REFUSES to plan a pushFilters-bearing reader while
    # this is off, so it must be on in any session that reads the source
    "spark.sql.python.filterPushdown.enabled": "true",
}


_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ps_datalake_spark importable inside Python workers.

    UDF/mapInPandas closures reference this package by module name; workers
    spawned by an externally built session (driver cwd ≠ repo root) cannot
    import it otherwise. addPyFile distributes a zip of the package and puts
    it on every worker's sys.path.
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    import hashlib
    import os
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # collect sources deterministically and key the zip by their content hash:
    # a name-keyed cache would keep shipping a stale zip after source edits,
    # silently diverging worker code from driver code in every UDF path
    sources = []
    for root, _dirs, files in os.walk(pkg_dir):
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                sources.append((rel, full))
    sources.sort()
    h = hashlib.sha256()
    for rel, full in sources:
        h.update(rel.encode())
        with open(full, "rb") as f:
            h.update(f.read())
    digest = h.hexdigest()[:16]
    zip_path = os.path.join(tempfile.gettempdir(), f"ps_datalake_spark_{digest}.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path + f".tmp{os.getpid()}", "w") as z:
            for rel, full in sources:
                z.write(full, rel)
        os.replace(zip_path + f".tmp{os.getpid()}", zip_path)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(app_id)


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — loader falls back
    try:
        _ship_package(spark)
    except Exception:
        pass  # already added or restricted context — worker imports may still work
    return spark


def get_spark(app_name: str = "ps-datalake-spark", master: str | None = None) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    b = SparkSession.builder.appName(app_name).master(master)
    for k, v in BUILD_CONFS.items():
        b = b.config(k, v)
    if master.startswith("local"):
        for k, v in LOCAL_ONLY_CONFS.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return configure(spark)
