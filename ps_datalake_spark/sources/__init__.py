"""Custom Spark data sources (Python Data Source API, new in Spark 4)."""

from pyspark.sql import SparkSession

from .pslake_source import PsLakeDataSource


def register_pslake(spark: SparkSession) -> None:
    """Register the ``pslake`` format AFTER shipping the package zip.

    ``spark.dataSource.register`` snapshots the session's python includes
    for the planning workers it spawns — a zip added afterwards is invisible
    to them, and unpickling the DataSource class fails with
    ModuleNotFoundError when the driver's cwd is not the repo root.  Always
    registering through this helper makes the order a non-issue.
    """
    from ..session import configure

    configure(spark)  # ships ps_datalake_spark.zip via addPyFile
    spark.dataSource.register(PsLakeDataSource)


def register_store_sql(spark: SparkSession, name: str, store_path: str,
                       **options: str):
    """Make a pslake store reachable from PURE SQL as catalog view ``name``.

    After this call, ``spark.sql(f"SELECT ... FROM {name}")`` and
    ``spark.table(name)`` work.  Filter PUSHDOWN is disabled for the view
    by default (pass ``pushdown="true"`` to opt in): Spark 4.1 caches the
    post-pushdown read info per relation on the JVM side, so a long-lived
    relation scanned once with a pushed ``WHERE hash = ...`` would serve
    that filtered partition list to every later scan — measured on this
    container as full-count 11 → lookup 1 → full-count 1 on one loaded
    DataFrame (fresh ``load()`` relations are isolated and keep full
    pruning; tests/test_pslake_source.py pins both behaviors).  A
    declined filter is still applied by Spark above the scan, so a view
    without pushdown stays CORRECT for every query — point lookups just
    scan all buckets.  For pruned lookups, register a dedicated
    single-use view with ``pushdown="true"`` or use the format API
    directly.

    Why a view and not ``CREATE TABLE ... USING pslake``: Spark 4.1's
    Python Data Source catalog integration accepts the CREATE (the reader
    defers its path check for exactly this probe) but forwards NEITHER the
    table's OPTIONS clause NOR its LOCATION to the scan — measured on this
    container: a probe reader registered under a catalog table sees
    ``options == {}`` at partitions() time for both spellings, and
    ``SELECT * FROM pslake.`/path``` is rejected as
    UNSUPPORTED_DATASOURCE_FOR_DIRECT_QUERY.  Until upstream forwards
    catalog-table options to Python sources, a named view over the
    format-API DataFrame is the complete SQL surface available.
    """
    register_pslake(spark)
    opts = {"pushdown": "false", **options}
    reader = spark.read.format("pslake").option("path", store_path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    df = reader.load()
    df.createOrReplaceTempView(name)
    return df


__all__ = ["PsLakeDataSource", "register_pslake", "register_store_sql"]
