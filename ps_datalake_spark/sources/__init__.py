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


__all__ = ["PsLakeDataSource", "register_pslake"]
