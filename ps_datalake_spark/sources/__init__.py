"""Custom Spark data sources (Python Data Source API, new in Spark 4)."""

from .pslake_source import PsLakeDataSource

__all__ = ["PsLakeDataSource"]
