"""ps_datalake_spark — a PySpark-native analytics + content-addressed lake engine.

Re-expresses the capability surface of the reference (prokopschield/ps-datalake,
an encrypted content-addressed chunk store — see SURVEY.md) as idiomatic
PySpark, and layers the full declared analytics surface (SURVEY.md §2B) on top.

Layout:
  session.py    SparkSession builder (Arrow on, AQE on, UTC)
  io.py         loaders for the driver test tables (handles ns timestamps)
  registry.py   QuerySpec registry: one Spark builder + one DuckDB oracle per op
  queries/      the declared operator inventory (B1..B38 + LLM pipeline ops)
  lake/         content-addressed store core (the reference's actual capability)
  streaming/    Structured Streaming jobs (B30-B33)
"""

__version__ = "0.1.0"
