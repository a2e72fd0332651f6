"""etl_finance_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
ETL (mohdazfar/etl-finance, /root/reference/etl.py) as idiomatic Spark
DataFrame/SQL plans, plus the relational/streaming/LLM-pipeline surface
mandated by SURVEY.md §2. Everything is declarative DataFrame code so
Catalyst/Tungsten/AQE provide optimization; no RDDs, no driver-side row
loops.
"""

__version__ = "0.1.0"
