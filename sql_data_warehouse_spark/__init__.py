"""sql_data_warehouse_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities
of the reference medallion warehouse (LeoLe128/sql-data-warehouse,
pure T-SQL; see SURVEY.md), re-expressed Spark-first:

- ``warehouse/``  — the medallion pipeline (bronze→silver→gold views,
  analysis library Q01–Q13, quality suite) over the reference-shaped
  CRM/ERP sources.
- ``analytics/``  — the operator surface (SURVEY §2) exercised over
  the TPC-H-ish testdata tables, each with a DuckDB oracle.
- ``operators/``  — large-scale training-data pipeline operators:
  dedup (exact / minhash-LSH / simhash / n-gram Jaccard / embedding),
  similarity search, text analysis, multimodal plumbing.
- ``streaming/``  — Structured Streaming over the events table.
- ``functions/``  — semantic helpers (T-SQL datediff/int-division
  parity, text shingling, vector math) built from pyspark.sql
  built-ins only (JVM-side, no Python UDFs in hot paths).
"""

__version__ = "0.1.0"
