"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL pipeline (Mastodon-hashtag medallion
warehouse: extract -> transform -> bronze -> silver star schema w/ SCD2
-> gold analytical views), re-expressed Spark-first.

Layout:
  session    - SparkSession factory (UTC, AQE, nanos-parquet handling)
  catalog    - explicit schemas + loaders for the harness tables
  functions/ - column-expression library (cleaning, dates, json, text)
  operators/ - composed DataFrame algorithms (dedup, SCD2, upsert, mode,
               similarity, multimodal plumbing)
  plans/     - query builders: the SURVEY §2 operator inventory and the
               seven gold analytical queries, each paired with an ANSI-SQL
               oracle for DuckDB cross-checking
  sources/   - IO helpers (read/write, sinks)
  streaming/ - Structured Streaming counterparts over the events table
"""

__version__ = "0.1.0"
