"""PySpark-native analytics engine with the capabilities of
qmanhbeo/uk-procurement-data-pipeline, re-expressed Spark-first.

Layout:
  session    — SparkSession factory (AQE, UTC, Arrow)
  catalog    — fixture-table loaders (TESTDATA.md parquet)
  functions/ — scalar/array/date helpers mirroring reference semantics
  operators/ — relational / dedup / similarity / text / as-of operators
  sources/   — ingestion adapters (zip-of-XML, CSV, HTTP-stub, parquet IO)
  plans/     — end-to-end dataflows (OCDS flatten, FaT flatten, merge, scrape)
  streaming/ — Structured Streaming windows / dedup / incremental ingest
  queries/   — the driver-facing query registry (queries() + oracle_sql())
"""

__version__ = "0.1.0"
