"""crdb_changefeed_publisher_spark — a PySpark-native engine with the
capabilities of the reference CDC pipeline (ducc/crdb-changefeed-publisher)
plus a batch/streaming analytics surface designed for 100 TB scale.

Layout:
    session     - SparkSession factory (AQE, Arrow, shuffle sizing)
    tables      - fixture/table loading + temp-view registration
    operators   - changefeed envelope core, dedup, similarity, text analysis
    functions   - reusable column expression builders (vectors, json, hashing)
    plans       - named analytics queries + DuckDB oracle SQL (driver contract)
    sources     - custom Python DataSource (crdb_changefeed) + fixture replay
    streaming   - Structured Streaming pipeline, queues, cursors, metrics
"""

__version__ = "0.1.0"
