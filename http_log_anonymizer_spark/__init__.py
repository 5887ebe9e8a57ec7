"""PySpark-native analytics engine with the data-processing capabilities
of matyama/http-log-anonymizer (reference: /root/reference, v0.4.1).

The reference is a Rust Kafka->ClickHouse ETL pipeline (see SURVEY.md).
This package re-expresses its semantics Spark-first:

- ``functions``  scalar/column functions (anonymize_ip, text, vectors)
- ``operators``  DataFrame-level operators (aggregates, dedup, similarity)
- ``sources``    batch parquet loaders, Kafka/capnp streaming sources
- ``sinks``      ClickHouse foreachBatch writer, parquet sink
- ``streaming``  pipeline factory, rate limiter, query listener
- ``plans``      the query registry (spark impl + DuckDB oracle SQL)
"""

from http_log_anonymizer_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
