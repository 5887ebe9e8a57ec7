"""Query registry: every operator in SURVEY.md §2 (plus the engine-grade
extensions) is registered here as a (Spark DataFrame impl, DuckDB oracle
SQL) pair. ``__spark_entry__.py``, ``bench.py`` and the test suite all
read this registry, so an operator is "done" exactly when it appears here
with a passing oracle.
"""

from http_log_anonymizer_spark.plans.registry import REGISTRY, Query, register

# Import for registration side effects.
from http_log_anonymizer_spark.plans import http_log  # noqa: E402,F401
from http_log_anonymizer_spark.plans import analytics  # noqa: E402,F401
from http_log_anonymizer_spark.plans import text  # noqa: E402,F401
from http_log_anonymizer_spark.plans import dedup  # noqa: E402,F401
from http_log_anonymizer_spark.plans import similarity  # noqa: E402,F401
from http_log_anonymizer_spark.plans import multimodal  # noqa: E402,F401
from http_log_anonymizer_spark.plans import scalars  # noqa: E402,F401
from http_log_anonymizer_spark.plans import sampling  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "register"]
