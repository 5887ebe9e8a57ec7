from http_log_anonymizer_spark.operators.asof import asof_join
from http_log_anonymizer_spark.operators.bucketing import bucketed_join, write_bucketed

__all__ = ["asof_join", "bucketed_join", "write_bucketed"]
