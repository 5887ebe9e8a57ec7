from http_log_anonymizer_spark.functions.anonymize import (
    IPV4_REGEX,
    anonymize_ip,
    anonymize_ip_fast,
    anonymize_ip_py,
)

__all__ = [
    "anonymize_ip",
    "anonymize_ip_fast",
    "anonymize_ip_py",
    "IPV4_REGEX",
    "register_udfs",
]


def register_udfs(spark) -> None:
    """Expose the engine's scalar functions to SQL users
    (``spark.sql("SELECT anonymize_ip(addr) ...")``) — the SQL face of
    the reference's Anonymize trait (lib.rs:239-242)."""
    from pyspark.sql.types import StringType

    spark.udf.register("anonymize_ip", anonymize_ip_py, StringType())
