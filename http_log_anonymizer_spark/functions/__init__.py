from http_log_anonymizer_spark.functions.anonymize import (
    IPV4_REGEX,
    anonymize_ip,
    anonymize_ip_fast,
    anonymize_ip_py,
)

__all__ = ["anonymize_ip", "anonymize_ip_fast", "anonymize_ip_py", "IPV4_REGEX"]
