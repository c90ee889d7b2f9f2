"""Thin re-export — corpora live in the package (also used by datagen)."""
from go_parsesyslog_spark.corpus import (  # noqa: F401
    RFC3164_CASES,
    RFC3164_ERROR_CASES,
    RFC3164_NEWLINE_TAG,
    RFC5424_INVALID,
    RFC5424_VALID,
    rfc3164_golden,
)
