"""Enrichment operator: broadcast hash-join lookups + name derivations.

The north-star pipeline mandates two broadcast lookups on the parsed
stream — role→facility map and tool→app-name registry (FIXTURES.md §4)
— plus the facility/severity name columns from the reference's tables
(/root/reference/priority.go:81-158).

Scale notes: both dims are O(10) rows → ``F.broadcast`` forces a
broadcast hash join (no shuffle of the fact side); the name lookups use
constant-folded literal arrays (cheaper still — zero join).  The whole
enrich stage therefore adds no exchanges to the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_parsesyslog_spark.functions.priority import (
    facility_name,
    severity_class,
    severity_name,
)

# role → facility override + operational class (FIXTURES.md §4, 4 rows)
ROLE_FACILITY_MAP = [
    ("system", 0, "infra"),        # KERN
    ("user", 1, "interactive"),    # USER
    ("assistant", 16, "model"),    # LOCAL0
    ("tool", 3, "tooling"),        # DAEMON
]

# tool → app registry (FIXTURES.md §4, 8 rows)
TOOL_APP_REGISTRY = [
    ("bash", "gnu-bash", "shell"),
    ("search", "websearch", "io"),
    ("browser", "headless-chromium", "io"),
    ("editor", "texted", "shell"),
    ("none", "n/a", "none"),
    ("python", "cpython", "shell"),
    ("fetch", "httpfetch", "io"),
    ("db", "sqlclient", "io"),
]


def role_facility_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        ROLE_FACILITY_MAP, "role string, role_facility int, role_class string"
    )


def tool_app_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        TOOL_APP_REGISTRY, "tool string, app_name string, app_tier string"
    )


def enrich(df: DataFrame, spark: SparkSession | None = None) -> DataFrame:
    """Attach name columns + broadcast-join the two lookup dims.

    Input: output of ``parse_logs`` (must carry role/tool/severity/
    facility columns).  Output adds: facility_name, severity_name,
    severity_class, role_facility, role_class, app_name, app_tier.
    """
    spark = spark or df.sparkSession
    out = df.withColumns(
        {
            "facility_name": facility_name(F.col("facility")),
            "severity_name": severity_name(F.col("severity")),
            "severity_class": severity_class(F.col("severity")),
        }
    )
    if "role" in df.columns:
        out = out.join(F.broadcast(role_facility_dim(spark)), "role", "left")
    if "tool" in df.columns:
        out = out.join(F.broadcast(tool_app_dim(spark)), "tool", "left")
    return out
