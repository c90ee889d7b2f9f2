"""Aggregation operator: per-sink counts windowed by event time.

FIXTURES.md §5: ``sink_id, severity_class, window<start,end>,
turn_count`` — per-sink counts over 1-hour tumbling windows of ``ts``,
plus distinct-conversation estimates.  Catalyst executes this as
partial (map-side) + final hash aggregation; the only shuffle is on the
group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sink_metrics(df: DataFrame, window: str = "1 hour") -> DataFrame:
    """Windowed per-sink aggregate table (includes the DLQ sinks when
    present in the input)."""
    return (
        df.groupBy(
            "sink_id", "sink_sev", "sink_key", "severity_class",
            F.window("ts", window).alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.approx_count_distinct("conv_id").alias("approx_convs"),
            F.sum("msg_length").alias("total_msg_bytes"),
        )
        .select(
            "sink_id",
            "sink_sev",
            "sink_key",
            "severity_class",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "turn_count",
            "approx_convs",
            "total_msg_bytes",
        )
    )


def merge_sink_metrics(partials: DataFrame) -> DataFrame:
    """Re-aggregate per-chunk partial metrics into final totals.

    approx_convs is a per-chunk estimate; merged via max (lower bound)
    — exact distincts live in the final verification query, not here.
    """
    return (
        partials.groupBy("sink_id", "severity_class", "window_start", "window_end")
        .agg(
            F.sum("turn_count").alias("turn_count"),
            F.max("approx_convs").alias("approx_convs"),
            F.sum("total_msg_bytes").alias("total_msg_bytes"),
        )
    )
