"""Routing operator: fan-out sink assignment with salted skew defusal.

Route key (FIXTURES.md §5): ``(severity_class, conv_bucket)`` where
``conv_bucket = pmod(xxhash64(conv_id), n_buckets)``; rows with a
non-null ``err_code`` go to the dead-letter sink instead.

Skew: hot conversations (detected by a cheap pre-aggregation) receive a
per-row salt so the shuffle before the fan-out write splits a hot
(severity_class, conv_bucket) cell across ``salt_buckets`` tasks instead
of one straggler.  AQE's skew handling only covers joins/sorts — a
custom fan-out write needs explicit salting (SURVEY.md §4.3).

At 100 TB: the pre-agg is a partial-aggregated count per conv_id (small
result ≪ input), the hot set is broadcast back, and the only full
shuffle is the one repartition before the write — sized by
``spark.sql.shuffle.partitions`` and split further by the salt on hot
cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DLQ = "dlq"


def with_route_columns(
    df: DataFrame,
    n_buckets: int = 16,
    salt_buckets: int = 8,
    hot_threshold: int | None = None,
    hot_source: DataFrame | None = None,
    hot_ids: list | None = None,
) -> DataFrame:
    """Add sink_id / conv_bucket / salt columns.

    ``hot_threshold``: row count per conv_id above which a conversation
    is salted.  None → auto: 4× the mean rows/conv (computed with one
    partial agg over the input).

    ``hot_source``: DataFrame to compute the hot-conversation counts on.
    Pass the RAW input here — hot detection only needs ``conv_id``, and
    counting on the parsed stream would re-run the (expensive) parse UDF
    once per downstream action instead of a cheap column-pruned scan.
    """
    out = df.withColumn(
        "conv_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    )
    out = out.withColumn(
        "sink_id",
        F.when(F.col("err_code").isNotNull(), F.lit(DLQ)).otherwise(
            F.concat_ws("-", "severity_class", "conv_bucket")
        ),
    )

    if hot_ids is not None:
        if len(hot_ids) == 0:
            return out.withColumn("salt", F.lit(0).cast("int"))
        is_hot = F.col("conv_id").isin(list(hot_ids))
    else:
        counts_src = hot_source if hot_source is not None else df
        conv_counts = counts_src.groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("_rows")
        )
        if hot_threshold is None:
            stats = conv_counts.agg(
                F.avg("_rows").alias("mean"), F.count(F.lit(1)).alias("n")
            ).collect()[0]
            hot_threshold = max(64, int(4 * (stats["mean"] or 1)))
        hot = conv_counts.filter(F.col("_rows") > hot_threshold).select(
            "conv_id", F.lit(True).alias("_hot")
        )
        out = out.join(F.broadcast(hot), "conv_id", "left")
        is_hot = F.col("_hot").isNotNull()
    out = out.withColumn(
        "salt",
        F.when(
            is_hot,
            F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(salt_buckets)),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    if "_hot" in out.columns:
        out = out.drop("_hot")
    return out


def hot_conv_ids(
    df: DataFrame, hot_threshold: int | None = None, cap: int = 100_000
) -> tuple[list, int]:
    """ONE column-pruned pre-aggregation over the raw input returning the
    hot conversation ids (rows > threshold) as a plain list — folded into
    the route expression as a literal isin, which is cheaper than any
    join.  ``cap`` bounds driver memory; beyond it the caller should use
    the broadcast-join path instead."""
    conv_counts = df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("_rows"))
    if hot_threshold is None:
        mean = conv_counts.agg(F.avg("_rows")).collect()[0][0]
        hot_threshold = max(64, int(4 * (mean or 1)))
    hot = conv_counts.filter(F.col("_rows") > hot_threshold)
    return [r["conv_id"] for r in hot.limit(cap).collect()], hot_threshold


def write_routed(
    df: DataFrame,
    out_root: str,
    shuffle_partitions: int | None = None,
) -> None:
    """Fan-out partitioned write: valid rows under ``routed/`` partitioned
    by (severity_class, conv_bucket); err rows under ``dlq/`` partitioned
    by err_code.  The repartition key includes the salt so hot cells are
    written by multiple tasks (multiple files per dir — fine for
    columnar readers, fatal to avoid stragglers)."""
    spark = df.sparkSession
    n = shuffle_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    valid = df.filter(F.col("err_code").isNull())
    (
        valid.repartition(n, "severity_class", "conv_bucket", "salt")
        .write.mode("overwrite")
        .partitionBy("severity_class", "conv_bucket")
        .parquet(f"{out_root}/routed")
    )
    dlq = df.filter(F.col("err_code").isNotNull())
    (
        dlq.repartition("err_code")
        .write.mode("overwrite")
        .partitionBy("err_code")
        .parquet(f"{out_root}/dlq")
    )
