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


# Hot sets up to this size fold into the route expression as an isin
# literal (cheapest — no join at all); larger sets take a broadcast hash
# join so plan size / codegen stay bounded and nothing is truncated.
HOT_LITERAL_CAP = 1024


def with_route_columns(
    df: DataFrame,
    n_buckets: int = 16,
    salt_buckets: int = 8,
    hot_threshold: int | None = None,
    hot_source: DataFrame | None = None,
    hot_ids: list | None = None,
    hot_df: DataFrame | None = None,
) -> DataFrame:
    """Add sink_id / conv_bucket / salt columns.

    ``hot_threshold``: row count per conv_id above which a conversation
    is salted.  None → auto: 4× the mean rows/conv (computed with one
    partial agg over the input).

    ``hot_source``: DataFrame to compute the hot-conversation counts on.
    Pass the RAW input here — hot detection only needs ``conv_id``, and
    counting on the parsed stream would re-run the (expensive) parse UDF
    once per downstream action instead of a cheap column-pruned scan.

    ``hot_ids``: precomputed small hot set, folded in as an isin literal.
    ``hot_df``: precomputed hot set as a DataFrame with a ``conv_id``
    column — broadcast-hash-joined; use for hot sets above
    ``HOT_LITERAL_CAP`` (an isin literal that size bloats plan/codegen,
    and collecting it risks driver memory at true scale).
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

    if hot_ids is not None and hot_df is None:
        if len(hot_ids) == 0:
            return out.withColumn("salt", F.lit(0).cast("int"))
        is_hot = F.col("conv_id").isin(list(hot_ids))
    else:
        if hot_df is not None:
            hot = hot_df.select("conv_id", F.lit(True).alias("_hot"))
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


def compute_hot_set(
    df: DataFrame,
    hot_threshold: int | None = None,
    spill_path: str | None = None,
    literal_cap: int = HOT_LITERAL_CAP,
) -> dict:
    """ONE column-pruned pre-aggregation over the raw input detecting the
    hot conversations (rows > threshold).

    Returns ``{"threshold", "count", "ids", "path", "max_conv_rows",
    "total_rows"}``: hot sets up to ``literal_cap`` come back as a plain
    ``ids`` list (fold into the route expression as an isin literal —
    cheapest, no join); larger sets are written to ``spill_path``
    parquet and come back as ``path`` for the broadcast-join route —
    nothing is ever silently truncated, and driver memory stays bounded
    at 10^12-turn scale.  ``max_conv_rows``/``total_rows`` let the
    writer size its salt spread to the data instead of a constant
    (guide §2: scale-adaptive partitioning)."""
    conv_counts = (
        df.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("_rows"))
        # one input scan feeds both the stats agg and the hot filter:
        # without this the two driver actions below each re-scan the
        # full input to rebuild the (conv_id, _rows) aggregate
        .localCheckpoint()
    )
    stats = conv_counts.agg(
        F.avg("_rows").alias("mean"),
        F.count(F.lit(1)).alias("n"),
        F.max("_rows").alias("mx"),
    ).collect()[0]
    if hot_threshold is None:
        hot_threshold = max(64, int(4 * (stats["mean"] or 1)))
    max_rows = int(stats["mx"] or 0)
    total_rows = int(round((stats["mean"] or 0) * (stats["n"] or 0)))
    hot = conv_counts.filter(F.col("_rows") > hot_threshold).select("conv_id")
    head = [r["conv_id"] for r in hot.limit(literal_cap + 1).collect()]
    if len(head) <= literal_cap:
        return {"threshold": hot_threshold, "count": len(head),
                "ids": head, "path": None,
                "max_conv_rows": max_rows, "total_rows": total_rows}
    if spill_path is None:
        raise ValueError(
            f"hot set exceeds literal cap ({literal_cap}); pass spill_path "
            "for the broadcast-join route"
        )
    hot.coalesce(1).write.mode("overwrite").parquet(spill_path)
    n = df.sparkSession.read.parquet(spill_path).count()
    return {"threshold": hot_threshold, "count": n, "ids": None,
            "path": spill_path,
            "max_conv_rows": max_rows, "total_rows": total_rows}


def hot_conv_ids(
    df: DataFrame, hot_threshold: int | None = None, cap: int = 100_000
) -> tuple[list, int]:
    """Deprecated small-scale helper (kept for API compat): collect the
    hot set as a list.  Prefer ``compute_hot_set`` — it spills oversized
    hot sets for the broadcast-join route instead of truncating."""
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
