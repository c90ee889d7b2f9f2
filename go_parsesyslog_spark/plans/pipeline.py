"""End-to-end parse → enrich → route → aggregate pipeline.

The Spark re-expression of the reference's whole purpose (SURVEY.md §2
Table B): one declarative DAG per work unit —

    scan(unit files)                       # columnar, pruned
      → parse_logs        (narrow, Arrow-batched, shuffle-free)
      → enrich            (broadcast joins only — no exchange)
      → with_route_columns(salted bucket assignment)
      → ONE fan-out partitioned write      (the only full shuffle)
      → partial metrics from the written unit (column-pruned readback)

Work units are groups of input files: the unit is the resume/commit
granule (plans/lineage.py).  Per unit the input is scanned exactly
once; valid rows and dead-letter rows land in the same partitioned
write under ``sink_sev=…/sink_key=…`` (dlq rows use
``sink_sev=dlq, sink_key=<err_code>``), so no second pass and no
second shuffle.

Scale design notes (100 TB / 1000 executors):
* unit size bounds the blast radius of a failure — a killed run loses
  at most one uncommitted unit, and the marker rename is atomic;
* the fan-out shuffle is keyed (severity_class, conv_bucket, salt) —
  hot conversations are split across ``salt_buckets`` writer tasks;
* metrics are partial-per-unit then merged (no full re-scan at the end);
* everything before the write is narrow, so AQE only has to size the
  single exchange.
"""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_parsesyslog_spark.operators.aggregate import merge_sink_metrics, sink_metrics
from go_parsesyslog_spark.operators.enrich import enrich
from go_parsesyslog_spark.operators.parse import parse_logs
from go_parsesyslog_spark.operators.route import with_route_columns
from go_parsesyslog_spark.plans import lineage
from go_parsesyslog_spark.sources.transcripts import REF_NOW


def plan_units(input_path: str, n_units: int) -> list[tuple[str, list[str]]]:
    """Round-robin the input parquet files into resume units."""
    files = sorted(
        os.path.join(input_path, f)
        for f in os.listdir(input_path)
        if f.endswith(".parquet")
    )
    n_units = max(1, min(n_units, len(files)))
    units = []
    for u in range(n_units):
        members = files[u::n_units]
        if members:
            units.append((f"{u:04d}", members))
    return units


def _process_unit(
    spark: SparkSession,
    files: list[str],
    unit_out: str,
    fmt: str,
    ref_now,
    n_buckets: int,
    salt_buckets: int,
    hot_threshold: int | None,
) -> None:
    df = spark.read.parquet(*files)
    parsed = parse_logs(df, text_col="text", fmt=fmt, ref_now=ref_now)
    enriched = enrich(parsed, spark)
    routed = with_route_columns(
        enriched,
        n_buckets=n_buckets,
        salt_buckets=salt_buckets,
        hot_threshold=hot_threshold,
        hot_source=df,  # raw input: column-pruned conv_id scan, no parse
    )
    # dlq rows: sink_sev='dlq', sink_key=err_code; valid rows: class/bucket
    final = routed.withColumns(
        {
            "sink_sev": F.when(
                F.col("err_code").isNotNull(), F.lit("dlq")
            ).otherwise(F.col("severity_class")),
            "sink_key": F.when(
                F.col("err_code").isNotNull(), F.col("err_code")
            ).otherwise(F.col("conv_bucket").cast("string")),
        }
    )
    # Keep the raw wire text only for DLQ rows (replay/debug); nulling it
    # for parsed rows halves the sink write volume — the parsed columns
    # carry everything (per-turn text equality is on `message`).
    final = final.withColumn(
        "text", F.when(F.col("err_code").isNotNull(), F.col("text"))
    )
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    (
        final.repartition(n_shuffle, "sink_sev", "sink_key", "salt")
        .write.mode("overwrite")
        .partitionBy("sink_sev", "sink_key")
        .parquet(os.path.join(unit_out))
    )


def _unit_metrics(
    spark: SparkSession, unit_out: str, metrics_out: str
) -> tuple[int, int]:
    """Compute partial metrics from the unit's written data (column-
    pruned scan of the fresh parquet).  Returns (valid_rows, dlq_rows)."""
    written = spark.read.parquet(unit_out)
    valid = written.filter(F.col("sink_sev") != "dlq")
    metrics = sink_metrics(valid)
    metrics.write.mode("overwrite").parquet(metrics_out)
    counts = (
        written.groupBy((F.col("sink_sev") == "dlq").alias("is_dlq"))
        .count()
        .collect()
    )
    valid_rows = sum(r["count"] for r in counts if not r["is_dlq"])
    dlq_rows = sum(r["count"] for r in counts if r["is_dlq"])
    return valid_rows, dlq_rows


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    out_root: str,
    fmt: str = "auto",
    ref_now: pd.Timestamp | None = None,
    n_buckets: int = 16,
    salt_buckets: int = 8,
    hot_threshold: int | None = None,
    n_units: int = 4,
    resume: bool = True,
    max_units: int | None = None,
) -> dict:
    """Run (or resume) the full pipeline.  Returns a summary dict.

    ``max_units`` limits how many *pending* units are processed this
    call — used by tests to simulate a killed run.
    """
    ref_now = ref_now if ref_now is not None else REF_NOW
    t0 = time.time()
    units = plan_units(input_path, n_units)
    done = lineage.completed_units(out_root) if resume else {}
    if not resume:
        import shutil

        if os.path.isdir(out_root):
            shutil.rmtree(out_root)

    ran, skipped = [], []
    for unit_id, files in units:
        if unit_id in done:
            skipped.append(unit_id)
            continue
        if max_units is not None and len(ran) >= max_units:
            break
        lineage.clean_partial_unit(out_root, unit_id)
        unit_out = os.path.join(out_root, "sinks", f"unit={unit_id}")
        metrics_out = os.path.join(out_root, "metrics_partial", f"unit={unit_id}")
        tu = time.time()
        _process_unit(
            spark, files, unit_out, fmt, ref_now,
            n_buckets, salt_buckets, hot_threshold,
        )
        valid_rows, dlq_rows = _unit_metrics(spark, unit_out, metrics_out)
        lineage.record_unit(
            out_root,
            {
                "unit_id": unit_id,
                "files": files,
                "rows_valid": valid_rows,
                "rows_dlq": dlq_rows,
                "wall_s": round(time.time() - tu, 3),
            },
        )
        ran.append(unit_id)

    # merge partial metrics → final metrics table (only over committed units)
    all_done = lineage.completed_units(out_root)
    if len(all_done) == len(units) and units:
        partials = spark.read.parquet(os.path.join(out_root, "metrics_partial"))
        merged = merge_sink_metrics(partials.drop("unit"))
        merged.write.mode("overwrite").parquet(os.path.join(out_root, "metrics"))

    recs = lineage.completed_units(out_root)
    return {
        "units_total": len(units),
        "units_run": ran,
        "units_skipped": skipped,
        "complete": len(recs) == len(units),
        "rows_valid": sum(r["rows_valid"] for r in recs.values()),
        "rows_dlq": sum(r["rows_dlq"] for r in recs.values()),
        "wall_s": round(time.time() - t0, 3),
    }


def read_routed(spark: SparkSession, out_root: str) -> DataFrame:
    """All committed routed (non-dlq) rows."""
    df = spark.read.parquet(os.path.join(out_root, "sinks"))
    return df.filter(F.col("sink_sev") != "dlq")


def read_dlq(spark: SparkSession, out_root: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(out_root, "sinks"))
    return df.filter(F.col("sink_sev") == "dlq")
