"""End-to-end parse → enrich → route → aggregate pipeline.

The Spark re-expression of the reference's whole purpose (SURVEY.md §2
Table B): one declarative DAG per work unit —

    scan(unit files)                       # columnar, pruned
      → parse_logs        (narrow, Arrow-batched, shuffle-free)
      → enrich            (broadcast joins only — no exchange)
      → with_route_columns(salted bucket assignment, literal hot set)
      → ONE fan-out partitioned write      (the only full shuffle)
      → windowed metrics from the written unit (column-pruned readback)

Work units are groups of input files: the unit is the resume/commit
granule (plans/lineage.py).  Per unit the input is scanned exactly once
and only TWO Spark jobs run — the fan-out write and the metrics
aggregation over the freshly written (column-pruned) unit.  Units run
concurrently on the scheduler (independent jobs), so per-job fixed
latency overlaps instead of accumulating.

Scale design notes (100 TB / 1000 executors):
* hot-conversation detection is ONE column-pruned pre-aggregation over
  the raw input; small hot sets fold into the route expression as a
  literal (no join), large ones spill to parquet and broadcast-hash-join
  (bounded plan size + driver memory, nothing truncated);
* unit size bounds the blast radius of a failure — a killed run loses
  at most the in-flight units; the marker rename is atomic;
* the fan-out shuffle is keyed (severity_class, conv_bucket, salt) —
  hot conversations split across ``salt_buckets`` writer tasks;
* metrics are partial-per-unit, merged driver-side (metric rows are
  O(sinks × windows), thousands of times smaller than the data).
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_parsesyslog_spark.operators.aggregate import sink_metrics
from go_parsesyslog_spark.operators.enrich import enrich
from go_parsesyslog_spark.operators.parse import parse_logs
from go_parsesyslog_spark.operators.route import compute_hot_set, with_route_columns
from go_parsesyslog_spark.plans import lineage
from go_parsesyslog_spark.sources.tableformat import (
    read_table,
    sink_format,
    write_partitioned,
)
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


def _write_pandas_parquet(pdf: pd.DataFrame, out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("datetime64[ns"):
            pdf[c] = pdf[c].astype("datetime64[us]")
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        os.path.join(out_dir, "part-00000.parquet"),
    )


def _process_unit(
    spark: SparkSession,
    files: list[str],
    unit_out: str,
    metrics_out: str,
    fmt: str,
    ref_now,
    n_buckets: int,
    salt_buckets: int,
    hot_set: dict,
    n_shuffle: int,
    salt_spread: int = 0,
) -> tuple[int, int]:
    df = spark.read.parquet(*files)
    parsed = parse_logs(df, text_col="text", fmt=fmt, ref_now=ref_now)
    enriched = enrich(parsed, spark)
    # Small hot sets fold into the route expression as an isin literal;
    # large ones (> HOT_LITERAL_CAP) come from the spilled parquet and
    # take a BroadcastHashJoin — plan size stays bounded, nothing is
    # truncated (VERDICT r1 #4).
    hot_df = (
        spark.read.parquet(hot_set["path"]) if hot_set.get("path") else None
    )
    routed = with_route_columns(
        enriched,
        n_buckets=n_buckets,
        salt_buckets=salt_buckets,
        hot_ids=hot_set.get("ids"),
        hot_df=hot_df,
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
    # Spark job 1: the only pass over the input.  Iceberg when the
    # runtime jar is present, partitioned parquet otherwise (probe +
    # logged fallback — sources/tableformat.py).
    #
    # The shuffle key decides how many writer tasks (= output files) a
    # (sink_sev, sink_key) cell spans.  The salt COLUMN always carries
    # the full per-row value; how much of it participates in the
    # shuffle is sized to the data (``salt_spread``, derived in
    # run_pipeline): a cell only needs several writers when it can
    # exceed one writer's comfortable file size, otherwise spreading it
    # just fragments the sink into per-salt shards (measured at sf0.1:
    # 2,503 files → 540 for identical 52 MB of output, and the write
    # phase halved).  At full spread the key is byte-identical to the
    # previous (sev, key, salt) behavior.
    if salt_spread > 1:
        spread_key = F.pmod(F.col("salt"), F.lit(salt_spread))
        shuffled = final.repartition(
            n_shuffle, F.col("sink_sev"), F.col("sink_key"), spread_key
        )
    else:
        shuffled = final.repartition(n_shuffle, "sink_sev", "sink_key")
    write_partitioned(shuffled, unit_out, ["sink_sev", "sink_key"])

    # Spark job 2: windowed metrics over the freshly written unit
    # (column-pruned scan); the small result merges driver-side.
    written = read_table(spark, unit_out)
    mpdf = sink_metrics(written).toPandas()
    _write_pandas_parquet(mpdf, metrics_out)
    valid = int(mpdf.loc[mpdf.sink_sev != "dlq", "turn_count"].sum())
    dlq = int(mpdf.loc[mpdf.sink_sev == "dlq", "turn_count"].sum())
    return valid, dlq


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
    unit_parallelism: int | None = None,
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

    pending = [(uid, files) for uid, files in units if uid not in done]
    skipped = [uid for uid, _ in units if uid in done]
    if max_units is not None:
        pending = pending[:max_units]

    hot_set: dict = {"ids": [], "path": None, "count": 0}
    if pending:
        all_files = [f for _, fs in pending for f in fs]
        hot_set = compute_hot_set(
            spark.read.parquet(*all_files).select("conv_id"),
            hot_threshold,
            spill_path=os.path.join(out_root, "_hot_set"),
        )

    # Concurrent units share the cores: enough units in flight that one
    # unit's stage boundaries (shuffle map → reduce → commit) overlap
    # another unit's compute — measured at local[32], 2 in-flight units
    # leave ~40% of cores idle between stages while 4 keep them busy.
    # Each unit's fan-out shuffle is sized to its core share so the
    # combined in-flight task count stays ≈ the core count.
    total_cores = spark.sparkContext.defaultParallelism
    if unit_parallelism is None:
        unit_parallelism = min(len(units), max(2, total_cores // 2))
    n_shuffle = max(8, total_cores // max(1, unit_parallelism))

    # Scale-adaptive salt spread for the fan-out write (guide §2.5/§6):
    # salting exists to split one oversized write cell across several
    # writer tasks.  A cell needs ceil(rows / target-rows-per-writer)
    # writers; below that, per-salt spreading only multiplies the file
    # count (x4.6 measured at sf0.1) and the commit/footer overhead
    # with zero skew benefit.  Sized from BOTH the largest single
    # conversation (the skew unit the salt was built for) and the mean
    # rows per (cell, unit) (so uniformly huge inputs still fan out),
    # it reaches the full ``salt_buckets`` spread automatically at
    # cluster scale — at 10^9-row hot conversations this reproduces the
    # round-5 behavior bit-for-bit (pmod(salt, spread) == salt at full
    # spread).  The salt COLUMN itself is untouched either way.
    target = int(os.environ.get("SPARK_GRAFT_SALT_TARGET_ROWS", 1_000_000))
    max_conv = int(hot_set.get("max_conv_rows") or 0)
    total_rows_est = int(hot_set.get("total_rows") or 0)
    n_cells = max(1, n_buckets)  # sev classes x conv buckets >= n_buckets
    mean_cell = total_rows_est / max(1, len(pending) or 1) / n_cells
    need = max(
        -(-max_conv // target),          # ceil
        -(-int(mean_cell) // target),
    )
    salt_spread = int(min(salt_buckets, max(1, need)))

    def run_one(unit):
        unit_id, files = unit
        lineage.clean_partial_unit(out_root, unit_id)
        unit_out = os.path.join(out_root, "sinks", f"unit={unit_id}")
        metrics_out = os.path.join(
            out_root, "metrics_partial", f"unit={unit_id}"
        )
        tu = time.time()
        valid, dlq = _process_unit(
            spark, files, unit_out, metrics_out, fmt, ref_now,
            n_buckets, salt_buckets, hot_set, n_shuffle, salt_spread,
        )
        lineage.record_unit(
            out_root,
            {
                "unit_id": unit_id,
                "files": files,
                "rows_valid": valid,
                "rows_dlq": dlq,
                "hot_convs": hot_set["count"],
                "wall_s": round(time.time() - tu, 3),
            },
        )
        return unit_id

    ran: list[str] = []
    if pending:
        with ThreadPoolExecutor(max_workers=max(1, unit_parallelism)) as ex:
            ran = list(ex.map(run_one, pending))

    # merge partial metrics → final metrics table (driver-side: partials
    # are O(sinks × windows), tiny relative to the data)
    all_done = lineage.completed_units(out_root)
    if len(all_done) == len(units) and units:
        import glob

        import pyarrow.parquet as pq

        parts = [
            pq.read_table(p).to_pandas()
            for p in glob.glob(
                os.path.join(out_root, "metrics_partial", "*", "*.parquet")
            )
        ]
        merged = (
            pd.concat(parts)
            .groupby(
                ["sink_id", "sink_sev", "sink_key", "severity_class",
                 "window_start", "window_end"],
                dropna=False,
                as_index=False,
            )
            .agg(
                turn_count=("turn_count", "sum"),
                approx_convs=("approx_convs", "max"),
                total_msg_bytes=("total_msg_bytes", "sum"),
            )
        )
        _write_pandas_parquet(merged, os.path.join(out_root, "metrics"))

    recs = lineage.completed_units(out_root)
    return {
        "units_total": len(units),
        "units_run": sorted(ran),
        "units_skipped": sorted(skipped),
        "complete": len(recs) == len(units),
        "rows_valid": sum(r["rows_valid"] for r in recs.values()),
        "rows_dlq": sum(r["rows_dlq"] for r in recs.values()),
        "wall_s": round(time.time() - t0, 3),
    }


def _read_sinks(spark: SparkSession, out_root: str) -> DataFrame:
    sinks = os.path.join(out_root, "sinks")
    if sink_format(spark) == "parquet":
        return spark.read.parquet(sinks)
    # Iceberg path-based tables are one table per unit — union them.
    units = sorted(
        os.path.join(sinks, d) for d in os.listdir(sinks)
        if d.startswith("unit=")
    )
    dfs = [read_table(spark, u) for u in units]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def read_routed(spark: SparkSession, out_root: str) -> DataFrame:
    """All committed routed (non-dlq) rows."""
    return _read_sinks(spark, out_root).filter(F.col("sink_sev") != "dlq")


def read_dlq(spark: SparkSession, out_root: str) -> DataFrame:
    return _read_sinks(spark, out_root).filter(F.col("sink_sev") == "dlq")
