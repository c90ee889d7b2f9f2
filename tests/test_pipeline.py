"""End-to-end pipeline correctness: routed-row equality, per-sink counts,
metrics merge, and kill/resume semantics (BASELINE.md graft targets)."""

import os

import pytest
from pyspark.sql import functions as F

from go_parsesyslog_spark.operators.enrich import enrich
from go_parsesyslog_spark.operators.parse import parse_logs
from go_parsesyslog_spark.operators.route import with_route_columns
from go_parsesyslog_spark.plans.pipeline import (
    read_dlq,
    read_routed,
    run_pipeline,
)
from go_parsesyslog_spark.sources.transcripts import (
    REF_NOW,
    write_transcripts_parquet,
)

N_ROWS = 4000


@pytest.fixture(scope="module")
def input_dir(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("transcripts"))
    write_transcripts_parquet(path, N_ROWS, seed=42, chunk_rows=1000)
    return path


@pytest.fixture(scope="module")
def pipeline_out(spark, input_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out"))
    summary = run_pipeline(
        spark, input_dir, out, n_units=4, n_buckets=8, resume=False
    )
    assert summary["complete"]
    return out, summary


def _oracle(spark, input_dir):
    """Independently recompute the expected routed rows (same parse
    operator — pinned separately by the corpus tests — but a fresh
    plan, straight from the input, bypassing the pipeline writes)."""
    df = spark.read.parquet(input_dir)
    parsed = parse_logs(df, fmt="auto", ref_now=REF_NOW)
    e = enrich(parsed, spark)
    r = with_route_columns(e, n_buckets=8)
    return r.withColumns(
        {
            "sink_sev": F.when(F.col("err_code").isNotNull(), F.lit("dlq"))
            .otherwise(F.col("severity_class")),
            "sink_key": F.when(F.col("err_code").isNotNull(), F.col("err_code"))
            .otherwise(F.col("conv_bucket").cast("string")),
        }
    )


KEY_COLS = ["conv_id", "turn_idx", "sink_sev", "sink_key", "message",
            "priority", "severity", "host", "app", "msg_length"]


def test_row_counts_conserved(spark, input_dir, pipeline_out):
    out, summary = pipeline_out
    assert summary["rows_valid"] + summary["rows_dlq"] == N_ROWS


def test_routed_row_equality(spark, input_dir, pipeline_out):
    """exceptAll in both directions empty (BASELINE.md)."""
    out, _ = pipeline_out
    got = spark.read.parquet(os.path.join(out, "sinks")).select(*KEY_COLS)
    exp = _oracle(spark, input_dir).select(*KEY_COLS)
    assert got.exceptAll(exp).isEmpty()
    assert exp.exceptAll(got).isEmpty()


def test_per_turn_text_equality(spark, input_dir, pipeline_out):
    """Parsed message equality per turn under stable (conv_id, turn_idx)
    ordering (input_hint invariant)."""
    out, _ = pipeline_out
    got = (
        read_routed(spark, out)
        .select("conv_id", "turn_idx", "message")
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    exp = (
        _oracle(spark, input_dir)
        .filter(F.col("err_code").isNull())
        .select("conv_id", "turn_idx", "message")
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert (g["conv_id"], g["turn_idx"], g["message"]) == (
            e["conv_id"], e["turn_idx"], e["message"]
        )


def test_per_sink_counts(spark, input_dir, pipeline_out):
    out, _ = pipeline_out
    got = {
        (r["sink_sev"], r["sink_key"]): r["count"]
        for r in spark.read.parquet(os.path.join(out, "sinks"))
        .groupBy("sink_sev", "sink_key").count().collect()
    }
    exp = {
        (r["sink_sev"], r["sink_key"]): r["count"]
        for r in _oracle(spark, input_dir)
        .groupBy("sink_sev", "sink_key").count().collect()
    }
    assert got == exp


def test_dlq_routing(spark, pipeline_out):
    """Invalid corpus lines land in the DLQ partitioned by err_code."""
    out, _ = pipeline_out
    dlq = read_dlq(spark, out)
    codes = {r["sink_key"] for r in dlq.select("sink_key").distinct().collect()}
    assert "invalid_prio" in codes
    assert "premature_eof" in codes
    assert dlq.filter(F.col("err_code") != F.col("sink_key")).isEmpty()


def test_merged_metrics_match_recount(spark, pipeline_out):
    out, _ = pipeline_out
    metrics = spark.read.parquet(os.path.join(out, "metrics"))
    total = metrics.agg(F.sum("turn_count")).collect()[0][0]
    assert total == N_ROWS  # metrics cover valid AND dlq sinks
    routed_rows = read_routed(spark, out).count()
    valid_total = metrics.filter(F.col("sink_sev") != "dlq").agg(
        F.sum("turn_count")
    ).collect()[0][0]
    assert valid_total == routed_rows
    per_sink_m = {
        r["sink_id"]: r["cnt"]
        for r in metrics.filter(F.col("sink_sev") != "dlq")
        .groupBy("sink_id")
        .agg(F.sum("turn_count").alias("cnt")).collect()
    }
    per_sink_r = {
        r["sink_id"]: r["count"]
        for r in read_routed(spark, out).groupBy("sink_id").count().collect()
    }
    assert per_sink_m == per_sink_r


def test_resume_skips_committed_units(spark, input_dir, tmp_path_factory):
    """Kill/resume: a run stopped after 2 of 4 units resumes without
    reprocessing them, and the final output matches a one-shot run."""
    out = str(tmp_path_factory.mktemp("resume_out"))
    s1 = run_pipeline(spark, input_dir, out, n_units=4, n_buckets=8,
                      resume=True, max_units=2)
    assert len(s1["units_run"]) == 2 and not s1["complete"]
    s2 = run_pipeline(spark, input_dir, out, n_units=4, n_buckets=8,
                      resume=True)
    assert s2["units_skipped"] == s1["units_run"]
    assert len(s2["units_run"]) == 2 and s2["complete"]
    assert s2["rows_valid"] + s2["rows_dlq"] == N_ROWS
    # no duplicates: unique (conv_id, turn_idx, unit)
    sinks = spark.read.parquet(os.path.join(out, "sinks"))
    assert sinks.count() == N_ROWS
    assert sinks.select("conv_id", "turn_idx").distinct().count() == N_ROWS


def test_hot_set_spills_and_broadcast_joins(spark, tmp_path_factory):
    """A hot set above HOT_LITERAL_CAP must spill to parquet (not
    truncate) and salt via a BroadcastHashJoin, not an isin literal
    (VERDICT r1 #4: a 100k-element IN-list bloats plan/codegen and a cap
    silently drops exactly the skewed conversations)."""
    from go_parsesyslog_spark.operators.route import (
        HOT_LITERAL_CAP,
        compute_hot_set,
    )

    n_hot = HOT_LITERAL_CAP + 200
    # n_hot conversations with 3 rows each + threshold 2 → all hot
    df = spark.range(0, n_hot * 3).select(
        F.concat(F.lit("c"), (F.col("id") % n_hot).cast("string")).alias(
            "conv_id"
        ),
        (F.col("id") / n_hot).cast("int").alias("turn_idx"),
        F.lit(None).cast("string").alias("err_code"),
        F.lit("info").alias("severity_class"),
    )
    spill = str(tmp_path_factory.mktemp("hotspill")) + "/hot"
    hot_set = compute_hot_set(df, hot_threshold=2, spill_path=spill)
    assert hot_set["ids"] is None and hot_set["path"] == spill
    assert hot_set["count"] == n_hot  # nothing truncated

    hot_df = spark.read.parquet(spill)
    routed = with_route_columns(
        df, n_buckets=8, salt_buckets=8, hot_df=hot_df
    )
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # every conversation is hot → salted across >1 bucket
    salts = routed.select("salt").distinct().count()
    assert salts > 1
    # and below the cap the literal path returns ids
    small = compute_hot_set(
        df.filter(F.col("conv_id") == "c1"), hot_threshold=2
    )
    assert small["path"] is None and small["ids"] == ["c1"]


def test_salting_splits_hot_conversations(spark, input_dir):
    df = spark.read.parquet(input_dir)
    parsed = parse_logs(df, fmt="auto", ref_now=REF_NOW)
    r = with_route_columns(enrich(parsed, spark), n_buckets=8,
                           salt_buckets=8, hot_threshold=100)
    hot = r.groupBy("conv_id").count().filter(F.col("count") > 100)
    assert hot.count() > 0, "datagen should produce hot conversations"
    salts = (
        r.join(hot.select("conv_id"), "conv_id")
        .select("salt").distinct().count()
    )
    assert salts > 1, "hot conversations must be salted across buckets"
    cold_salts = (
        r.join(hot.select("conv_id"), "conv_id", "left_anti")
        .select("salt").distinct().collect()
    )
    assert [row["salt"] for row in cold_salts] == [0]


def test_salt_spread_scales_with_data(spark, input_dir, tmp_path_factory):
    """The fan-out write's salt spread must size itself to the data:
    below the per-writer row target a (sink_sev, sink_key) cell writes
    ONE file per unit (no per-salt fragmentation); forcing a tiny
    target reproduces the full salted spread — with an identical row
    multiset either way (the salt COLUMN itself never changes)."""
    import glob

    from go_parsesyslog_spark.operators.route import compute_hot_set

    stats = compute_hot_set(
        spark.read.parquet(input_dir).select("conv_id"), hot_threshold=100
    )
    assert stats["total_rows"] == N_ROWS
    assert 100 < stats["max_conv_rows"] <= N_ROWS

    out_a = str(tmp_path_factory.mktemp("spread_default"))
    out_b = str(tmp_path_factory.mktemp("spread_forced"))
    run_pipeline(spark, input_dir, out_a, n_units=2, n_buckets=8,
                 resume=False)
    os.environ["SPARK_GRAFT_SALT_TARGET_ROWS"] = "1"
    try:
        run_pipeline(spark, input_dir, out_b, n_units=2, n_buckets=8,
                     resume=False)
    finally:
        del os.environ["SPARK_GRAFT_SALT_TARGET_ROWS"]

    def files_per_dir(root):
        counts = {}
        for f in glob.glob(os.path.join(root, "sinks", "*", "*", "*",
                                        "*.parquet")):
            counts.setdefault(os.path.dirname(f), 0)
            counts[os.path.dirname(f)] += 1
        return counts

    a_counts = files_per_dir(out_a)
    b_counts = files_per_dir(out_b)
    # default target (1M rows/writer) >> 4k-row input: one file per dir
    assert max(a_counts.values()) == 1
    # forced 1-row target: hot cells fan out across several writers
    assert max(b_counts.values()) > 1

    cols = ["conv_id", "turn_idx", "sink_sev", "sink_key", "salt"]
    rows_a = sorted(map(tuple, spark.read.parquet(
        os.path.join(out_a, "sinks")).select(*cols).collect()))
    rows_b = sorted(map(tuple, spark.read.parquet(
        os.path.join(out_b, "sinks")).select(*cols).collect()))
    assert rows_a == rows_b


def test_bucketed_join_has_no_shuffle(spark, tmp_path_factory, sf_dir):
    """Co-located join: two tables bucketed on the same key must
    sort-merge join with ZERO exchanges — the write-once-shuffle-never
    pattern for repeated big-big joins at 100 TB."""
    import re

    from go_parsesyslog_spark.sources.tableformat import write_bucketed

    base = str(tmp_path_factory.mktemp("bucketed"))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    write_bucketed(ev.select("event_id", "user_id", "event_type"),
                   "gps_bk_a", ["user_id"], 8, sort_cols=["user_id"],
                   path=f"{base}/a")
    write_bucketed(ev.select("event_id", "user_id", "ts"),
                   "gps_bk_b", ["user_id"], 8, sort_cols=["user_id"],
                   path=f"{base}/b")
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("gps_bk_a").join(
                spark.table("gps_bk_b"), "user_id"
            )
            plan = joined._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
            assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 0, plan
            assert "SortMergeJoin" in plan, plan
            # and it actually computes the right thing
            n = joined.count()
            want = (
                ev.select("event_id", "user_id").alias("a")
                .join(ev.select("event_id", "user_id").alias("b"), "user_id")
                .count()
            )
            assert n == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS gps_bk_a")
        spark.sql("DROP TABLE IF EXISTS gps_bk_b")


def test_write_clustered_enables_file_skipping(spark, tmp_path):
    """The data-skipping claim, checked against the actual parquet
    footers: after a range-clustered write, each file's min/max span
    of the cluster key covers a narrow slice, so a range predicate
    overlaps only ~selectivity x files — vs an unclustered write where
    EVERY file spans the whole domain and nothing can be skipped."""
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from go_parsesyslog_spark.sources.tableformat import write_clustered

    df = spark.range(100_000).select(
        F.col("id"),
        # write order deliberately decorrelated from the cluster key
        F.expr("(id * 7919) % 100000").alias("k"),
    )
    clustered = str(tmp_path / "clustered")
    plain = str(tmp_path / "plain")
    write_clustered(df, clustered, ["k"], n_files=8)
    df.repartition(8).write.mode("overwrite").parquet(plain)

    def spans(path):
        import glob
        out = []
        for f in sorted(glob.glob(f"{path}/part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            ki = next(i for i in range(md.num_columns)
                      if md.row_group(0).column(i).path_in_schema == "k")
            lo = min(md.row_group(g).column(ki).statistics.min
                     for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(ki).statistics.max
                     for g in range(md.num_row_groups))
            out.append((lo, hi))
        return out

    c_spans, p_spans = spans(clustered), spans(plain)
    assert len(c_spans) == 8
    # clustered files: non-overlapping narrow slices of the domain
    for (lo1, hi1), (lo2, _) in zip(sorted(c_spans), sorted(c_spans)[1:]):
        assert hi1 <= lo2
    pred = lambda lo, hi: not (hi < 10_000 or lo > 19_999)  # noqa: E731
    c_hit = sum(pred(lo, hi) for lo, hi in c_spans)
    p_hit = sum(pred(lo, hi) for lo, hi in p_spans)
    # 10% selectivity -> ~1-2 clustered files overlap; every plain one
    assert c_hit <= 2, c_spans
    assert p_hit == len(p_spans), p_spans
    # and the data survives the layout change byte-for-byte
    assert spark.read.parquet(clustered).count() == 100_000
