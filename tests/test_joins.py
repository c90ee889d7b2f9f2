"""As-of and bucketized range join semantics + plan shape."""

import datetime

from pyspark.sql import Row

from go_parsesyslog_spark.operators.joins import asof_join, range_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _asof_frames(spark):
    left = spark.createDataFrame(
        [Row(lid=1, k="a", ts=_ts("2024-01-01 10:00:00")),
         Row(lid=2, k="a", ts=_ts("2024-01-01 12:00:00")),
         Row(lid=3, k="a", ts=_ts("2024-01-01 09:00:00")),  # before any right
         Row(lid=4, k="b", ts=_ts("2024-01-01 10:00:00"))]  # key w/o right rows
    ).repartition(4)
    right = spark.createDataFrame(
        [Row(k="a", rts=_ts("2024-01-01 10:00:00"), rid=10, v="x"),
         Row(k="a", rts=_ts("2024-01-01 10:00:00"), rid=11, v="y"),  # ts tie
         Row(k="a", rts=_ts("2024-01-01 11:30:00"), rid=12, v="z")]
    ).repartition(3)
    return left, right


def test_asof_backward_inclusive_and_ties(spark):
    left, right = _asof_frames(spark)
    out = {
        r["lid"]: r
        for r in asof_join(
            left, right, "k", "ts", "rts",
            right_cols=["rid", "v"], right_order="rid",
        ).collect()
    }
    # same-ts right row matches (inclusive); rid tie broken by greatest
    assert (out[1]["rid"], out[1]["v"], out[1]["asof_lag_sec"]) == (11, "y", 0)
    # latest preceding right row wins
    assert (out[2]["rid"], out[2]["asof_lag_sec"]) == (12, 1800)
    # no preceding right row / key absent from right -> all NULL
    assert out[3]["rid"] is None and out[3]["asof_lag_sec"] is None
    assert out[4]["rid"] is None


def test_asof_tolerance(spark):
    left, right = _asof_frames(spark)
    out = {
        r["lid"]: r
        for r in asof_join(
            left, right, "k", "ts", "rts",
            right_cols=["rid"], right_order="rid", tolerance_sec=900,
        ).collect()
    }
    assert out[1]["rid"] == 11          # 0s old: inside tolerance
    assert out[2]["rid"] is None        # 1800s old: nulled out
    assert out[2]["asof_lag_sec"] is None


def test_asof_plan_has_no_nested_loop(spark):
    left, right = _asof_frames(spark)
    plan = asof_join(
        left, right, "k", "ts", "rts", right_cols=["rid"], right_order="rid"
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_range_join_boundaries_and_spans(spark):
    pts = spark.createDataFrame(
        [Row(pid=1, k="a", ts=_ts("2024-01-01 10:00:00")),   # == start
         Row(pid=2, k="a", ts=_ts("2024-01-01 10:29:59")),   # inside
         Row(pid=3, k="a", ts=_ts("2024-01-01 10:30:00")),   # == end: excluded
         Row(pid=4, k="b", ts=_ts("2024-01-01 10:15:00"))]   # wrong key
    ).repartition(4)
    iv = spark.createDataFrame(
        [Row(k="a", iid=100, s=_ts("2024-01-01 10:00:00"),
             e=_ts("2024-01-01 10:30:00"))]
    )
    # bucket far smaller than the span: interval explodes into many
    # buckets but each matching pair must still appear exactly once
    got = range_join(pts, iv, "k", "ts", "s", "e", bucket_sec=60).collect()
    assert sorted((r["pid"], r["iid"]) for r in got) == [(1, 100), (2, 100)]


def test_range_join_overlapping_intervals(spark):
    pts = spark.createDataFrame(
        [Row(pid=1, k="a", ts=_ts("2024-01-01 10:10:00"))]
    )
    iv = spark.createDataFrame(
        [Row(k="a", iid=1, s=_ts("2024-01-01 10:00:00"),
             e=_ts("2024-01-01 11:00:00")),
         Row(k="a", iid=2, s=_ts("2024-01-01 09:30:00"),
             e=_ts("2024-01-01 10:30:00"))]
    )
    got = range_join(pts, iv, "k", "ts", "s", "e", bucket_sec=3600).collect()
    assert sorted(r["iid"] for r in got) == [1, 2]


def test_asof_plan_is_single_exchange(spark):
    """The merge formulation's whole point: ONE shuffle on the key —
    if a refactor introduces a second exchange (e.g. a join instead of
    the union window), the linear-scaling claim is gone."""
    left, right = _asof_frames(spark)
    plan = asof_join(
        left, right, "k", "ts", "rts", right_cols=["rid"], right_order="rid"
    )._jdf.queryExecution().executedPlan().toString()
    # the fixture's own repartition() calls add RoundRobin exchanges;
    # the operator itself must contribute exactly one key shuffle
    assert plan.count("Exchange hashpartitioning") == 1, plan
