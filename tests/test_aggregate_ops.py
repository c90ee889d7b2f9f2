"""Rolling RANGE-frame counts, integer-exact anomaly flags, and
dyadic-exact group quantiles."""

import datetime

from pyspark.sql import Row

from go_parsesyslog_spark.operators.aggregate import (
    group_quantiles,
    hourly_anomalies,
    rolling_daily_counts,
)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_rolling_skips_missing_days(spark):
    # days 0, 1, 10: the day-10 rolling window must NOT include days
    # 0/1 (a ROWS frame would)
    rows = [Row(u=1, ts=_ts("2024-01-01 05:00:00")),
            Row(u=1, ts=_ts("2024-01-01 06:00:00")),
            Row(u=1, ts=_ts("2024-01-02 05:00:00")),
            Row(u=1, ts=_ts("2024-01-11 05:00:00"))]
    out = {
        r["day_num"]: r
        for r in rolling_daily_counts(
            spark.createDataFrame(rows).repartition(3), "u", "ts", 7
        ).collect()
    }
    d0 = (datetime.date(2024, 1, 1) - datetime.date(1970, 1, 1)).days
    assert out[d0]["n_day"] == 2 and out[d0]["n_rolling"] == 2
    assert out[d0 + 1]["n_rolling"] == 3       # day 2 sees day 1
    assert out[d0 + 10]["n_rolling"] == 1      # day 11 sees nothing


def test_anomaly_exact_flag(spark):
    # 9 quiet hours of 10 events + 1 hour of 1000: the spike must flag,
    # the quiet hours must not
    rows = []
    for h in range(9):
        rows += [Row(g="a", ts=_ts(f"2024-01-01 0{h}:30:00"))] * 10
    rows += [Row(g="a", ts=_ts("2024-01-01 09:30:00"))] * 1000
    out = {
        r["hour_ts"].hour: r["is_anomaly"]
        for r in hourly_anomalies(
            spark.createDataFrame(rows).repartition(4), "g", "ts", 3
        ).collect()
    }
    assert out[9] is True
    assert all(out[h] is False for h in range(9))


def test_anomaly_single_hour_group_never_flags(spark):
    rows = [Row(g="b", ts=_ts("2024-01-01 00:00:01"))]
    out = hourly_anomalies(spark.createDataFrame(rows), "g", "ts").collect()
    assert out[0]["is_anomaly"] is False


def test_group_quantiles_dyadic_exact(spark):
    # n=5 values 1..5: p25 -> index 1.0 exactly -> 2.0; p50 -> 3.0;
    # p75 -> 4.0.  n=4 values 10,20,30,40: p50 -> 25.0 (interpolated)
    rows = [Row(g="a", v=i) for i in (3, 1, 5, 2, 4)] + [
        Row(g="b", v=i) for i in (40, 10, 30, 20)
    ]
    out = {
        r["g"]: r
        for r in group_quantiles(
            spark.createDataFrame(rows).repartition(3), "g", "v"
        ).collect()
    }
    assert (out["a"]["p25"], out["a"]["p50"], out["a"]["p75"]) == (2.0, 3.0, 4.0)
    assert out["b"]["p50"] == 25.0
    assert out["b"]["p25"] == 17.5


def test_resample_ffill_semantics(spark):
    import datetime

    import pyspark.sql.functions as F

    from go_parsesyslog_spark.operators.aggregate import resample_ffill

    t0 = datetime.datetime(2025, 1, 1, 0, 0, 0)

    def at(s):
        return t0 + datetime.timedelta(seconds=s)

    df = spark.createDataFrame(
        [
            # key 1: two obs in bucket 0 (later one wins), gap at
            # bucket 1-2, obs at bucket 3
            (1, at(5), 10, 1), (1, at(50), 20, 2), (1, at(185), 99, 3),
            # key 2: single observation -> single-bucket grid
            (2, at(70), 7, 4),
        ],
        "k long, ts timestamp, v long, eid long",
    )
    out = sorted(
        (r["k"], r["bucket_start"].second + r["bucket_start"].minute * 60,
         r["v"], r["is_observed"])
        for r in resample_ffill(df, "k", "ts", "v", 60,
                                order_cols=["eid"]).collect()
    )
    assert out == [
        (1, 0, 20, True),     # last obs in bucket wins
        (1, 60, 20, False),   # gap carries forward
        (1, 120, 20, False),
        (1, 180, 99, True),
        (2, 60, 7, True),     # span is per-key, no extrapolation
    ]


def test_resample_ffill_collapses_before_grid(spark):
    """The big-table shuffle must be the (key, bucket) collapse; the
    grid/join/window run on collapsed frames only (no exchange of the
    raw rows after the first aggregate)."""
    import pyspark.sql.functions as F

    from go_parsesyslog_spark.operators.aggregate import resample_ffill

    df = spark.range(100).select(
        (F.col("id") % 3).alias("k"),
        F.timestamp_seconds(F.col("id") * 10).alias("ts"),
        F.col("id").alias("v"),
    )
    plan = resample_ffill(df, "k", "ts", "v", 60)\
        ._jdf.queryExecution().executedPlan().toString()
    # first agg partial must appear below the first exchange
    first_exchange = plan.index("Exchange")
    assert "HashAggregate" in plan[first_exchange:], plan
    assert "max_by" in plan or "maxby" in plan.lower(), plan


def test_winsorized_stats_clamps_outliers(spark):
    from go_parsesyslog_spark.operators.aggregate import winsorized_stats

    # group g: values 0,10,20,30,1000 -> p25=10, p75=30;
    # clamped: 10,10,20,30,30 -> sum 100 (the 1000 outlier neutralized)
    df = spark.createDataFrame(
        [("g", v) for v in (0, 10, 20, 30, 1000)], "k string, v long"
    )
    r = winsorized_stats(df, "k", "v", 0.25, 0.75).collect()[0]
    assert (r["n"], r["lo"], r["hi"], r["winsorized_sum"]) == \
        (5, 10.0, 30.0, 100.0)


def test_winsorized_broadcast_no_fact_shuffle_for_join(spark):
    from go_parsesyslog_spark.operators.aggregate import winsorized_stats

    df = spark.createDataFrame([("g", 1)], "k string, v long")
    plan = winsorized_stats(df, "k", "v")\
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_rank_decile_profile(spark):
    from go_parsesyslog_spark.operators.aggregate import (
        rank_decile_profile,
    )

    # 11 values 0..10: pr = i/10, floor(pr*10) = i, capped at 9 for
    # the max row -> buckets 0..8 have 1 row, bucket 9 has 2
    df = spark.createDataFrame([("g", i) for i in range(11)],
                               "k string, v long")
    out = {r["bucket"]: r["n"]
           for r in rank_decile_profile(df, "k", "v", 10).collect()}
    assert out == {**{i: 1 for i in range(9)}, 9: 2}
    # ties share a bucket deterministically
    df2 = spark.createDataFrame([("g", 5)] * 4 + [("g", 9)],
                                "k string, v long")
    out2 = {r["bucket"]: r["n"]
            for r in rank_decile_profile(df2, "k", "v", 10).collect()}
    assert out2 == {0: 4, 9: 1}
