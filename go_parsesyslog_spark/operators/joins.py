"""Temporal join operators Spark lacks natively: as-of join and
range (interval-containment) join.

Both avoid the naive plans that melt down at scale:

* a correlated "latest row before t" subquery per probe row is a
  per-row scan; a theta-join on ``r.ts <= l.ts`` is a
  BroadcastNestedLoopJoin (quadratic).  The as-of join here is the
  MERGE formulation: tag both inputs, union, ONE window pass per key —
  a single shuffle on the join key, linear work, no row explosion.
* a containment predicate ``start <= ts < end`` alone is also a
  nested-loop join.  The range join buckets time so containment
  becomes an EQUI-join on (key, bucket) plus a cheap residual filter —
  the standard bucketized-range-join technique; candidate fan-out per
  interval is ceil(span/bucket)+1, tunable.

Reference parity note: the reference (wneessen/go-parsesyslog) parses
single messages and has no joins; these extend the pipeline layer's
relational surface (SURVEY.md §2 Table B) with the temporal joins a
log/transcript pipeline needs (enrich events with the latest config
push, attribute errors to release windows, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_order: str,
    tolerance_sec: int | None = None,
) -> DataFrame:
    """For every left row, attach ``right_cols`` from the LATEST right
    row of the same key with ``right_ts <= left_ts`` (backward as-of,
    inclusive), plus ``asof_lag_sec`` (whole seconds since that row;
    NULL when no match).  ``right_order`` is a right-side total
    tiebreaker (e.g. a unique id): when several right rows share a
    timestamp the greatest ``right_order`` wins — without it the
    window's last() among equal sort keys would be partitioning-
    dependent, i.e. nondeterministic.

    Plan: union-tag, then last(ignorenulls) over ONE window partitioned
    by key ordered by (ts, side, tiebreak) with side=right<left so a
    same-timestamp right row matches.  Single exchange on ``key_col``;
    state per key is one running value per attached column.  Right
    column names must not collide with left's.

    ``tolerance_sec`` (like pandas.merge_asof): matches older than the
    tolerance are nulled out."""
    lt = left.withColumn("_t", F.col(left_ts)).withColumn(
        "_side", F.lit(1)
    )
    rt = (
        right.select(
            F.col(key_col),
            F.col(right_ts).alias("_t"),
            F.col(right_order).alias("_rord"),
            *[F.col(c) for c in right_cols],
        )
        .withColumn("_side", F.lit(0))
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(key_col)
        .orderBy("_t", "_side", F.col("_rord").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE struct carries (matched ts + every attached column), so all
    # outputs come from the SAME matched right row — ADVICE r5: per-
    # column independent last(col, ignorenulls) windows would fill a
    # NULL attached column from an OLDER right row, mixing attributes
    # of different matches (DuckDB's native ASOF JOIN — the oracle —
    # never does that).
    match = F.last(
        F.when(
            F.col("_side") == 0,
            F.struct(F.col("_t").alias("_mts"),
                     *[F.col(c) for c in right_cols]),
        ),
        ignorenulls=True,
    ).over(w)
    matched_ts = match["_mts"]
    lag_sec = F.unix_timestamp("_t") - F.unix_timestamp(matched_ts)
    in_tol = (
        F.lit(True) if tolerance_sec is None else (lag_sec <= tolerance_sec)
    )
    out = u
    for c in right_cols:
        out = out.withColumn(c, F.when(in_tol, match[c]))
    return (
        out.withColumn(
            "asof_lag_sec", F.when(in_tol, lag_sec).cast("long")
        )
        .filter(F.col("_side") == 1)
        .drop("_t", "_side", "_rord")
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_sec: int = 3600,
) -> DataFrame:
    """Inner join of point rows to interval rows of the same key with
    ``start <= ts < end`` (half-open), as an EQUI-join: intervals
    explode into the time buckets they touch (``ceil(span/bucket)+1``
    rows — pick ``bucket_sec`` near the typical span so fan-out stays
    ~2), points compute their single bucket, the join runs on
    (key, bucket) through the normal shuffled-hash/sort-merge path, and
    the exact containment predicate filters residuals.  Each matching
    (point, interval) pair appears exactly once because a point owns
    exactly one bucket.

    Returns points columns + interval columns (names must not
    collide)."""
    ps = F.unix_timestamp(F.col(ts_col))
    iv_start = F.unix_timestamp(F.col(start_col))
    iv_end = F.unix_timestamp(F.col(end_col))
    p = points.withColumn("_bkt", F.floor(ps / bucket_sec))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(F.floor(iv_start / bucket_sec),
                       F.floor(iv_end / bucket_sec))
        ),
    )
    return (
        p.join(iv, [key_col, "_bkt"])
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_bkt")
    )
