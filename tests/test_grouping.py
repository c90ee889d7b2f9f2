"""Multi-level grouping analytics (operators/grouping.py): ROLLUP /
CUBE / GROUPING SETS, UNPIVOT, ties-preserving top-k, funnel latency.
Driver-gate parity lives in __spark_entry__ (rollup_type_dow /
cube_status_priority / grouping_sets_returns / unpivot_doc_metrics /
topk_users_dense / funnel_click_purchase oracles); these tests pin the
semantics and the one-Expand-one-shuffle scale shape."""

import datetime

import pyspark.sql.functions as F

from go_parsesyslog_spark.operators.grouping import (
    cube_counts,
    funnel_latency,
    grouping_sets_agg,
    hierarchy_rollup,
    pivot_wide,
    topk_per_group_dense,
    unpivot_metrics,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _sales(spark):
    return spark.createDataFrame(
        [("a", 1, 10), ("a", 1, 20), ("a", 2, 5), ("b", 1, 7)],
        "k string, sub int, v int",
    )


def test_rollup_levels(spark):
    out = {
        (r["k"], r["sub"], r["grouping_id"]): r["n"]
        for r in hierarchy_rollup(
            _sales(spark), ["k", "sub"],
            {"n": F.count(F.lit(1)).cast("long")},
        ).collect()
    }
    # leaf level (gid 0), per-k subtotal (gid 1), grand total (gid 3)
    assert out[("a", "1", 0)] == 2
    assert out[("a", "ALL", 1)] == 3
    assert out[("ALL", "ALL", 3)] == 4
    # rollup of 2 keys = 3 levels; no (ALL, sub) slice (that's CUBE)
    assert len(out) == 3 + 2 + 1
    assert not any(k == "ALL" and s != "ALL" for k, s, _ in out)


def test_cube_has_all_slices(spark):
    out = {
        (r["k"], r["sub"], r["grouping_id"]): r["n"]
        for r in cube_counts(
            _sales(spark), ["k", "sub"],
            {"n": F.count(F.lit(1)).cast("long")},
        ).collect()
    }
    # the slice rollup lacks: sub subtotal with k aggregated (gid 2)
    assert out[("ALL", "1", 2)] == 3
    assert out[("ALL", "2", 2)] == 1


def test_grouping_sets_exact_sets(spark):
    out = grouping_sets_agg(
        _sales(spark), [["k"], []], ["k", "sub"],
        {"sum_v": F.sum("v").cast("long")},
    ).collect()
    got = {(r["k"], r["sub"], r["grouping_id"]): r["sum_v"] for r in out}
    # only the requested sets appear: (k) with sub rolled, and ()
    assert got == {
        ("a", "ALL", 1): 35,
        ("b", "ALL", 1): 7,
        ("ALL", "ALL", 3): 42,
    }


def test_rollup_is_one_expand_one_shuffle(spark):
    """The 100 TB claim: every level from ONE Expand feeding ONE
    exchange with map-side partials — never L unioned GROUP BYs."""
    plan = _plan(
        hierarchy_rollup(
            _sales(spark), ["k", "sub"],
            {"n": F.count(F.lit(1)).cast("long")},
        )
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Expand" in plan, plan


def test_unpivot_round_trip_and_narrow(spark):
    df = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 200)], "id long, m1 long, m2 long"
    )
    out = unpivot_metrics(df, ["id"], ["m1", "m2"])
    rows = {(r["id"], r["metric"]): r["value"] for r in out.collect()}
    assert rows == {(1, "m1"): 10, (1, "m2"): 100,
                    (2, "m1"): 20, (2, "m2"): 200}
    assert "Exchange" not in _plan(out)


def test_pivot_wide_static_schema(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "b")], "id long, t string"
    )
    out = pivot_wide(df, "id", "t", ["a", "b", "c"], prefix="n_")
    assert out.columns == ["id", "n_a", "n_b", "n_c"]
    rows = {r["id"]: (r["n_a"], r["n_b"], r["n_c"]) for r in out.collect()}
    # absent pivot value 'c' -> 0, never NULL (static downstream schema)
    assert rows == {1: (2, 1, 0), 2: (0, 1, 0)}


def test_pivot_is_single_aggregate(spark):
    """Conditional aggregation => ONE hash-aggregate (one shuffle) —
    unlike Dataset.pivot's two-exchange pivotfirst plan."""
    df = spark.createDataFrame([(1, "a")], "id long, t string")
    plan = _plan(pivot_wide(df, "id", "t", ["a", "b"]))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "pivotfirst" not in plan, plan


def test_topk_dense_keeps_ties(spark):
    df = spark.createDataFrame(
        [("g", u) for u in ("x", "x", "y", "y", "z")],
        "grp string, member string",
    )
    out = topk_per_group_dense(df, "grp", "member", F.count(F.lit(1)), 1)
    rows = sorted((r["member"], r["n"], r["rnk"]) for r in out.collect())
    # x and y tie at n=2 -> BOTH kept at rank 1; z (n=1) dropped
    assert rows == [("x", 2, 1), ("y", 2, 1)]


def test_topk_dense_honors_order_measure(spark):
    """ADVICE r5: a non-count measure must drive the ranking (the r5
    body hardcoded count and silently ignored the parameter)."""
    df = spark.createDataFrame(
        [("g", "a", 100), ("g", "b", 1), ("g", "b", 1), ("g", "b", 1)],
        "grp string, member string, bytes long",
    )
    out = topk_per_group_dense(df, "grp", "member", F.sum("bytes"), 1)
    rows = [(r["member"], r["n"], r["rnk"]) for r in out.collect()]
    # by count b (3 rows) would win; by sum(bytes) a (100) must win
    assert rows == [("a", 100, 1)]


def test_topk_pushes_group_limit_below_shuffle(spark):
    plan = _plan(
        topk_per_group_dense(
            _sales(spark), "k", "sub", F.count(F.lit(1)), 2
        )
    )
    # Spark's rank-limit pushdown: a Partial WindowGroupLimit must sit
    # below the window's exchange so only candidate rows shuffle
    assert "WindowGroupLimit" in plan, plan


def test_funnel_latency_semantics(spark):
    t0 = datetime.datetime(2025, 1, 1, 12, 0, 0)

    def at(s):
        return t0 + datetime.timedelta(seconds=s)

    df = spark.createDataFrame(
        [
            # u1: purchase BEFORE first click is ignored; first
            # at-or-after click+10 wins
            (1, at(0), "purchase"), (1, at(5), "click"),
            (1, at(15), "purchase"), (1, at(99), "purchase"),
            # u2: click but no purchase -> drops out
            (2, at(0), "click"),
            # u3: purchase but no click -> drops out
            (3, at(0), "purchase"),
        ],
        "uid long, ts timestamp, et string",
    )
    out = funnel_latency(df, "uid", "ts", "et", "click", "purchase")
    rows = {r["uid"]: r["funnel_sec"] for r in out.collect()}
    assert rows == {1: 10}


def test_funnel_agg_reuses_window_partitioning(spark):
    """The plan claim in the docstring: window shuffle on the key, then
    the (key, t_start) agg runs with NO second exchange."""
    df = spark.createDataFrame(
        [(1, datetime.datetime(2025, 1, 1), "click"),
         (1, datetime.datetime(2025, 1, 2), "purchase")],
        "uid long, ts timestamp, et string",
    )
    plan = _plan(funnel_latency(df, "uid", "ts", "et", "click", "purchase"))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_pivot_survives_hostile_value_names(spark):
    df = spark.createDataFrame([(1, "a`b"), (1, "c.d")],
                               "id long, t string")
    out = pivot_wide(df, "id", "t", ["a`b", "c.d", "e f"], prefix="n_")
    r = out.collect()[0]
    assert (r["n_a`b"], r["n_c.d"], r["n_e f"]) == (1, 1, 0)
