"""Multi-level grouping analytics: ROLLUP / CUBE / GROUPING SETS and
wide->long UNPIVOT.

The reference's pipeline ends in per-sink counters (one counter per
severity class — see the aggregate stage this graft builds around
go-parsesyslog's msg.Priority/Facility/Severity fields); the moment
sinks have hierarchy (severity-class ⊃ severity, app ⊃ host, source ⊃
shard) an operator must produce every level of the hierarchy in one
pass.  That is ROLLUP/CUBE/GROUPING SETS.

Scale design (100 TB): Spark compiles ``rollup``/``cube``/
``groupingSets`` to a single Expand node feeding ONE hash aggregate —
every grouping level is answered with one scan and one shuffle, with
map-side partial aggregation running over the expanded rows.  At
10^12 rows this beats the naive L-unioned GROUP BYs (L scans, L
shuffles) by construction, and column pruning still reaches the scan
because Expand projects only the grouped/measured columns.  The output
key space is O(product of level cardinalities) — tiny — so the final
exchange moves almost nothing.

Null-key discipline: rolled-up levels surface as NULL group keys plus
a ``grouping_id`` bitmask (SQL-standard: bit i set = column i is
aggregated away).  We keep the bitmask AND coalesce the key columns to
a caller-supplied sentinel so downstream hashing/joining never has to
distinguish "NULL because rolled up" from "NULL in the data" — the
bitmask already does.

All pure Catalyst; integer-exact measures recommended for oracle
replay (counts, BIGINT sums).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _finish(
    grouped, keys: list[str], measures: dict[str, Column], sentinel: str
) -> DataFrame:
    """Shared tail: grouping_id bitmask + sentinel-coalesced keys +
    measures.  ``grouped`` is a GroupedData from rollup/cube/
    groupingSets over ``keys``."""
    out = grouped.agg(
        F.grouping_id().cast("long").alias("grouping_id"),
        *[expr.alias(name) for name, expr in measures.items()],
    )
    for k in keys:
        # keys come back as STRING: a non-string key coalesced with the
        # string sentinel would otherwise coerce the sentinel (CAST error)
        out = out.withColumn(
            k, F.coalesce(F.col(k).cast("string"), F.lit(sentinel))
        )
    return out.select(*keys, "grouping_id", *measures.keys())


def hierarchy_rollup(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, Column],
    sentinel: str = "ALL",
) -> DataFrame:
    """ROLLUP over ``keys``: every prefix level (k1,k2,...), (k1,...),
    ..., () aggregated in one Expand + one shuffle.  ``measures`` maps
    output column name -> aggregate Column.  Output:
    (*keys, grouping_id BIGINT, *measures) with rolled-up keys set to
    ``sentinel`` and the SQL-standard bitmask kept for disambiguation.
    """
    return _finish(df.rollup(*keys), keys, measures, sentinel)


def cube_counts(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, Column],
    sentinel: str = "ALL",
) -> DataFrame:
    """CUBE over ``keys``: all 2^len(keys) grouping combinations in one
    Expand + one shuffle.  Same output contract as hierarchy_rollup."""
    return _finish(df.cube(*keys), keys, measures, sentinel)


def grouping_sets_agg(
    df: DataFrame,
    sets: list[list[str]],
    keys: list[str],
    measures: dict[str, Column],
    sentinel: str = "ALL",
) -> DataFrame:
    """Explicit GROUPING SETS: aggregate exactly the requested
    combinations (each a subset of ``keys``), still one Expand + one
    shuffle.  ``sets`` is a list of column-name lists; ``keys`` is the
    union (declared explicitly so the output column order is stable).
    """
    grouped = df.groupingSets(
        [[F.col(c) for c in s] for s in sets],
        *[F.col(k) for k in keys],
    )
    return _finish(grouped, keys, measures, sentinel)


def unpivot_metrics(
    df: DataFrame,
    id_cols: list[str],
    metric_cols: list[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """Wide -> long UNPIVOT (melt): one row per (id, metric).  Purely
    narrow — Spark's native Expand, zero exchanges, linear in rows ×
    metrics — the shape feature-store exports need at any scale.
    Metric columns must share a common type (cast before calling)."""
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in metric_cols],
        var_name,
        value_name,
    )


def pivot_wide(
    df: DataFrame,
    key_col: str,
    pivot_col: str,
    values: list[str],
    measure=None,
    prefix: str = "",
) -> DataFrame:
    """Long -> wide PIVOT: one output row per key, one integer measure
    column per pivot value (``prefix + value``).  ``measure`` is a
    callable (condition Column) -> aggregate Column; default
    conditional count.

    Deliberately NOT ``Dataset.pivot``: even with explicit values,
    Spark's pivot plans a (key, pivot) pre-aggregate plus a pivotfirst
    aggregate — TWO exchanges.  Direct conditional aggregation is one
    scan and ONE shuffle on ``key_col`` with map-side partials — the
    plan a 10^12-row reshape needs (and explicit ``values`` means no
    distinct-discovery job either).  Values absent from the data yield
    0, so the output schema is static — what a downstream feature
    store requires."""
    measure = measure or (lambda cond: F.count(F.when(cond, 1)))
    # coalesce/cast applied to the aggregate expression itself — a
    # second select would have to re-reference data-derived column
    # names (backtick-quoting fragility for hostile pivot values)
    return df.groupBy(key_col).agg(
        *[
            F.coalesce(measure(F.col(pivot_col) == v), F.lit(0))
            .cast("long").alias(f"{prefix}{v}")
            for v in values
        ]
    )


def topk_per_group_dense(
    df: DataFrame,
    group_col: str,
    key_col: str,
    order_measure: Column,
    k: int,
) -> DataFrame:
    """Ties-preserving top-k: dense_rank over ``order_measure``
    (descending) within each group, keeping rank <= k — ALL tied rows
    at a kept rank are kept, so the result is a deterministic SET even
    when the measure ties (row_number would pick arbitrarily among
    ties and break oracle replay).  Two shuffles by necessity: the
    (group, key) measure agg, then the window re-partitioned on group
    alone — but the window input is the collapsed (group, key) frame,
    not the raw events.  Output: (group, key, n BIGINT, rnk INT).

    ``order_measure`` must be an aggregate Column (e.g.
    ``F.count(F.lit(1))``, ``F.sum("bytes")``) — it IS the ranking
    measure (ADVICE r5: the r5 body hardcoded count and silently
    ignored a non-count measure)."""
    from pyspark.sql import Window

    counted = df.groupBy(group_col, key_col).agg(
        order_measure.cast("long").alias("n")
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("n"))
    return (
        counted.withColumn("rnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= k)
        .select(group_col, key_col, "n", F.col("rnk").cast("int").alias("rnk"))
    )


def funnel_latency(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    start_type: str,
    end_type: str,
) -> DataFrame:
    """Per-conversation funnel: whole seconds from the FIRST
    ``start_type`` turn to the first ``end_type`` turn at-or-after it
    (conversations without both stages drop out).  One shuffle: the
    window partitions on the key and the subsequent agg groups on the
    same key, so Catalyst reuses the partitioning — the plan the
    funnel needs at 10^12 turns.  Integer-exact output:
    (key, t_start TIMESTAMP, funnel_sec BIGINT)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col)
    t0 = F.min(F.when(F.col(type_col) == start_type, F.col(ts_col))).over(w)
    return (
        df.withColumn("_t0", t0)
        .filter(
            (F.col(type_col) == end_type)
            & F.col("_t0").isNotNull()
            & (F.col(ts_col) >= F.col("_t0"))
        )
        .groupBy(key_col, F.col("_t0").alias("t_start"))
        .agg(F.min(F.unix_timestamp(ts_col)).alias("_tmin"))
        .select(
            key_col,
            "t_start",
            (F.col("_tmin") - F.unix_timestamp("t_start"))
            .cast("long")
            .alias("funnel_sec"),
        )
    )
