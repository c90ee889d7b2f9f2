"""Conversation/transcript-level operators: stable-ordered turn
reassembly, turn-type transition counts, and inter-turn gap stats.

The north-rule invariant for this graft is "per-turn text equality
under stable (conv_id, turn_idx) ordering" — reassemble_conversations
IS that invariant as a queryable operator: any row whose path digest
differs from the reference ordering is an ordering bug, surfaced as a
hash mismatch in the driver's oracle compare.  Reference parity note:
the reference (wneessen/go-parsesyslog) processes one message at a
time (parsesyslog.go:side-effect-free per-call contract); ordering
across messages is the pipeline layer this graft adds.

Scale design (100 TB / 10^12 turns):
* reassembly is ONE shuffle on the conversation key; per-group payload
  is bounded by conversation length (thousands of turns), never corpus
  size — no global sort, no driver collect;
* the struct-sort happens inside each aggregation buffer
  (sort_array over collect_list), i.e. per conversation in parallel,
  not a corpus-wide orderBy;
* transitions/gaps use a window partitioned by the conversation key —
  the same single shuffle — then a map-side-combinable count agg on a
  tiny (type x type) key space.

All pure Catalyst (no Python in the hot path); every output column is
exact (BIGINT / md5 digest / string), so the DuckDB oracle replays
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def reassemble_conversations(
    turns: DataFrame,
    key_col: str,
    text_col: str,
    order_cols: list[str],
    sep: str = ">",
) -> DataFrame:
    """Per-conversation stable-ordered reassembly: concatenate
    ``text_col`` over turns ordered by ``order_cols`` (a total order —
    include a unique tiebreaker).  Emits a compact digest of the
    ordered path rather than the raw concatenation so the output stays
    O(conversations), not O(corpus):

      (key, n_turns BIGINT, path_md5, first_text, last_text)

    Implementation: collect_list(struct(order..., text)) inside the
    aggregation buffer, sort_array (struct sort = lexicographic by
    field order, so order_cols must lead), transform to the text field,
    concat_ws, md5.  One exchange on ``key_col``; everything else is
    per-group and JVM-side."""
    ordered = F.sort_array(
        F.collect_list(F.struct(*[F.col(c) for c in order_cols],
                                F.col(text_col).alias("_txt")))
    )
    texts = F.transform(ordered, lambda s: s["_txt"])
    return (
        turns.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.md5(F.array_join(texts, sep)).alias("path_md5"),
            F.element_at(texts, 1).alias("first_text"),
            F.element_at(texts, -1).alias("last_text"),
        )
    )


def turn_transitions(
    turns: DataFrame,
    key_col: str,
    state_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Markov transition counts over consecutive turns of each
    conversation: (prev_state, curr_state, n).  The window shuffles
    once on the conversation key; the final count groups on the tiny
    (state x state) space with map-side partials."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    return (
        turns.withColumn("_prev", F.lag(state_col).over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(F.col("_prev").alias("prev_state"),
                 F.col(state_col).alias("curr_state"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def turn_gap_stats(
    turns: DataFrame,
    key_col: str,
    ts_col: str,
    order_cols: list[str],
    group_col: str,
) -> DataFrame:
    """Inter-turn latency profile grouped by ``group_col`` (e.g. the
    turn type): for each group, the count / exact integer sum / max of
    whole-second gaps since the previous turn in the same conversation.
    All-integer outputs (unix-second truncation on both engines — the
    sessionize pairing) so the oracle hash is float-free."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w))
    return (
        turns.withColumn("_gap", gap)
        .filter(F.col("_gap").isNotNull())
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum("_gap").cast("long").alias("sum_gap_sec"),
            F.max("_gap").cast("long").alias("max_gap_sec"),
        )
    )


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Flatten overlapping/touching [start, end) intervals per key —
    the coverage question every activity/availability analysis asks
    (total covered time, distinct activity spans).  Touching intervals
    (next.start == prev.end) merge; a gap of any positive width splits.

    Classic sweep as pure window algebra, ONE shuffle on the key: sort
    by (start, end) within key, running max of all PREVIOUS ends, a
    new-span flag where start exceeds it, cumulative-sum the flags into
    a span id, then one (key, span) aggregate — which reuses the
    window's key partitioning (no second exchange of the fact rows).
    Per-key state is the sort; span count never exceeds row count.

    Output: (key, span_start, span_end, n_merged BIGINT)."""
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_span = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    span_id = F.sum(new_span).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("_span", span_id)
        .groupBy(key_col, "_span")
        .agg(
            F.min(start_col).alias("span_start"),
            F.max(end_col).alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_merged"),
        )
        .drop("_span")
    )
