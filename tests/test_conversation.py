"""Conversation/transcript operators: stable-order reassembly,
transitions, gap stats, and the context-window chunker."""

import datetime
import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from go_parsesyslog_spark.operators.conversation import (
    reassemble_conversations,
    turn_gap_stats,
    turn_transitions,
)
from go_parsesyslog_spark.operators.curation import chunk_documents


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _turns(spark):
    # deliberately out of order in the input; (ts, event_id) is the
    # stable order (two turns share a ts -> event_id breaks the tie)
    rows = [
        Row(conv="c1", event_id=3, ts=_ts("2024-01-01 00:02:00"), txt="tool"),
        Row(conv="c1", event_id=1, ts=_ts("2024-01-01 00:00:00"), txt="user"),
        Row(conv="c1", event_id=2, ts=_ts("2024-01-01 00:01:00"), txt="asst"),
        Row(conv="c2", event_id=5, ts=_ts("2024-01-01 01:00:00"), txt="user"),
        Row(conv="c2", event_id=4, ts=_ts("2024-01-01 01:00:00"), txt="sys"),
    ]
    return spark.createDataFrame(rows).repartition(4)


def test_reassembly_stable_order(spark):
    out = reassemble_conversations(
        _turns(spark), "conv", "txt", ["ts", "event_id"]
    )
    got = {r["conv"]: r for r in out.collect()}
    assert got["c1"]["n_turns"] == 3
    assert got["c1"]["path_md5"] == hashlib.md5(b"user>asst>tool").hexdigest()
    assert (got["c1"]["first_text"], got["c1"]["last_text"]) == ("user", "tool")
    # same-ts pair ordered by the event_id tiebreak
    assert got["c2"]["path_md5"] == hashlib.md5(b"sys>user").hexdigest()
    assert got["c2"]["first_text"] == "sys"


def test_transitions_and_gaps(spark):
    df = _turns(spark)
    trans = {
        (r["prev_state"], r["curr_state"]): r["n"]
        for r in turn_transitions(
            df, "conv", "txt", ["ts", "event_id"]
        ).collect()
    }
    assert trans == {("user", "asst"): 1, ("asst", "tool"): 1,
                     ("sys", "user"): 1}

    gaps = {
        r["txt"]: (r["n_gaps"], r["sum_gap_sec"], r["max_gap_sec"])
        for r in turn_gap_stats(
            df, "conv", "ts", ["ts", "event_id"], "txt"
        ).collect()
    }
    # asst and tool each arrive 60s after the previous turn; the c2
    # same-ts pair contributes a 0s gap for "user"
    assert gaps["asst"] == (1, 60, 60)
    assert gaps["tool"] == (1, 60, 60)
    assert gaps["user"] == (1, 0, 0)


def test_chunking_covers_tail_and_overlaps(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a" * 500), Row(doc_id=2, text="xy"),
         Row(doc_id=3, text="")]
    )
    out = chunk_documents(docs, size=256, stride=192).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 1, 193, 385 -> lens 256, 256, 116 (tail kept)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [(r["chunk_start"], r["chunk_len"]) for r in c1] == [
        (1, 256), (193, 256), (385, 116)
    ]
    assert [r["chunk_idx"] for r in c1] == [0, 1, 2]
    # overlap: stride 192 < size 256 -> consecutive chunks share 64 chars
    # short and empty docs still yield exactly one chunk
    assert [(r["chunk_len"]) for r in by_doc[2]] == [2]
    assert [(r["chunk_len"]) for r in by_doc[3]] == [0]
    assert by_doc[3][0]["chunk_md5"] == hashlib.md5(b"").hexdigest()


def test_chunking_is_narrow(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="a" * 500)])
    plan = chunk_documents(docs, 256, 192)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_merge_intervals_semantics(spark):
    from go_parsesyslog_spark.operators.conversation import (
        merge_intervals,
    )

    df = spark.createDataFrame(
        [
            # k1: [0,10) overlaps [5,20); [20,30) TOUCHES -> merges;
            # [31,40) gaps -> new span; nested [32,35) absorbed
            (1, 0, 10), (1, 5, 20), (1, 20, 30), (1, 31, 40),
            (1, 32, 35),
            # k2: single interval
            (2, 100, 101),
        ],
        "k long, s long, e long",
    )
    out = sorted(
        (r["k"], r["span_start"], r["span_end"], r["n_merged"])
        for r in merge_intervals(df, "k", "s", "e").collect()
    )
    assert out == [(1, 0, 30, 3), (1, 31, 40, 2), (2, 100, 101, 1)]


def test_merge_intervals_one_exchange(spark):
    from go_parsesyslog_spark.operators.conversation import (
        merge_intervals,
    )

    df = spark.createDataFrame([(1, 0, 10)], "k long, s long, e long")
    plan = merge_intervals(df, "k", "s", "e")\
        ._jdf.queryExecution().executedPlan().toString()
    # the sweep windows and the span agg share one key shuffle
    assert plan.count("Exchange hashpartitioning") == 1, plan
