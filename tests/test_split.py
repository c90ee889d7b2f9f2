"""Multi-message stream splitting (the ParseReader-over-a-stream
analog): framed, newline, and mixed blobs; reference multi-frame case
(rfc5424_test.go:147-153)."""

from pyspark.sql import functions as F

from go_parsesyslog_spark.corpus import RFC5424_VALID
from go_parsesyslog_spark.operators.parse import parse_logs
from go_parsesyslog_spark.operators.split import split_messages


def test_hundred_concatenated_frames(spark):
    """Mirror of rfc5424_test.go:147-153: a buffer holding 100
    concatenated framed messages; every one splits out and parses clean,
    and the first equals the single-message golden parse."""
    one = RFC5424_VALID[0]
    blob = one * 100
    df = spark.createDataFrame([(1, blob)], "i int, text string")
    msgs = split_messages(df, fmt="rfc5424")
    rows = msgs.orderBy("msg_idx").collect()
    assert len(rows) == 100
    assert all(r["text"] == one for r in rows)

    parsed = parse_logs(msgs, fmt="rfc5424").filter(F.col("msg_idx") == 0)
    golden = parse_logs(
        spark.createDataFrame([(1, one)], "i int, text string"),
        fmt="rfc5424",
    )
    cols = ["priority", "host", "app", "message", "msg_length", "err_code"]
    assert parsed.select(*cols).collect() == golden.select(*cols).collect()


def test_newline_delimited_lines(spark):
    """RFC3164's only frame delimiter is \\n (README.md:17-22); the
    newline stays in the message, a trailing fragment is one message."""
    blob = "<34>Oct 11 22:14:15 h a: one\n<34>Oct 11 22:14:15 h a: two\ntail"
    df = spark.createDataFrame([(1, blob)], "i int, text string")
    rows = split_messages(df, fmt="rfc3164").orderBy("msg_idx").collect()
    assert [r["text"] for r in rows] == [
        "<34>Oct 11 22:14:15 h a: one\n",
        "<34>Oct 11 22:14:15 h a: two\n",
        "tail",
    ]


def test_mixed_auto_stream(spark):
    """Auto mode: framed RFC5424 interleaved with RFC3164 lines."""
    framed = RFC5424_VALID[0]
    line = "<34>Oct 11 22:14:15 h a: x\n"
    blob = line + framed + line
    df = spark.createDataFrame([(1, blob)], "i int, text string")
    rows = split_messages(df, fmt="auto").orderBy("msg_idx").collect()
    assert [r["text"] for r in rows] == [line, framed, line]
    parsed = parse_logs(split_messages(df, fmt="auto"), fmt="auto")
    got = parsed.orderBy("msg_idx").select("format", "err_code").collect()
    assert [g["format"] for g in got] == ["RFC3164", "RFC5424", "RFC3164"]
    assert all(g["err_code"] is None for g in got)


def test_short_final_frame_is_premature_eof(spark):
    """A stream cut mid-frame: the splitter emits the short frame as-is
    and the parse classifies it premature_eof, like ParseReader."""
    cut = "999 <34>1 2024-01-02T03:04:05Z h a p m - body-way-shorter"
    df = spark.createDataFrame([(1, cut)], "i int, text string")
    msgs = split_messages(df, fmt="rfc5424")
    assert msgs.count() == 1
    row = parse_logs(msgs, fmt="rfc5424").collect()[0]
    assert row["err_code"] == "premature_eof"


def test_multibyte_frame_lengths(spark):
    """Frame lengths count BYTES: multibyte UTF-8 in one message must
    not shift the split point of the next."""
    body = "héllo wörld"  # 13 bytes, 11 chars
    hdr = "<34>1 2024-01-02T03:04:05Z h a p m - "
    msg = hdr + body
    framed = f"{len(msg.encode('utf-8'))} {msg}"
    blob = framed * 3
    df = spark.createDataFrame([(1, blob)], "i int, text string")
    rows = split_messages(df, fmt="rfc5424").orderBy("msg_idx").collect()
    assert len(rows) == 3
    assert all(r["text"] == framed for r in rows)


def test_read_syslog_lines_and_octet(spark, tmp_path):
    """File-based source: newline-framed files split per line (scalable
    path); octet-framed files go whole-file through the byte-accurate
    frame splitter — including a message CONTAINING a newline, which
    line splitting would corrupt."""
    from go_parsesyslog_spark.sources.rawlog import read_syslog

    lines_dir = tmp_path / "lines"
    lines_dir.mkdir()
    (lines_dir / "a.log").write_text(
        "<34>Oct 11 22:14:15 h1 app1: one\n<35>Oct 11 22:14:16 h2 app2: two\n"
    )
    out = read_syslog(spark, str(lines_dir), framing="lines")
    rows = {r["message"]: r for r in out.collect()}
    assert set(rows) == {"one", "two"}
    assert rows["one"]["priority"] == 34
    assert rows["one"]["source_file"].endswith("a.log")

    octet_dir = tmp_path / "octet"
    octet_dir.mkdir()
    m1 = "<34>1 2024-01-02T03:04:05Z h a p m - body with\nnewline"
    m2 = "<35>1 2024-01-02T03:04:06Z h a p m - second"
    (octet_dir / "b.log").write_text(
        f"{len(m1.encode())} {m1}{len(m2.encode())} {m2}"
    )
    out2 = read_syslog(spark, str(octet_dir), framing="octet")
    msgs = sorted(r["message"] for r in out2.collect())
    assert msgs == ["body with\nnewline", "second"], msgs
