"""RFC3164 conformance: the engine must classify every reference corpus
line identically to the Go parser and reproduce its golden field values
(rfc3164_test.go:19-42, :152-197)."""

import pandas as pd
import pytest

from go_parsesyslog_spark.operators.parse_rfc3164 import (
    DEFAULT_REF_NOW,
    parse_rfc3164_batch,
)
from tests.corpus import (
    RFC3164_CASES,
    RFC3164_ERROR_CASES,
    RFC3164_NEWLINE_TAG,
    rfc3164_golden,
)


def _parse_one(line, ref_now=None):
    return parse_rfc3164_batch(pd.Series([line]), ref_now=ref_now).iloc[0]


@pytest.mark.parametrize("name,line,valid", RFC3164_CASES, ids=[c[0] for c in RFC3164_CASES])
def test_corpus_validity(name, line, valid):
    row = _parse_one(line)
    assert (row.err_code is None) == valid, f"{name}: err={row.err_code}"


@pytest.mark.parametrize(
    "name,line,valid,err", RFC3164_ERROR_CASES, ids=[c[0] for c in RFC3164_ERROR_CASES]
)
def test_error_paths(name, line, valid, err):
    row = _parse_one(line)
    assert row.err_code == err


def test_newline_in_tag_demotes_to_message():
    line, expect = RFC3164_NEWLINE_TAG
    row = _parse_one(line)
    assert row.err_code is None
    assert row.message == expect
    assert row.app is None or pd.isna(row.app)


def test_golden_donut_message():
    """rfc3164_test.go:152-197 — the full-field golden assertion."""
    msg, exp = rfc3164_golden(DEFAULT_REF_NOW)
    row = _parse_one(msg, ref_now=DEFAULT_REF_NOW)
    assert row.err_code is None
    assert row.priority == exp["priority"]
    assert row.facility == exp["facility"]
    assert row.severity == exp["severity"]
    assert row.host == exp["host"]
    assert row.app == exp["app"]
    assert row.pid == exp["pid"]
    assert row.message == exp["message"]
    assert row.msg_ts == DEFAULT_REF_NOW
    assert row.msg_length == len(exp["message"].encode("utf-8"))


def test_trailing_newline_kept_in_message():
    row = _parse_one("<34>Oct 20 12:34:56 myhost app[123]: hello world\n")
    assert row.message == "hello world\n"
    assert row.msg_length == 12


def test_year_inference_rolls_back():
    """date.go:73-86 + date_test.go golden: a stamp > 31 days in the
    future relative to ref_now parses into the previous year."""
    ref_now = pd.Timestamp("2025-10-21 15:30:00")
    row = _parse_one("<13>Dec 24 12:00:00 host app: x", ref_now=ref_now)
    assert row.msg_ts == pd.Timestamp("2024-12-24 12:00:00")
    row = _parse_one("<13>Oct 30 12:00:00 host app: x", ref_now=ref_now)
    assert row.msg_ts == pd.Timestamp("2025-10-30 12:00:00")


def test_leap_second_normalizes_forward():
    """date.go:69 allows ss=60; Go time.Date normalizes it into the next
    minute."""
    row = _parse_one("<13>Jan 12 03:04:60 host app: x",
                     ref_now=pd.Timestamp("2025-10-21 15:30:00"))
    assert row.err_code is None
    assert row.msg_ts == pd.Timestamp("2025-01-12 03:05:00")


def test_double_digit_tens_cap():
    """date.go:157-162: tens digit capped at '6' — minute '61' is out of
    range, minute '71' is an invalid number; both invalid."""
    for mm in ("61", "71", "9a"):
        row = _parse_one(f"<13>Jan 12 03:{mm}:05 host app: x")
        assert row.err_code == "invalid_timestamp", mm


def test_tag_glues_post_colon_bytes_into_app():
    """rfc3164.go:181-242: bytes after the colon (before a space) keep
    accumulating into the app buffer — 'app:message more' has no space
    after the colon, so app becomes 'appmessage'."""
    row = _parse_one("<13>Jan 12 03:04:05 host app:message more")
    assert row.err_code is None
    assert row.app == "appmessage"
    assert row.message == "more"


def test_pid_without_colon_is_not_a_tag():
    row = _parse_one("<13>Jan 12 03:04:05 host app[10] no colon here x")
    assert row.err_code is None
    assert row.app is None or pd.isna(row.app)
    assert row.message.startswith("app[10] no colon here")


def test_facility_severity_derivation_all_priorities():
    """priority.go:60-67 over the full 0..191 range."""
    lines = [f"<{p}>Jan 12 03:04:05 host app: x" for p in range(192)]
    out = parse_rfc3164_batch(pd.Series(lines))
    assert out.err_code.isna().all()
    assert (out.facility == pd.Series([p >> 3 for p in range(192)])).all()
    assert (out.severity == pd.Series([p & 7 for p in range(192)])).all()


def test_spark_parse_rfc3164(spark):
    """End-to-end through the Arrow-batched pandas UDF."""
    from go_parsesyslog_spark.operators.parse import parse_logs

    rows = [(c[0], c[1]) for c in RFC3164_CASES]
    df = spark.createDataFrame(rows, "name string, text string")
    out = parse_logs(df, fmt="rfc3164").collect()
    by_name = {r["name"]: r for r in out}
    for name, _line, valid in RFC3164_CASES:
        r = by_name[name]
        assert (r["err_code"] is None) == valid, f"{name}: {r['err_code']}"
        assert r["format"] == "RFC3164"
