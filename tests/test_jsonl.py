"""JSONL corpus source: schema-enforced read with per-line DLQ."""

import json
import os

from go_parsesyslog_spark.sources.jsonl import read_jsonl

SCHEMA = "doc_id BIGINT, text STRING, lang STRING"


def test_jsonl_dlq_and_fields(spark, tmp_path):
    p = tmp_path / "corpus"
    os.makedirs(p)
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en"}),
        '{"doc_id": 2, "text": "truncated',          # invalid JSON
        json.dumps({"doc_id": 3, "text": 'quote " é', "lang": "fr"}),
        "not json at all",
        json.dumps({"doc_id": 4}),                   # valid, missing fields
    ]
    (p / "part-0.jsonl").write_text("\n".join(lines))
    rows = sorted(
        read_jsonl(spark, str(p), SCHEMA).collect(),
        key=lambda r: (r["err_code"] or "", r["doc_id"] or -1),
    )
    ok = [r for r in rows if r["err_code"] is None]
    bad = [r for r in rows if r["err_code"] == "bad_json"]
    assert len(ok) == 3 and len(bad) == 2
    by_id = {r["doc_id"]: r for r in ok}
    assert by_id[1]["text"] == "hello world"
    assert by_id[3]["text"] == 'quote " é' and by_id[3]["lang"] == "fr"
    # missing fields parse to NULL without tripping the DLQ
    assert by_id[4]["text"] is None and by_id[4]["err_code"] is None
    # corrupt rows preserve the raw line for triage, fields NULL
    assert {r["raw_line"] for r in bad} == {lines[1], "not json at all"}
    assert all(r["doc_id"] is None for r in bad)
