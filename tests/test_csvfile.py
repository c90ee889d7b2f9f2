"""CSV corpus source (sources/csvfile.py).  Driver-gate parity lives
in __spark_entry__ (read_csv_corpus, regex-free oracle over 10,000
rows); these tests pin the PERMISSIVE DLQ semantics the operator's
contract promises."""

import pyspark.sql.functions as F


def _load(spark, tmp_path, lines, schema="a bigint, b string, c bigint"):
    from go_parsesyslog_spark.sources.csvfile import read_csv_corpus

    p = tmp_path / "csv_in"
    p.mkdir()
    (p / "part-0.csv").write_text("\n".join(lines) + "\n")
    return read_csv_corpus(spark, str(p), schema)


def test_clean_rows_parse_with_null_dlq(spark, tmp_path):
    out = _load(spark, tmp_path, ["1,x,10", "2,y,20"]).collect()
    rows = {(r["a"], r["b"], r["c"], r["_corrupt"]) for r in out}
    assert rows == {(1, "x", 10, None), (2, "y", 20, None)}


def test_malformed_field_keeps_identity_columns(spark, tmp_path):
    """The PERMISSIVE contract under test: a bad cell nulls that FIELD,
    keeps the row's other parsed fields, and lands the raw line in
    _corrupt — never drops the row or fails the load."""
    out = _load(spark, tmp_path, ["1,x,10", "2,y,notanumber"]).collect()
    by_a = {r["a"]: r for r in out}
    assert by_a[2]["b"] == "y"
    assert by_a[2]["c"] is None
    assert by_a[2]["_corrupt"] == "2,y,notanumber"
    assert by_a[1]["_corrupt"] is None


def test_short_and_long_rows(spark, tmp_path):
    out = _load(spark, tmp_path, ["1,x", "2,y,20,EXTRA"]).collect()
    by_a = {r["a"]: r for r in out}
    # missing trailing field -> NULL, not corrupt (CSV ragged-right)
    assert by_a[1]["c"] is None
    # extra field -> corrupt, parsed prefix kept
    assert by_a[2]["_corrupt"] == "2,y,20,EXTRA"


def test_csv_load_never_throws_on_garbage(spark, tmp_path):
    out = _load(spark, tmp_path, ["", "garbage without commas",
                                  ",,", "1,ok,2"])
    # Spark forbids plans whose SCAN needs only the corrupt column
    # (column pruning strips ride-along columns from a count, so the
    # materialization must genuinely use a data column — documented in
    # read_csv_corpus)
    rows = out.select("a", "_corrupt").collect()
    n_dlq = sum(r["_corrupt"] is not None for r in rows)
    clean = out.filter("a = 1").collect()[0]
    assert (clean["b"], clean["c"]) == ("ok", 2)
    assert n_dlq >= 1  # the garbage line is captured, not fatal
