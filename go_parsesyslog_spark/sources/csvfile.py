"""CSV corpus source with per-row dead-letter handling — the third
file-based ingest next to raw syslog (rawlog.py) and JSONL (jsonl.py),
completing the formats a log/export pipeline actually receives.

Spark-first: ``spark.read.csv`` with an EXPLICIT schema (never
inferSchema — schema inference is an extra full scan of 100 TB and a
schema-drift hazard) in PERMISSIVE mode with
``columnNameOfCorruptRecord``: a malformed field nulls out and the raw
line lands in the corrupt column, so one bad row can never fail the
load or silently vanish — the same DLQ discipline as the parser's
err_code (errors.py) and jsonl.py's dead-letter column.  Line-oriented
CSV is splittable, so a directory parallelizes across the cluster with
column pruning reaching the scan.

Multiline/quoted-newline CSV is NOT enabled by default: ``multiLine``
makes files unsplittable (one task per file, the same trade rawlog.py
documents for octet framing) — callers who need it opt in explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DLQ_COL = "_corrupt"


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = False,
    sep: str = ",",
    multi_line: bool = False,
) -> DataFrame:
    """Load CSV files with dead-letter capture.  ``schema`` is the DDL
    of the DATA columns; the ``_corrupt`` string column is appended
    automatically and holds the raw line for every row with at least
    one malformed field (well-formed fields of such rows are still
    parsed — identity columns survive a bad metric column).  Returns
    data columns + ``_corrupt`` (NULL for clean rows).

    Spark restriction (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    COLUMN): a plan whose SCAN requires only ``_corrupt`` is rejected,
    and column pruning strips ride-along columns from pure counts —
    so "count the DLQ rows" must either cache first or genuinely
    consume a data column (e.g. aggregate both ``_corrupt`` and an id
    column), per the Spark CSV documentation."""
    full_schema = f"{schema}, {DLQ_COL} string"
    reader = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", DLQ_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
    )
    if multi_line:
        reader = reader.option("multiLine", "true")
    return reader.csv(path)
