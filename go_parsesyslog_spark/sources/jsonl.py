"""JSONL corpus source: newline-delimited JSON documents — the
dominant wire format for training-data corpora — with a dead-letter
column instead of job failure on corrupt lines.

Scale design (100 TB of .jsonl):
* the schema is REQUIRED, never inferred — schema inference runs a
  full sampling pass over the input before the real job (twice the
  scan at corpus scale) and can silently widen types between runs;
* ``spark.read.json`` on line-delimited input is line-splittable, so
  partition-sized splits parallelize across the cluster exactly like
  the raw syslog line source (sources/rawlog.py);
* PERMISSIVE mode + ``columnNameOfCorruptRecord``: a malformed line
  becomes a row whose parsed columns are NULL and whose raw text lands
  in the corrupt column — the parse → DLQ contract of the engine's
  syslog surface (errors.py taxonomy), applied to the corpus format.
  One bad shard line can never kill a 1000-executor job.

Reference parity note: the reference (wneessen/go-parsesyslog) returns
a per-message error from ParseString/ParseReader rather than aborting
the stream (parsesyslog.go:24-43); this source carries the same
per-record error discipline to JSONL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    with_source_file: bool = False,
) -> DataFrame:
    """Read a directory of JSONL files against an explicit ``schema``
    (DDL string WITHOUT the corrupt column — it is appended here).
    Output rows carry ``err_code`` = 'bad_json' (raw line preserved in
    ``raw_line``) for lines that fail to parse, NULL otherwise."""
    full = f"{schema}, {CORRUPT_COL} STRING"
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if with_source_file:
        df = df.withColumn("source_file", F.input_file_name())
    bad = F.col(CORRUPT_COL).isNotNull()
    return (
        df.withColumn("err_code", F.when(bad, F.lit("bad_json")))
        .withColumn("raw_line", F.col(CORRUPT_COL))
        .drop(CORRUPT_COL)
    )
