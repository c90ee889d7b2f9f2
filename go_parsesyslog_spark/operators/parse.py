"""The parse operator: DataFrame in, DataFrame + parsed LogMsg columns out.

This is the Spark equivalent of the reference's whole ``Parser``
interface (parsesyslog.go:23-26): the entire parse is ONE narrow,
shuffle-free projection over the ``text`` column, executed as an
Arrow-batched pandas UDF returning a struct.  Catalyst fuses it with the
scan; at 100 TB it parallelizes embarrassingly — no state crosses rows,
partitions, or batches.

Format dispatch happens *inside* the UDF per Arrow batch (a vectorized
mask split), so mixed-format tables are parsed in a single pass — using
``F.when`` over two separate UDFs would make Spark evaluate both UDFs
for every row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_parsesyslog_spark.operators import registry
from go_parsesyslog_spark.operators.schema import PARSED_COLUMNS, PARSED_STRUCT

AUTO = "auto"

# Output struct: `format` tag + the LogMsg fields.
PARSED_WITH_FORMAT = T.StructType(
    [T.StructField("format", T.StringType())] + list(PARSED_STRUCT.fields)
)

# Octet-framing heuristic: RFC5424 wire messages start with the LENGTH
# token (digits + space, rfc5424.go:360-368); RFC3164 lines start with
# '<'.  Only used for fmt="auto".
_FRAMED_RE = r"^[0-9]+ "


def _dispatch_batch(texts: pd.Series, ref_now) -> pd.DataFrame:
    texts = texts.reset_index(drop=True)
    mask = texts.fillna("").str.match(_FRAMED_RE).to_numpy()
    parts = []
    if mask.any():
        p = registry.new(registry.RFC5424)(texts[mask])
        p.index = np.where(mask)[0]
        p.insert(0, "format", "RFC5424")
        parts.append(p)
    if (~mask).any():
        p = registry.new(registry.RFC3164)(texts[~mask], ref_now=ref_now)
        p.index = np.where(~mask)[0]
        p.insert(0, "format", "RFC3164")
        parts.append(p)
    out = pd.concat(parts).sort_index() if len(parts) > 1 else parts[0]
    return out


def make_parse_udf(fmt: str = AUTO, ref_now: pd.Timestamp | None = None):
    """Build the Arrow-batched parse UDF for a format ('rfc3164',
    'rfc5424', or 'auto' for per-row wire-format detection)."""
    if fmt == AUTO:
        def fn(texts: pd.Series) -> pd.DataFrame:
            return _dispatch_batch(texts, ref_now)
    elif fmt == registry.RFC3164:
        def fn(texts: pd.Series) -> pd.DataFrame:
            out = registry.new(registry.RFC3164)(texts, ref_now=ref_now)
            out.insert(0, "format", "RFC3164")
            return out
    else:
        batch = registry.new(fmt)  # raises ParserTypeUnknown eagerly (A2)
        tag = fmt.upper()

        def fn(texts: pd.Series) -> pd.DataFrame:
            out = batch(texts)
            out.insert(0, "format", tag)
            return out

    return F.pandas_udf(fn, PARSED_WITH_FORMAT)


def parse_logs(
    df: DataFrame,
    text_col: str = "text",
    fmt: str = AUTO,
    ref_now: pd.Timestamp | None = None,
) -> DataFrame:
    """Attach the parsed LogMsg columns to ``df``.

    Equivalent of ParseString/ParseReader over every row (rfc3164.go:65-104,
    rfc5424.go:57-111), as a single narrow projection.
    """
    udf = make_parse_udf(fmt, ref_now)
    parsed = df.withColumn("_parsed", udf(F.col(text_col)))
    keep = [c for c in df.columns]
    return parsed.select(*keep, "_parsed.format", *[f"_parsed.{c}" for c in PARSED_COLUMNS])
