"""Multi-message stream splitting: the ``ParseReader``-over-a-stream
analog.

The reference's parsers pull ONE message per ``ParseReader`` call from a
reader that may hold many concatenated messages
(rfc5424/rfc5424_test.go:147-153 parses the first of 100 concatenated
frames; RFC3164's only frame delimiter is ``\\n`` — README.md:17-22).
The table model turns that iterator into rows: ``split_messages``
explodes a blob column into one row per wire message, preserving the
reference's framing rules:

* **octet-framed (RFC5424)**: ``LENGTH `` prefix, then exactly LENGTH
  bytes (rfc5424.go:360-368, :94-104).  A short final frame (stream cut
  mid-message) is emitted as-is — the parse stage then classifies it
  premature_eof, exactly like ParseReader would.
* **newline-delimited (RFC3164)**: up to and INCLUDING the ``\\n``
  (ReadSlice, rfc3164.go:90-101); a trailing fragment without ``\\n`` is
  one final message.
* **auto**: a chunk starting with digits+space is framed, else a line —
  per-message detection, so mixed streams split correctly (framed
  RFC5424 between RFC3164 lines).

Frame lengths count BYTES, so the splitter works on the UTF-8 encoding
and decodes back — char arithmetic would mis-split around multibyte
text.  The per-blob scan is a linear Python loop inside an
Arrow-batched pandas UDF: blobs are few and fat (one per reader/file
chunk), the per-message work downstream is the vectorized parse.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FRAME_RE = re.compile(rb"(\d{1,9}) ")

RFC3164 = "rfc3164"
RFC5424 = "rfc5424"
AUTO = "auto"


def _split_blob(b: bytes, fmt: str) -> list[str]:
    out: list[str] = []
    i, n = 0, len(b)
    while i < n:
        framed = False
        if fmt in (AUTO, RFC5424):
            m = _FRAME_RE.match(b, i)
            if m:
                length = int(m.group(1))
                end = min(m.end() + length, n)
                out.append(b[i:end].decode("utf-8", errors="replace"))
                i = end
                framed = True
        if not framed:
            j = b.find(b"\n", i)
            end = n if j < 0 else j + 1
            out.append(b[i:end].decode("utf-8", errors="replace"))
            i = end
    return out


def split_messages(
    df: DataFrame, blob_col: str = "text", fmt: str = AUTO
) -> DataFrame:
    """Explode a column of concatenated wire messages into one row per
    message, adding ``msg_idx`` (0-based position within the blob) and
    replacing ``blob_col`` with the single message text.  Feed the
    result straight into ``parse_logs``."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def split_udf(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _split_blob(s.encode("utf-8"), fmt) if s is not None else []
                for s in blobs
            ]
        )

    keep = [c for c in df.columns if c != blob_col]
    return (
        df.withColumn("_msgs", split_udf(F.col(blob_col)))
        .select(
            *keep,
            F.posexplode("_msgs").alias("msg_idx", blob_col),
        )
    )
