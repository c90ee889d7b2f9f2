"""Shared parsed-record schema — the Spark mapping of the reference's
``LogMsg`` struct (/root/reference/logmsg.go:14-34).

One fixed, static schema for both formats; fields a format does not
produce stay NULL (mirroring Go zero values).  ``structured_data`` keeps
the faithful nested shape — key order preserved, keys may repeat within
one element per RFC5424 — so it is Array(Struct) rather than a lossy Map
(logmsg.go:45-55; SURVEY.md §1.1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

SD_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("sd_id", T.StringType()),
            T.StructField(
                "params",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("key", T.StringType()),
                            T.StructField("val", T.StringType()),
                        ]
                    )
                ),
            ),
        ]
    )
)

# Column order of the parsed struct returned by both format parsers.
PARSED_STRUCT = T.StructType(
    [
        T.StructField("priority", T.IntegerType()),
        T.StructField("facility", T.IntegerType()),
        T.StructField("severity", T.IntegerType()),
        T.StructField("proto_version", T.IntegerType()),
        T.StructField("msg_ts", T.TimestampType()),
        T.StructField("host", T.StringType()),
        T.StructField("app", T.StringType()),
        T.StructField("pid", T.StringType()),
        T.StructField("msgid", T.StringType()),
        T.StructField("structured_data", SD_TYPE),
        T.StructField("has_bom", T.BooleanType()),
        T.StructField("message", T.StringType()),
        T.StructField("msg_length", T.IntegerType()),
        T.StructField("err_code", T.StringType()),
    ]
)

PARSED_COLUMNS = [f.name for f in PARSED_STRUCT.fields]
