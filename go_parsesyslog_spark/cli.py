"""Demo CLI — the Spark analog of the reference's stdin parser
(``/root/reference/cmd/stdin-parser/main.go:19-65``): read one or more
wire-format messages from stdin, parse, pretty-print every LogMsg field
plus the parse latency.

Usage::

    echo '<34>Oct 11 22:14:15 host su: hi' | python -m go_parsesyslog_spark.cli
    cat framed.log | python -m go_parsesyslog_spark.cli --format rfc5424

The default path parses with the vectorized batch engine directly (no
JVM needed for a demo); ``--spark`` routes through a real SparkSession
and ``DataFrame.show`` — the "console sink".
"""

from __future__ import annotations

import argparse
import sys
import time

import pandas as pd


def _print_msg(row, fmt: str, latency_s: float) -> None:
    # field list mirrors cmd/stdin-parser/main.go:38-63
    print(f"Format: {fmt}")
    print(f"Priority: {row.priority}  Facility: {row.facility}  "
          f"Severity: {row.severity}")
    print(f"Timestamp: {row.msg_ts}")
    print(f"Hostname: {row.host}")
    print(f"AppName: {row.app}")
    print(f"ProcID: {row.pid}")
    print(f"MsgID: {row.msgid}")
    if row.structured_data:
        print("StructuredData:")
        for el in row.structured_data:
            print(f"  [{el['sd_id']}]")
            for p in el["params"]:
                print(f"    {p['key']} = {p['val']}")
    print(f"HasBOM: {row.has_bom}")
    print(f"MsgLength: {row.msg_length}")
    print(f"Message: {row.message!r}")
    if row.err_code:
        print(f"ParseError: {row.err_code}")
    print(f"Parse latency: {latency_s * 1e6:.3f}µs/msg (batch amortized)")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--format", default="auto",
                    choices=["auto", "rfc3164", "rfc5424"])
    ap.add_argument("--spark", action="store_true",
                    help="parse via a SparkSession and show() the result")
    args = ap.parse_args(argv)

    lines = [ln.rstrip("\n") for ln in sys.stdin if ln.strip()]
    if not lines:
        print("no input", file=sys.stderr)
        return 1

    if args.spark:
        from go_parsesyslog_spark.operators.parse import parse_logs
        from go_parsesyslog_spark.session import get_spark

        spark = get_spark(app_name="gps_cli")
        df = spark.createDataFrame([(ln,) for ln in lines], "text string")
        parse_logs(df, fmt=args.format).show(truncate=False)
        spark.stop()
        return 0

    from go_parsesyslog_spark.operators.parse import _dispatch_batch
    from go_parsesyslog_spark.operators.registry import new

    t0 = time.time()
    if args.format == "auto":
        out = _dispatch_batch(pd.Series(lines), None)
    else:
        out = new(args.format)(pd.Series(lines))
        out.insert(0, "format", args.format.upper())
    dt = (time.time() - t0) / len(lines)
    for i in range(len(out)):
        _print_msg(out.iloc[i], out.iloc[i].get("format", args.format), dt)
        if i < len(out) - 1:
            print("-" * 40)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
