"""Conformance corpora ported verbatim from the reference test suites.

RFC3164: /root/reference/rfc3164/rfc3164_test.go:19-42 (10 valid / 8 invalid)
RFC5424: /root/reference/rfc5424/rfc5424_test.go:20-50 (8 valid / 18 invalid)

Each entry: (name, line, valid).  These pin down the exact valid/invalid
decision boundary of the reference parsers; the engine must classify
every line identically.
"""

RFC3164_CASES = [
    ("basic_tag_pid", "<34>Oct 20 12:34:56 myhost app[123]: hello world", True),
    ("basic_tag_pid_newline", "<34>Oct 20 12:34:56 myhost app[123]: hello world\n", True),
    ("single_digit_day_space_padded", "<13>Jan  2 03:04:05 host tag: message", True),
    ("double_digit_day", "<13>Jan 12 03:04:05 host tag: message", True),
    ("ipv4_hostname", "<13>Mar 15 11:22:33 192.0.2.1 app: payload", True),
    ("ipv6_hostname", "<13>Apr 01 00:00:00 2001:db8::1 app: boot", True),
    ("tag_without_pid", "<11>May 31 23:59:59 gw tag: done", True),
    ("unicode_in_msg", "<14>Jun 07 07:08:09 srv app: wärme ✓", True),
    ("maxish_tag_length_32", "<14>Jul 10 10:10:10 host AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA: x", True),
    ("pri_with_leading_zero", "<013>Aug 09 09:09:09 host app: ok", True),
    ("missing_pri_closer", "<13Sep 09 09:09:09 host app: nope", False),
    ("non_numeric_pri", "<ab>Sep 09 09:09:09 host app: nope", False),
    ("pri_out_of_range_192", "<192>Sep 09 09:09:09 host app: nope", False),
    ("invalid_month_token", "<13>Foo 12 03:04:05 host app: nope", False),
    ("day_zero", "<13>Jan 00 03:04:05 host app: nope", False),
    ("hour_24", "<13>Jan 12 24:00:00 host app: nope", False),
    ("missing_hostname", "<13>Jan 12 03:04:05 app: nope", False),
    ("no_space_after_colon", "<13>Jan 12 03:04:05 host app:message", False),
]

# Additional error-path cases from rfc3164_test.go:74-129
RFC3164_ERROR_CASES = [
    ("short_after_ts", "<13>Jan 12 03:04:05 ", False, "premature_eof"),
    ("empty", "", False, "premature_eof"),
    ("incomplete_ts", "<13>Jan 12 03:04", False, "premature_eof"),
    ("no_trailing_space_after_ts", "<13>Jan 12 03:04:59", False, "wrong_format"),
]

# rfc3164_test.go:118-129 — newline in tag demotes scanned bytes to message
RFC3164_NEWLINE_TAG = ("<13>Jan 12 03:04:59 mymachine mypro\n", "mypro")

_BOM = "﻿"

RFC5424_VALID = [
    '151 <34>1 2025-10-21T15:30:00Z mymachine app 12345 ID47 '
    '[exampleSDID@32473 iut="3" eventSource="Application" eventID="1011"] '
    "An application event log entry",
    "83 <165>1 2003-10-11T22:14:15.003Z 192.0.2.1 evntslog - ID47 - "
    + _BOM + "BOM-prefixed message",
    '120 <165>1 2003-08-24T05:14:15.000003-07:00 myhost su - ID47 '
    '[meta@123 foo="bar"][example@9999 a="b" c="d"] multi-SD message',
    '34 <14>1 - - - - - [id@1 k="v"] hello',
    '99 <190>1 2024-12-31T23:59:59Z host app 111 msg42 '
    '[x@999 q="quote: \\" backslash: \\\\ bracket: \\"]"] end',
    '46 <0>1 2020-01-01T00:00:00Z h a p m [id k="v"] m',
    "72 <13>1 2022-06-01T12:00:00+02:00 host app - mid - No structured data here",
    "37 <34>1 2025-10-21T15:30:00Z h a p m -",
]

RFC5424_INVALID = [
    "XX <34>1 2025-10-21T15:30:00Z h a p m - bad",
    "39<34>1 2025-10-21T15:30:00Z h a p m - bad",
    "39 34>1 2025-10-21T15:30:00Z h a p m - bad",
    "38 <>1 2025-10-21T15:30:00Z h a p m - bad",
    "40 <3x>1 2025-10-21T15:30:00Z h a p m - bad",
    "39 <34> 2025-10-21T15:30:00Z h a p m - bad",
    "40 <34>0 2025-10-21T15:30:00Z h a p m - bad",
    "40 <34>1 2025-13-01T00:00:00Z h a p m - bad",
    "40 <34>1 2025-10-21 15:30:00Z h a p m - bad",
    "39 <34>1 2025-10-21T15:30:00Z h a p m- bad",
    '59 <34>1 2025-10-21T15:30:00Z h a p m [id k="oops ] here"] bad',
    '53 <34>1 2025-10-21T15:30:00Z h a p m [bad id k="v"] bad',
    '48 <34>1 2025-10-21T15:30:00Z h a p m [id k="v" bad',
    '46 <34>1 2025-10-21T15:30:00Z h a p m [v="]"]] bad',
    '48 <34>1 2025-10-21T15:30:00Z h a p m [id ="v"] bad',
    '35 <14>1 - - - - - [id@1 k="v"] hello',
    "38 <34>1 2025-10-21T15:30:00Z h a p m -.",
    "73 <13>1 2022-06-01T12:00:00+02:00 host app - mid - No structured data here",
]


def rfc3164_golden(ref_now):
    """The '<165> do-nuts' golden message built against an injected
    reference time (rfc3164_test.go:44-51): timestamp formatted from
    ``ref_now``; expected fields per rfc3164_test.go:152-197."""
    ts = (
        ref_now.strftime("%b")
        + " "
        + f"{ref_now.day:2d}"
        + " "
        + ref_now.strftime("%H:%M:%S")
    )
    msg = (
        "<165>" + ts + " "
        + "myproc[10]: %% It's time to make the do-nuts.  %%  "
        "Ingredients: Mix=OK, Jelly=OK # Devices: "
        "Mixer=OK, Jelly_Injector=OK, Frier=OK # Transport: "
        "Conveyer1=OK, Conveyer2=OK # %%" + "\n"
    )
    msg = msg.replace("<165>" + ts + " ", "<165>" + ts + " mymachine ")
    expected = {
        "priority": 165,
        "facility": 20,
        "severity": 5,
        "host": "mymachine",
        "app": "myproc",
        "pid": "10",
        "message": msg[43:],
    }
    return msg, expected
