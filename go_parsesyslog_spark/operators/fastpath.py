"""RE2-vectorized fast paths for canonical wire messages.

The exact parsers (parse_rfc3164/parse_rfc5424) replicate every
reference quirk but pay pandas object-dtype overhead per string op.
This module adds a fast path: ONE anchored RE2 ``pyarrow.compute
.extract_regex`` call (C++, ~0.5-2 µs/row) whose pattern is written so
narrowly that any matching row's semantics are *provably identical* to
the exact parser's — anything else (corpus oddities, invalid lines,
non-ASCII headers, frame mismatches, oversized tags) falls back to the
exact implementation row-by-batch.

Equality is enforced by differential tests (tests/test_fastpath.py):
fast+fallback output must equal exact-only output on corpus lines,
generated traffic, and randomized mutations.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from go_parsesyslog_spark.errors import (
    ERR_INVALID_LENGTH,
    ERR_PREMATURE_EOF,
)

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

# Strict-valid RFC3164 shape.  Bounds that the regex cannot express
# (PRI ≤ 191, 32-byte tag window) are checked vectorized afterwards;
# violators fall back to the exact parser.
FAST_3164_RE = (
    r"^<(?P<pri>\d{1,3})>"
    r"(?P<mon>Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"
    r" (?P<day> [1-9]|0[1-9]|[12]\d|3[01])"
    r" (?P<hh>[01]\d|2[0-3]):(?P<mm>[0-5]\d):(?P<ss>[0-5]\d|60)"
    r" (?P<host>[^\n ]+)"
    r" (?P<app>[^ :\[\]\n]+)(?:(?P<lbr>\[)(?P<pid>[^\]\[\n: ]*)\])?: "
    r"(?P<msg>[^\n]*\n?)$"
)

# Strict-valid octet-framed RFC5424 shape (ASCII-only rows; simple SD
# without escapes).  `sp` distinguishes "no byte after SD" (EOF) from
# "space + empty body".
FAST_5424_RE = (
    r"^(?P<frame>\d{1,9}) "
    r"<(?P<pri>\d{1,3})>1 "
    r"(?P<ts>-|\d{4}-\d{2}-\d{2}T\d{2}:[0-5]\d:[0-5]\d(?:\.\d{1,9})?"
    r"(?:Z|[+-]\d{2}:\d{2})) "
    r"(?P<host>[^\n ]+) (?P<app>[^\n ]+) (?P<procid>[^\n ]+) "
    r"(?P<msgid>[^\n ]+) "
    r'(?P<sd>-|(?:\[[A-Za-z0-9@._#/+-]+(?: [A-Za-z0-9@._#/+-]+="[^"\\\]\n]*")*\])+)'
    r"(?P<sp> )?(?P<body>[^\n]*)$"
)

_SD_ELEM = re.compile(r"\[([A-Za-z0-9@._#/+-]+)((?: [A-Za-z0-9@._#/+-]+=\"[^\"]*\")*)\]")
_SD_PARAM = re.compile(r' ([A-Za-z0-9@._#/+-]+)="([^"]*)"')


def combine_fast_slow(fast_df: pd.DataFrame, slow_out: pd.DataFrame) -> pd.DataFrame:
    """Merge fast-path and exact-fallback frames (disjoint positional
    indexes) and scrub the NaNs pd.concat silently introduces into
    all-None object columns (Arrow rejects NaN in list-typed columns).

    The scrub must also catch columns whose dtype COLLAPSED to float64:
    when one side is empty (or its column all-None), concat infers
    float64 for the whole column and every None becomes a float NaN —
    which the Arrow serializer then tries to iterate as a list and
    crashes.  Any column that was object-typed on either input stays
    object-typed on the output."""
    out = pd.concat([fast_df, slow_out]).sort_index()
    for c in out.columns:
        col = out[c]
        was_object = (
            (c in fast_df.columns and fast_df[c].dtype == object)
            or (c in slow_out.columns and slow_out[c].dtype == object)
        )
        if col.dtype == object or was_object:
            arr = col.to_numpy(dtype=object, copy=True)
            mask = pd.isna(arr)
            if mask.any():
                arr[mask] = None
            out[c] = pd.Series(arr, index=out.index, dtype=object)
    return out


def _f(m, name):
    return pc.struct_field(m, name)


def _np_str(arr) -> np.ndarray:
    return arr.to_pandas().to_numpy(dtype=object)


def _month_bases(year: int) -> np.ndarray:
    return np.array(
        [np.datetime64(f"{year}-{m:02d}-01", "s") for m in range(1, 13)]
    )


def fast_rfc3164(s: pd.Series, ref_now: pd.Timestamp):
    """Returns (fast_frame | None, slow_mask ndarray).

    fast_frame holds parsed columns for rows where slow_mask is False;
    its index is the positional index of those rows.
    """
    n = len(s)
    arr = pa.Array.from_pandas(s)
    m = pc.extract_regex(arr, FAST_3164_RE)
    ok = pc.is_valid(m).to_numpy(zero_copy_only=False)
    if not ok.any():
        return None, np.ones(n, dtype=bool)

    pri = pc.cast(_f(m, "pri"), pa.int32()).to_numpy(zero_copy_only=False)
    app_len = pc.utf8_length(_f(m, "app")).to_numpy(zero_copy_only=False)
    pid_len = pc.utf8_length(_f(m, "pid")).to_numpy(zero_copy_only=False)
    has_br = np.asarray(_np_str(_f(m, "lbr")) == "[")
    # tag chars before the breaking space: app + optional [pid] + ':'
    tag_len = app_len + np.where(has_br, pid_len + 2, 0) + 1
    viol = (pri > 191) | (tag_len > 31)
    fast = ok & ~viol
    slow = ~fast
    if not fast.any():
        return None, slow

    mon_idx = pc.index_in(
        _f(m, "mon"), value_set=pa.array(_MONTHS)
    ).to_numpy(zero_copy_only=False)
    day = pc.cast(pc.utf8_ltrim(_f(m, "day"), " "), pa.int32()).to_numpy(
        zero_copy_only=False
    )
    hh = pc.cast(_f(m, "hh"), pa.int32()).to_numpy(zero_copy_only=False)
    mm = pc.cast(_f(m, "mm"), pa.int32()).to_numpy(zero_copy_only=False)
    ss = pc.cast(_f(m, "ss"), pa.int32()).to_numpy(zero_copy_only=False)

    fi = np.where(fast)[0]
    pri_fi = pri[fi].astype(np.int32)
    secs = (
        ((day - 1) * 86400 + hh * 3600 + mm * 60 + ss)[fi]
        .astype(np.int64)
        .astype("timedelta64[s]")
    )
    mi = mon_idx[fi].astype(int)
    cand = _month_bases(ref_now.year)[mi] + secs
    limit = np.datetime64(ref_now + pd.Timedelta(days=31), "s")
    prev = _month_bases(ref_now.year - 1)[mi] + secs
    ts = np.where(cand > limit, prev, cand)

    host = _np_str(_f(m, "host"))[fi]
    app = _np_str(_f(m, "app"))[fi]
    pid_all = _np_str(_f(m, "pid"))
    pid = np.where((has_br & (pid_len > 0))[fi], pid_all[fi], None)
    msg = _np_str(_f(m, "msg"))[fi]
    msg_len = pc.binary_length(_f(m, "msg")).to_numpy(zero_copy_only=False)[fi]

    out = pd.DataFrame(
        {
            "priority": pd.array(pri_fi, dtype="Int32"),
            "facility": pd.array(pri_fi >> 3, dtype="Int32"),
            "severity": pd.array(pri_fi & 7, dtype="Int32"),
            "proto_version": pd.array([None] * len(fi), dtype="Int32"),
            "msg_ts": pd.Series(ts, index=fi).astype("datetime64[us]"),
            "host": host,
            "app": app,
            "pid": pid,
            "msgid": pd.Series([None] * len(fi), index=fi, dtype=object),
            "structured_data": pd.Series([None] * len(fi), index=fi, dtype=object),
            "has_bom": pd.array([None] * len(fi), dtype="boolean"),
            "message": msg,
            "msg_length": pd.array(msg_len, dtype="Int32"),
            "err_code": pd.Series([None] * len(fi), index=fi, dtype=object),
        },
        index=fi,
    )
    return out, slow


def _parse_sd_simple(sd: str):
    """SD elements for fast-path rows (shape pre-validated by the RE2
    pattern: no escapes, no stray brackets)."""
    out = []
    for sd_id, params in _SD_ELEM.findall(sd):
        out.append(
            {
                "sd_id": sd_id,
                "params": [
                    {"key": k, "val": v} for k, v in _SD_PARAM.findall(params)
                ],
            }
        )
    return out


def fast_rfc5424(s: pd.Series):
    """Returns (fast_frame | None, slow_mask ndarray)."""
    n = len(s)
    arr = pa.Array.from_pandas(s)
    # header byte accounting requires bytes == chars → ASCII rows only;
    # also keeps us clear of the 2048-byte arena bound.
    ascii_ok = pc.and_(
        pc.equal(pc.binary_length(arr), pc.utf8_length(arr)),
        pc.less(pc.binary_length(arr), 2000),
    ).to_numpy(zero_copy_only=False)
    m = pc.extract_regex(arr, FAST_5424_RE)
    ok = pc.is_valid(m).to_numpy(zero_copy_only=False) & ascii_ok
    if not ok.any():
        return None, np.ones(n, dtype=bool)

    pri = pc.cast(_f(m, "pri"), pa.int32()).to_numpy(zero_copy_only=False)
    want = pc.cast(_f(m, "frame"), pa.int64()).to_numpy(zero_copy_only=False)
    ln = lambda g: pc.utf8_length(_f(m, g)).to_numpy(zero_copy_only=False)  # noqa: E731
    ts_s = _np_str(_f(m, "ts"))
    sd_s = _np_str(_f(m, "sd"))
    sp_s = _np_str(_f(m, "sp"))
    body_s = _np_str(_f(m, "body"))

    # timestamp: '-' → null; else strict parse (calendar-invalid, e.g.
    # month 13, falls back to exact which emits invalid_timestamp)
    ts_ser = pd.Series(np.where(ok, ts_s, None), dtype=object)
    ts_isdash = ts_ser == "-"
    msg_ts_all = pd.to_datetime(
        ts_ser.where(~ts_isdash), errors="coerce", utc=True, format="ISO8601"
    ).dt.tz_convert(None).astype("datetime64[us]")
    # ns-overflow years fall back to the exact engine (which recovers them)
    ts_bad = ok & ~ts_isdash.to_numpy() & msg_ts_all.isna().to_numpy()

    viol = (pri > 191) | ts_bad
    fast = ok & ~viol
    slow = ~fast
    if not fast.any():
        return None, slow

    # bytes consumed after the frame prefix, through the SD section +
    # its trailing space: PRI + 'VERSION ' + 5 tokens + SD (+1 each)
    r_len = (
        ln("pri") + 2 + 2
        + ln("ts") + 1 + ln("host") + 1 + ln("app") + 1
        + ln("procid") + 1 + ln("msgid") + 1 + ln("sd") + 1
    )
    body_len = pc.binary_length(_f(m, "body")).to_numpy(zero_copy_only=False)
    has_sp = np.asarray(sp_s == " ")
    sd_dash = np.asarray(sd_s == "-")
    md = want - r_len

    # Content glued to the SD section without a space (e.g. "-.",
    # "[id]x") has scanner semantics the regex can't mirror → exact path.
    tail_junk = fast & ~has_sp & (body_len > 0)
    fast = fast & ~tail_junk

    # outcome classes (mirroring rfc5424.go:65-111 exactly):
    no_sp = fast & ~has_sp  # SD is the last byte of the message
    eof_valid = no_sp & sd_dash  # '-' at EOF → accepted (:168-173)
    eof_err = no_sp & ~sd_dash  # '[..]' at EOF → premature_eof (:341-343)
    w_sp = fast & has_sp
    early = w_sp & (body_len < 3)  # BOM Peek fails → accepted (:89-91)
    exact_len = w_sp & (body_len >= 3) & (md == body_len)  # normal path
    neg = w_sp & (body_len >= 3) & (md < 0)  # Go would panic; invalid_length
    short = w_sp & (body_len >= 3) & (md > body_len)  # premature_eof
    trunc = w_sp & (body_len >= 3) & (md >= 0) & (md < body_len)
    # truncation (message = prefix of body) is rare → exact path
    fast = fast & ~trunc
    slow = ~fast
    if not fast.any():
        return None, slow

    fi = np.where(fast)[0]
    pri_fi = pri[fi].astype(np.int32)

    def _nil(name):
        v = _np_str(_f(m, name))[fi]
        return np.where(v == "-", None, v)

    err = np.full(n, None, dtype=object)
    err[eof_err] = ERR_PREMATURE_EOF
    err[neg] = ERR_INVALID_LENGTH
    err[short] = ERR_PREMATURE_EOF
    err_f = err[fi]
    is_err = pd.notna(err_f)

    sd_objs = np.full(n, None, dtype=object)
    for i in np.where(fast & ~sd_dash & (err == None))[0]:  # noqa: E711
        sd_objs[i] = _parse_sd_simple(sd_s[i])

    message = np.full(n, None, dtype=object)
    msg_len_o = np.full(n, None, dtype=object)
    message[eof_valid | early] = ""
    msg_len_o[eof_valid | early] = 0
    ok_full = exact_len
    message[ok_full] = body_s[ok_full]
    mdv = md.astype(object)
    msg_len_o[ok_full] = mdv[ok_full]

    out = pd.DataFrame(
        {
            "priority": pd.array(pri_fi, dtype="Int32"),
            "facility": pd.array(pri_fi >> 3, dtype="Int32"),
            "severity": pd.array(pri_fi & 7, dtype="Int32"),
            "proto_version": pd.array(np.ones(len(fi), dtype=np.int32), dtype="Int32"),
            "msg_ts": pd.Series(msg_ts_all.to_numpy()[fi], index=fi),
            "host": _nil("host"),
            "app": _nil("app"),
            "pid": _nil("procid"),
            "msgid": _nil("msgid"),
            "structured_data": pd.Series(sd_objs[fi], index=fi, dtype=object),
            # ASCII fast path can never carry a BOM → False, except rows
            # erroring inside the SD stage (eof_err) which the exact
            # parser leaves NULL (alive mask is taken after SD errors).
            "has_bom": pd.array(
                np.where(eof_err[fi], None, False), dtype="boolean"
            ),
            "message": pd.Series(message[fi], index=fi, dtype=object),
            "msg_length": pd.array(
                pd.to_numeric(pd.Series(msg_len_o[fi])), dtype="Int32"
            ),
            "err_code": pd.Series(err_f, index=fi, dtype=object),
        },
        index=fi,
    )
    return out, slow
