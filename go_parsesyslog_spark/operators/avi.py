"""Pure-python MJPEG-in-AVI video codec (decode + a minimal writer for
deterministic test payloads) — REAL video decode with no codec library.

AVI is a RIFF container (the same chunk grammar decode_wav already
walks); Motion-JPEG stores one baseline JPEG per frame in ``00dc`` /
``00db`` chunks inside the ``movi`` LIST.  Composing the RIFF walker
with the pure-numpy JPEG decoder (operators/jpeg.py) gives an honest
end-to-end video path: container parse → frame extraction → per-frame
pixel decode → temporal features.  Only inter-frame-compressed codecs
(h264/h265 in mp4) still genuinely require ffmpeg and remain stubbed.

Scope: uncompressed-index-free AVI, one video stream, MJPEG frames.
Bounded like the image decoders: frame count and per-frame pixels are
capped before any work (untrusted headers).
"""

from __future__ import annotations

import struct

import numpy as np

AVI_MAX_FRAMES = 512  # feature-grade bound (per-frame JPEG decode is real work)


def _walk_riff(buf: bytes, start: int, end: int):
    """Yield (fourcc, list_type_or_None, body_start, body_end) for each
    chunk in [start, end)."""
    pos = start
    while pos + 8 <= end:
        cc = buf[pos:pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        body_start = pos + 8
        body_end = min(body_start + size, end)
        if cc in (b"RIFF", b"LIST"):
            ltype = buf[body_start:body_start + 4]
            yield cc, ltype, body_start + 4, body_end
        else:
            yield cc, None, body_start, body_end
        pos = body_start + size + (size % 2)  # chunks are word-aligned


def parse_avi(payload: bytes) -> dict:
    """AVI header + MJPEG frame payloads.  Returns dict with
    ``us_per_frame``, ``total_frames`` (header claims), ``width``,
    ``height``, ``frames``: the list of raw JPEG byte strings found
    in the movi LIST (truncated at AVI_MAX_FRAMES — long-but-valid
    videos degrade to a prefix feature extraction, never a per-row
    error), and ``truncated``: whether the cap was hit."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    out = {"us_per_frame": 0, "total_frames": 0, "width": 0, "height": 0,
           "frames": [], "truncated": False}

    def walk(start: int, end: int) -> None:
        for cc, ltype, bs, be in _walk_riff(payload, start, end):
            if cc == b"LIST" and ltype in (b"hdrl", b"strl", b"movi"):
                walk(bs, be)
            elif cc == b"avih" and be - bs >= 32:
                (uspf, _maxbps, _pad, _flags, total, _init, _streams,
                 _bufsz) = struct.unpack("<8I", payload[bs:bs + 32])
                out["us_per_frame"] = uspf
                out["total_frames"] = total
                w, h = struct.unpack("<2I", payload[bs + 32:bs + 40]) \
                    if be - bs >= 40 else (0, 0)
                out["width"], out["height"] = w, h
            elif cc in (b"00dc", b"00db"):
                if len(out["frames"]) >= AVI_MAX_FRAMES:
                    out["truncated"] = True
                    continue
                out["frames"].append(payload[bs:be])

    walk(12, len(payload))
    if not out["frames"]:
        raise ValueError("no MJPEG frames (00dc/00db) in AVI movi list")
    return out


def decode_avi_frames(
    payload: bytes, sample_every: int = 1, meta: dict | None = None
) -> list[np.ndarray]:
    """Decode every ``sample_every``-th MJPEG frame to (h, w, 3) RGB.
    Pass a pre-parsed ``meta`` (from parse_avi) to skip re-walking the
    container."""
    from go_parsesyslog_spark.operators.jpeg import decode_jpeg

    if meta is None:
        meta = parse_avi(payload)
    return [decode_jpeg(f) for f in meta["frames"][::max(1, sample_every)]]


def video_features(payload: bytes, sample_every: int = 2) -> list[float]:
    """12-dim video feature vector from an MJPEG AVI: container metadata
    (frame count, fps, dims), per-frame luma statistics over sampled
    frames, and the mean absolute luma delta between consecutive sampled
    frames (the motion proxy a frame-dedup/quality pipeline keys on)."""
    meta = parse_avi(payload)
    frames = decode_avi_frames(payload, sample_every, meta=meta)
    lumas = [
        0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        for f in frames
    ]
    means = np.array([p.mean() for p in lumas]) / 255.0
    stds = np.array([p.std() for p in lumas]) / 255.0
    if len(lumas) > 1:
        deltas = np.array([
            np.abs(lumas[i + 1] - lumas[i]).mean()
            for i in range(len(lumas) - 1)
        ]) / 255.0
        motion = float(deltas.mean())
    else:
        motion = 0.0
    fps = 1e6 / meta["us_per_frame"] if meta["us_per_frame"] else 0.0
    h, w = frames[0].shape[:2]
    return [
        float(len(meta["frames"])), float(fps), float(w), float(h),
        float(means.mean()), float(means.std()), float(stds.mean()),
        float(means.min()), float(means.max()), motion,
        float(len(frames)), float(meta["total_frames"]),
    ]


MP4_MAX_BOXES = 4096  # hostile-payload bound on box traversal


def parse_mp4_meta(payload: bytes) -> dict:
    """ISO-BMFF (mp4/mov) METADATA parse — box walk only, no decode.

    Pixel decode of h264/h265 genuinely needs ffmpeg and stays stubbed,
    but the container metadata a media pipeline routes on — duration,
    timescale, track count, video dimensions, sample-entry fourcc —
    lives in plain big-endian boxes (ftyp/moov/mvhd/trak/tkhd/stsd) and
    parses codec-free.  Returns {brand, duration_ms, n_tracks, width,
    height, codecs:[fourcc,...]}."""
    n = len(payload)
    if n < 8:
        raise ValueError("not an ISO-BMFF payload (too short)")
    out = {"brand": None, "duration_ms": 0, "n_tracks": 0,
           "width": 0, "height": 0, "codecs": []}
    boxes_seen = 0

    def walk(start: int, end: int) -> None:
        nonlocal boxes_seen
        pos = start
        while pos + 8 <= end:
            boxes_seen += 1
            if boxes_seen > MP4_MAX_BOXES:
                raise ValueError("mp4 box bomb: too many boxes")
            (size,) = struct.unpack(">I", payload[pos:pos + 4])
            btype = payload[pos + 4:pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                if pos + 16 > end:
                    break
                (size,) = struct.unpack(">Q", payload[pos + 8:pos + 16])
                body = pos + 16
            elif size == 0:  # to end of enclosing box
                size = end - pos
            if size < 8 or pos + size > end:
                raise ValueError("corrupt mp4 box size")
            if btype == b"ftyp":
                out["brand"] = payload[body:body + 4].decode(
                    "ascii", errors="replace")
            elif btype in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                walk(body, pos + size)
            elif btype == b"mvhd":
                ver = payload[body]
                if ver == 1:
                    ts, dur = struct.unpack(
                        ">IQ", payload[body + 20:body + 32])
                else:
                    ts, dur = struct.unpack(
                        ">II", payload[body + 12:body + 20])
                if ts:
                    out["duration_ms"] = int(dur * 1000 // ts)
            elif btype == b"tkhd":
                out["n_tracks"] += 1
                ver = payload[body]
                # width/height sit at box-start+84 (v0) / +96 (v1);
                # `body` already points past the 8-byte box header, so
                # relative to the version byte that is 76 / 88
                # (4 ver+flags, 20/32 times+id+dur, 16 layer block,
                # 36 matrix).
                off = body + (88 if ver == 1 else 76)
                if off + 8 <= pos + size:
                    w, h = struct.unpack(">II", payload[off:off + 8])
                    # 16.16 fixed point; the video track has nonzero dims
                    if w and h:
                        out["width"] = w >> 16
                        out["height"] = h >> 16
            elif btype == b"stsd":
                cnt_off = body + 4
                if cnt_off + 4 <= pos + size:
                    entry = cnt_off + 4
                    if entry + 8 <= pos + size:
                        fourcc = payload[entry + 4:entry + 8].decode(
                            "ascii", errors="replace")
                        out["codecs"].append(fourcc)
            pos += size

    walk(0, n)
    if out["brand"] is None and out["n_tracks"] == 0:
        raise ValueError("no ISO-BMFF boxes found (not an mp4?)")
    return out


def encode_avi(
    frames: list[np.ndarray], fps: int = 10, quality_scale: float = 0.04
) -> bytes:
    """Minimal MJPEG AVI writer for deterministic round-trip fixtures:
    RIFF(AVI ) → LIST hdrl(avih + strl(strh, strf)) → LIST movi with one
    00dc JPEG chunk per frame."""
    from go_parsesyslog_spark.operators.jpeg import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality_scale=quality_scale) for f in frames]

    def chunk(cc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cc + struct.pack("<I", len(body)) + body + pad

    def list_chunk(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    uspf = int(1e6 / fps)
    avih = struct.pack(
        "<14I", uspf, 0, 0, 0x10, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh = (b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, 0, 0
    ))
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = list_chunk(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
