"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, decoded + feature-extracted inside Arrow-batched
``mapInPandas`` tasks.

REAL decode kernels (pure numpy, no codec libraries needed):

* **WAV / RIFF PCM audio** — header parse (channels, rate, bit depth),
  PCM → float samples, features: duration, RMS, peak, zero-crossing
  rate, dominant frequency + spectral centroid via numpy FFT.
* **BMP images (uncompressed 24/32-bit)** — header parse, bottom-up
  BGR row decode (4-byte row padding), luma conversion, 8×8
  nearest-neighbor downsample, features: dimensions + luma stats +
  coarse histogram.
* **PNG (8-bit, non-interlaced)** — stdlib-zlib IDAT inflate, all five
  scanline unfilters (this file).
* **baseline JPEG** — Huffman + dequant + IDCT in numpy, 4:2:0
  upsampling, restart markers (operators/jpeg.py).
* **MJPEG-AVI video** — RIFF container walk + per-frame JPEG decode +
  temporal luma/motion features (operators/avi.py).

Only inter-frame-compressed video (mp4/h264) genuinely requires a
codec library absent from this container (ffmpeg) and stays honestly
stubbed: with ``fake=False`` it surfaces a per-row error (never throws
the job); ``fake=True`` (default) substitutes a deterministic
sha256-derived feature so the distributed plumbing is exercised
end-to-end either way.

The Spark-side machinery — schema, partition-friendly batch iteration,
frame-sampling fan-out — is real and tested for all kinds.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "feature array<float>, ok boolean, err string"
)


# ---------------------------------------------------------------------------
# synthesizers (deterministic test media, also used by make_fake_media)
# ---------------------------------------------------------------------------

def synth_wav(freq_hz: float = 440.0, seconds: float = 0.25,
              rate: int = 8000, amplitude: float = 0.5) -> bytes:
    """Minimal mono 16-bit PCM WAV of a sine tone."""
    t = np.arange(int(rate * seconds)) / rate
    pcm = (amplitude * 32767 * np.sin(2 * np.pi * freq_hz * t)).astype("<i2")
    data = pcm.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def synth_bmp(width: int = 16, height: int = 12, seed: int = 0) -> bytes:
    """Minimal uncompressed 24-bit BMP (bottom-up, 4-byte row padding)
    with a deterministic gradient + seed-noise image."""
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 255, width, dtype=np.float64)[None, :]
    y = np.linspace(0, 255, height, dtype=np.float64)[:, None]
    base = (x + y) / 2
    img = np.stack(
        [base, np.flipud(base), rng.integers(0, 256, (height, width))],
        axis=2,
    ).astype(np.uint8)  # (h, w, RGB)
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    rows = []
    for r in range(height - 1, -1, -1):  # bottom-up
        bgr = img[r, :, ::-1].tobytes()
        rows.append(bgr + b"\x00" * pad)
    pixel_data = b"".join(rows)
    file_hdr = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_data), 0, 0, 54)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0,
        len(pixel_data), 2835, 2835, 0, 0,
    )
    return file_hdr + info_hdr + pixel_data


# ---------------------------------------------------------------------------
# decoders (pure numpy)
# ---------------------------------------------------------------------------

def decode_wav(payload: bytes) -> np.ndarray:
    """RIFF/PCM WAV → (samples float64 in [-1,1] mono-mixed, rate)."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16, 32):
        raise ValueError(f"unsupported WAV: fmt={audio_fmt} bits={bits}")
    # a structurally valid header may still declare rate=0 / 0 channels —
    # without this check the duration/frequency math divides by zero,
    # which is NOT in the per-row (ok, err) catch list and would kill
    # the whole job on one corrupt row (ADVICE r2)
    if rate <= 0 or n_ch < 1:
        raise ValueError(f"corrupt WAV header: rate={rate} channels={n_ch}")
    if bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128) / 128
    elif bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768
    else:
        x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2**31
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, rate


AUDIO_FEATURE_MAX_SAMPLES = 1 << 22  # ~95 s @ 44.1 kHz


def audio_features(payload: bytes) -> list[float]:
    """8-dim audio feature vector from a PCM WAV payload.

    The spectral features analyze at most ``AUDIO_FEATURE_MAX_SAMPLES``
    samples (~95 s at 44.1 kHz): an hour-long capture would otherwise
    allocate GB-scale FFT transients inside the UDF (the
    memory-stall regime documented in dedup.py) — and 4M samples
    already pin dominant frequency/centroid for feature purposes.
    The DURATION feature still reflects the full payload."""
    x, rate = decode_wav(payload)
    full_n = len(x)
    x = x[:AUDIO_FEATURE_MAX_SAMPLES]
    n = len(x)
    if n == 0:
        return [0.0] * 8
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.max(np.abs(x)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
    spec = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    dom = float(freqs[int(np.argmax(spec[1:])) + 1]) if len(spec) > 1 else 0.0
    centroid = float((freqs * spec).sum() / max(spec.sum(), 1e-12))
    return [full_n / rate, float(rate), rms, peak, zcr, dom, centroid,
            float(np.mean(x))]


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP → (h, w, 3) RGB uint8."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack("<I", payload[10:14])
    hdr_size, width, height = struct.unpack("<Iii", payload[14:26])
    planes, bpp, compression = struct.unpack("<HHI", payload[26:34])
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} comp={compression}")
    bottom_up = height > 0
    height = abs(height)
    ch = bpp // 8
    row_bytes = (width * ch + 3) & ~3
    px = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * height, offset=data_off
    ).reshape(height, row_bytes)
    img = px[:, : width * ch].reshape(height, width, ch)[:, :, :3][:, :, ::-1]
    if bottom_up:
        img = img[::-1]
    return np.ascontiguousarray(img)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
PNG_MAX_PIXELS = 64 << 20  # 64 MP ≈ 192 MB RGB — far above any feature need


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """Pure numpy+zlib PNG decode → (h, w, 3) RGB uint8.

    Supports the common web subset: 8-bit depth, color types 0 (gray),
    2 (RGB), 4 (gray+alpha), 6 (RGBA), no interlace — zlib-inflated
    IDAT scanlines with all five filter types undone (None/Sub/Up/
    Average/Paeth).  Sub uses a cumsum along the pixel axis; Average/
    Paeth are sequential by definition and run a per-pixel loop on the
    channel vector (fine for feature extraction; this is not a codec
    library).  Alpha is dropped, gray replicated to RGB."""
    import zlib

    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data[:13])
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, ctype_i, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype_i)
    if depth != 8 or channels is None or comp != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={depth} color={ctype_i} "
            f"interlace={interlace}"
        )
    # header fields are UNTRUSTED: a hostile/corrupt IHDR could declare
    # dimensions that allocate GBs inside the UDF (the bounded-transient
    # policy elsewhere in this package), so cap the pixel count and
    # inflate with an explicit output bound instead of an open-ended
    # zlib.decompress
    if w <= 0 or h <= 0 or w * h > PNG_MAX_PIXELS:
        raise ValueError(
            f"PNG dimensions {w}x{h} out of bounds (max {PNG_MAX_PIXELS} px)"
        )
    stride = w * channels
    expected = h * (stride + 1)
    try:
        raw = zlib.decompressobj().decompress(b"".join(idat), expected)
    except zlib.error as e:
        # per-row (ok, err) contract: corrupt IDAT must be a row error,
        # not a job-killing exception type outside the catch list
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from None
    if len(raw) < expected:
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = raw[y * (stride + 1): (y + 1) * (stride + 1)]
        ftype, row = line[0], np.frombuffer(line[1:], dtype=np.uint8)
        if ftype == 0:
            cur = row.copy()
        elif ftype == 1:  # Sub: cumulative sum along the pixel axis
            px = row.reshape(w, channels).astype(np.int64)
            cur = (np.cumsum(px, axis=0) % 256).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            cur = row + prev
        elif ftype in (3, 4):  # Average / Paeth: sequential by spec
            cur = np.zeros(stride, dtype=np.uint8)
            for j in range(stride):
                a = int(cur[j - channels]) if j >= channels else 0
                b = int(prev[j])
                if ftype == 3:
                    cur[j] = (int(row[j]) + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(prev[j - channels]) if j >= channels else 0
                    cur[j] = (int(row[j]) + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    img = out.reshape(h, w, channels)
    if channels == 1:
        img = np.repeat(img, 3, axis=2)
    elif channels == 2:
        img = np.repeat(img[:, :, :1], 3, axis=2)
    else:
        img = img[:, :, :3]
    return np.ascontiguousarray(img)


def synth_png(width: int = 16, height: int = 12, seed: int = 0,
              filters: list[int] | None = None) -> bytes:
    """Deterministic RGB PNG with a chosen filter type per scanline
    (default cycles 0..4) — exercises every unfilter path in
    decode_png."""
    import zlib

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (height, width, 3), dtype=np.uint8)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        import binascii

        crc = binascii.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(
            ">I", crc
        )

    stride = width * 3
    lines = []
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        cur = img[y].reshape(-1).astype(np.int64)
        f = (filters[y % len(filters)] if filters else y % 5)
        if f == 0:
            enc = cur
        elif f == 1:
            left = np.concatenate(([0, 0, 0], cur[:-3]))
            enc = (cur - left) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        else:  # 3 / 4
            enc = np.zeros(stride, dtype=np.int64)
            for j in range(stride):
                a = int(cur[j - 3]) if j >= 3 else 0
                b = int(prev[j])
                if f == 3:
                    enc[j] = (int(cur[j]) - ((a + b) >> 1)) % 256
                else:
                    c = int(prev[j - 3]) if j >= 3 else 0
                    enc[j] = (int(cur[j]) - _paeth(a, b, c)) % 256
        lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def image_features(payload: bytes) -> list[float]:
    """16-dim image feature vector: dims, luma stats, 8-bin histogram,
    plus a 2×2 nearest-neighbor thumbnail of the luma plane (the
    resize kernel, exercised for real).  Dispatches on magic bytes:
    PNG (pure numpy+zlib), JPEG (pure numpy baseline codec in
    operators/jpeg.py), GIF (pure numpy LZW in operators/gif.py —
    first frame) or BMP."""
    if payload[:8] == _PNG_SIG:
        img = decode_png(payload)
    elif payload[:2] == b"\xff\xd8":
        from go_parsesyslog_spark.operators.jpeg import decode_jpeg

        img = decode_jpeg(payload)
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        from go_parsesyslog_spark.operators.gif import decode_gif

        img, _ = decode_gif(payload)
    else:
        img = decode_bmp(payload)
    h, w = img.shape[:2]
    luma = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
            + 0.114 * img[:, :, 2])
    hist, _ = np.histogram(luma, bins=8, range=(0, 256))
    hist = hist / max(luma.size, 1)
    thumb = resize_nearest(luma, 2, 2).ravel() / 255.0
    return ([float(w), float(h), float(luma.mean()) / 255.0,
             float(luma.std()) / 255.0]
            + hist.astype(float).tolist() + thumb.astype(float).tolist())


def resize_nearest(plane: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of a 2-D plane (the real resize kernel
    used by image_features; pure index arithmetic)."""
    h, w = plane.shape
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return plane[yi[:, None], xi[None, :]]


def _fake_feature(payload: bytes) -> list[float]:
    digest = hashlib.sha256(payload).digest()
    feat = np.frombuffer(digest[:32], dtype=np.uint8).reshape(8, 4)
    return (feat.sum(axis=1).astype(np.float32) / 255.0).tolist()


def decode_features(payload: bytes, kind: str, mime: str,
                    fake: bool) -> list[float]:
    """The codec boundary: real numpy decoders for WAV, BMP, PNG
    (8-bit, non-interlaced — zlib is stdlib) and baseline JPEG
    (Huffman + IDCT in numpy, operators/jpeg.py) — no codec library
    needed for any of them.  Only video (mp4/h264) genuinely requires
    an absent codec library (ffmpeg): it either raises (fake=False →
    per-row err) or yields the deterministic sha256 fake."""
    if mime in ("audio/wav", "audio/x-wav"):
        return audio_features(payload)
    if mime in ("image/bmp", "image/x-ms-bmp", "image/png",
                "image/jpeg", "image/jpg", "image/gif"):
        return image_features(payload)
    if mime in ("video/avi", "video/x-msvideo") or (
        kind == "video" and payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
    ):
        from go_parsesyslog_spark.operators.avi import video_features

        return video_features(payload)
    if not fake:
        raise NotImplementedError(
            f"decoding {mime} requires codec libraries not present in "
            "this environment (ffmpeg); WAV, BMP, PNG, baseline JPEG "
            "and MJPEG-AVI video decode natively"
        )
    return _fake_feature(payload)


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table: REAL synthesized WAV tones, BMP
    gradients, baseline JPEGs and (animated) GIFs plus opaque video
    bytes (plumbing + real-decoder tests)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "audio":
            payload = synth_wav(freq_hz=220.0 + 20 * (i % 10),
                                seconds=0.05 + 0.01 * (i % 5))
            mime, w, h, dur = "audio/wav", None, None, 50 + 10 * (i % 5)
        elif kind == "image" and i % 6 == 0:
            from go_parsesyslog_spark.operators.jpeg import encode_jpeg

            w, h = 16 + i % 16, 12 + i % 8
            img = np.random.default_rng(i).integers(
                0, 256, (h, w, 3), dtype=np.uint8
            )
            payload = encode_jpeg(img)
            mime, dur = "image/jpeg", None
        elif kind == "image" and i % 12 == 3:
            from go_parsesyslog_spark.operators.gif import synth_gif

            w, h = 16 + i % 16, 12 + i % 8
            payload = synth_gif(w, h, seed=i, n_frames=1 + i % 3)
            mime, dur = "image/gif", None
        elif kind == "image":
            w, h = 16 + i % 16, 12 + i % 8
            payload = synth_bmp(w, h, seed=i)
            mime, dur = "image/bmp", None
        elif i % 6 == 2:  # video: real MJPEG-AVI for a third of rows
            from go_parsesyslog_spark.operators.avi import encode_avi

            frng = np.random.default_rng(i)
            w, h, n_frames = 16, 12, 3 + i % 3
            payload = encode_avi(
                [frng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                 for _ in range(n_frames)],
                fps=5 + i % 5,
            )
            mime, dur = "video/x-msvideo", (3 + i % 3) * 200
        else:
            payload = rng.integers(0, 256, 128 + (i % 64),
                                   dtype=np.uint8).tobytes()
            mime, w, h, dur = "video/mp4", 64, 48, 1000 + i
        rows.append((i, kind, mime, bytearray(payload), w, h, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(
    df: DataFrame, fake: bool = True, batch_note: str = "mapInPandas"
) -> DataFrame:
    """Decode/feature-extract media payloads via mapInPandas.

    mapInPandas (not a scalar UDF) because media work is
    memory-irregular: the iterator form lets one task process many
    small Arrow batches without materializing the whole partition.
    Per-row failures land in (ok, err) — a corrupt payload can never
    kill the job.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks, errs, hashes = [], [], [], []
            for payload, kind, mime in zip(
                pdf["payload"], pdf["kind"], pdf["mime"]
            ):
                raw = bytes(payload) if payload is not None else b""
                hashes.append(hashlib.sha256(raw).hexdigest())
                try:
                    feats.append(decode_features(raw, kind, mime, fake))
                    oks.append(True)
                    errs.append(None)
                except (NotImplementedError, ValueError, struct.error,
                        ZeroDivisionError, zlib.error, MemoryError,
                        IndexError) as e:
                    feats.append(None)
                    oks.append(False)
                    errs.append(str(e)[:120])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "sha256": hashes,
                    "feature": feats,
                    "ok": oks,
                    "err": errs,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def sample_video_frames(
    df: DataFrame, every_ms: int = 500, fake: bool = True
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (the mp4 frame decode itself needs ffmpeg — stub/fake).
    Shows the explode-based fan-out shape a real frame pipeline uses."""
    frames = (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
    )
    return extract_features(
        frames.select(
            (F.col("media_id") * 100000 + F.col("frame_ts_ms")).alias("media_id"),
            F.lit("image").alias("kind"),
            F.col("mime"),
            F.col("payload"),
            F.col("width"),
            F.col("height"),
            F.col("duration_ms"),
        ),
        fake=fake,
    )
