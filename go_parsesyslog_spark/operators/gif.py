"""Pure-numpy GIF87a/89a decoder + a test-grade encoder.

Completes the lossless-image family next to BMP (raw) and PNG
(DEFLATE): GIF's LZW is the third compression scheme decoded natively
in this repo, with palette indirection, interlacing, and multi-frame
animation walking — no codec library involved.  Like jpeg.py/avi.py,
the goal is feature-grade decode for curation pipelines (dims, frame
count, palette stats, first-frame pixels), not a player.

Format facts used below (all from the public GIF89a specification):
logical screen descriptor with optional global color table; block
stream of extensions (0x21 — the 0xF9 graphic-control extension
carries per-frame delay + transparency), image descriptors (0x2C —
optional local color table, optional interlace, LZW-compressed
indices in 255-byte sub-blocks), trailer 0x3B.  LZW codes are packed
LSB-first with variable width starting at min_code_size+1, CLEAR =
1<<mcs resets the table, EOI = CLEAR+1 ends the stream, and width
grows when the table fills 2^width (capped at 12 bits).

Hostile-input discipline (the ADVICE r3/r4 pattern): every dimension
and the LZW OUTPUT size are capped before allocation; truncated
streams, bad codes, and oversized frames raise ValueError — callers
(decode_features) turn that into a per-row error column, never a
failed job.
"""

from __future__ import annotations

import numpy as np

GIF_MAX_PIXELS = 16 << 20  # 16 MP first frame ≈ 48 MB RGB
GIF_MAX_FRAMES = 512       # matches avi.AVI_MAX_FRAMES intent


def _u16(b: bytes, off: int) -> int:
    return b[off] | (b[off + 1] << 8)


def _sub_blocks(payload: bytes, off: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``off``; return
    (data, offset past the 0x00 terminator)."""
    out = bytearray()
    n = len(payload)
    while True:
        if off >= n:
            raise ValueError("truncated GIF sub-block stream")
        size = payload[off]
        off += 1
        if size == 0:
            return bytes(out), off
        if off + size > n:
            raise ValueError("truncated GIF sub-block")
        out += payload[off:off + size]
        off += size


def _lzw_decode(data: bytes, mcs: int, expect: int) -> bytes:
    """GIF LZW → index bytes.  ``expect`` bounds the output (pixel
    count): one byte past it is an error, so hostile streams cannot
    balloon memory."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"bad GIF LZW min code size {mcs}")
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []
    code_size = mcs + 1
    prev = -1
    buf = 0
    nbits = 0

    def reset() -> None:
        nonlocal table, code_size, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        code_size = mcs + 1
        prev = -1

    reset()
    for byte in data:
        buf |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = buf & ((1 << code_size) - 1)
            buf >>= code_size
            nbits -= code_size
            if code == clear:
                reset()
                continue
            if code == eoi:
                return bytes(out)
            if prev < 0:
                if code >= len(table):
                    raise ValueError("bad first GIF LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(table[prev] + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = table[prev] + table[prev][:1]
                table.append(entry)
            else:
                raise ValueError("GIF LZW code out of range")
            out += entry
            if len(out) > expect:
                raise ValueError("GIF LZW output exceeds pixel count")
            prev = code
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    raise ValueError("GIF LZW stream ended without EOI")


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """GIF 4-pass interlace → sequential row order."""
    h = idx.shape[0]
    order = np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])
    out = np.empty_like(idx)
    out[order] = idx
    return out


def decode_gif(payload: bytes) -> tuple[np.ndarray, dict]:
    """Decode a GIF: first frame as (h, w, 3) RGB uint8 (composited on
    the logical screen, unhandled pixels = background/0) plus metadata:
    ``{"n_frames", "total_delay_cs", "gct_size", "interlaced",
    "has_transparency", "screen_w", "screen_h"}``.  Frames past the
    first are WALKED (counted + delays summed), not pixel-decoded —
    feature-grade cost at any animation length."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh = _u16(payload, 6), _u16(payload, 8)
    flags = payload[10]
    if sw <= 0 or sh <= 0 or sw * sh > GIF_MAX_PIXELS:
        raise ValueError(f"GIF screen {sw}x{sh} out of bounds")
    off = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if off + 3 * n > len(payload):
            raise ValueError("truncated GIF global color table")
        gct = np.frombuffer(payload, np.uint8, 3 * n, off).reshape(n, 3)
        off += 3 * n

    meta = {
        "n_frames": 0, "total_delay_cs": 0,
        "gct_size": 0 if gct is None else len(gct),
        "interlaced": False, "has_transparency": False,
        "screen_w": sw, "screen_h": sh,
    }
    first: np.ndarray | None = None
    delay_pending = 0
    while True:
        if off >= len(payload):
            raise ValueError("GIF stream ended without trailer")
        block = payload[off]
        off += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if off >= len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[off]
            data, off = _sub_blocks(payload, off + 1)
            if label == 0xF9 and len(data) >= 4:
                delay_pending = data[1] | (data[2] << 8)
                if data[0] & 0x01:
                    meta["has_transparency"] = True
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # ---- image descriptor ----
        if off + 9 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        left, top = _u16(payload, off), _u16(payload, off + 2)
        w, h = _u16(payload, off + 4), _u16(payload, off + 6)
        iflags = payload[off + 8]
        off += 9
        if w <= 0 or h <= 0 or w * h > GIF_MAX_PIXELS:
            raise ValueError(f"GIF frame {w}x{h} out of bounds")
        lct = None
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            if off + 3 * n > len(payload):
                raise ValueError("truncated GIF local color table")
            lct = np.frombuffer(payload, np.uint8, 3 * n, off).reshape(n, 3)
            off += 3 * n
        if off >= len(payload):
            raise ValueError("truncated GIF image data")
        mcs = payload[off]
        data, off = _sub_blocks(payload, off + 1)
        meta["n_frames"] += 1
        meta["total_delay_cs"] += delay_pending
        delay_pending = 0
        if meta["n_frames"] > GIF_MAX_FRAMES:
            raise ValueError(f"GIF exceeds {GIF_MAX_FRAMES} frames")
        if first is not None:
            continue  # later frames: walked, not pixel-decoded
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("GIF frame has no color table")
        idx = np.frombuffer(
            _lzw_decode(data, mcs, w * h), np.uint8
        )
        if idx.size != w * h:
            raise ValueError("GIF frame pixel count mismatch")
        idx = idx.reshape(h, w)
        if iflags & 0x40:
            meta["interlaced"] = True
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("GIF index outside color table")
        frame = np.zeros((sh, sw, 3), np.uint8)
        y1, x1 = min(top + h, sh), min(left + w, sw)
        frame[top:y1, left:x1] = palette[idx][: y1 - top, : x1 - left]
        first = frame
    if first is None:
        raise ValueError("GIF contains no image")
    return first, meta


# ------------------------------------------------------------------ synth


def synth_gif(
    width: int = 16,
    height: int = 12,
    seed: int = 0,
    n_frames: int = 1,
    interlace: bool = False,
    delay_cs: int = 4,
) -> bytes:
    """Deterministic test GIF: 16-color global palette, literal-code
    LZW (a CLEAR before each 2^mcs−2 literals keeps the code width
    fixed — the classic 'uncompressed GIF' trick, bit-valid for any
    decoder), optional interlace flag on frame 0, optional extra
    frames with GCE delays."""
    mcs = 4
    ncol = 1 << mcs
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x80 | (mcs - 1), 0, 0])  # GCT flag + size, bg, aspect
    out += palette.tobytes()

    def lzw_literal(indices: np.ndarray) -> bytes:
        clear, eoi = 1 << mcs, (1 << mcs) + 1
        width_bits = mcs + 1
        codes: list[int] = [clear]
        run = 0
        for v in indices.ravel().tolist():
            if run == (1 << mcs) - 2:
                codes.append(clear)
                run = 0
            codes.append(int(v))
            run += 1
        codes.append(eoi)
        buf = 0
        nbits = 0
        raw = bytearray()
        for c in codes:
            buf |= c << nbits
            nbits += width_bits
            while nbits >= 8:
                raw.append(buf & 0xFF)
                buf >>= 8
                nbits -= 8
        if nbits:
            raw.append(buf & 0xFF)
        blocks = bytearray()
        for i in range(0, len(raw), 255):
            chunk = raw[i:i + 255]
            blocks += bytes([len(chunk)]) + chunk
        blocks += b"\x00"
        return bytes(blocks)

    for f in range(n_frames):
        if n_frames > 1:
            out += bytes([0x21, 0xF9, 4, 0])
            out += delay_cs.to_bytes(2, "little") + b"\x00\x00"
        idx = ((np.add.outer(np.arange(height), np.arange(width)) + f)
               % ncol).astype(np.uint8)
        iflags = 0x40 if (interlace and f == 0) else 0
        out += b"\x2c" + bytes(4)
        out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
        out += bytes([iflags, mcs])
        if iflags:
            order = np.concatenate([
                np.arange(0, height, 8), np.arange(4, height, 8),
                np.arange(2, height, 4), np.arange(1, height, 2),
            ])
            idx = idx[order]
        out += lzw_literal(idx)
    out += b"\x3b"
    return bytes(out)
