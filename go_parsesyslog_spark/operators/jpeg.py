"""Pure-numpy baseline JPEG codec (decode + a minimal encoder for
deterministic test payloads) — no codec library needed.

Scope (the "common web subset" spirit of the PNG path in
multimodal.py): baseline sequential DCT (SOF0), 8-bit samples, Huffman
entropy coding, grayscale or YCbCr with arbitrary sampling factors
(4:4:4 / 4:2:2 / 4:2:0 upsampling via nearest neighbor), restart
markers (DRI/RSTn), 0xFF00 byte stuffing.  Progressive (SOF2),
arithmetic coding and 12-bit are rejected with ValueError — per-row
(ok, err) catchable, never job-killing.

The encoder writes 4:4:4 (or grayscale) baseline JPEG with the
standard Annex-K quantization and Huffman tables (ITU-T T.81 — public
spec constants), optionally scaled to near-lossless for round-trip
tests.  Decoder correctness is pinned by
tests/test_training_ops.py::test_jpeg_decode_roundtrip: encode a known
pixel array at near-lossless quality, decode, compare per-pixel.

Everything is bounded: the pixel count is capped before any allocation
(untrusted headers — same policy as decode_png), and per-block work is
8×8 numpy matrices.  The bit-level Huffman loop is plain Python — fine
for feature extraction on capped images; this is not a codec library.
"""

from __future__ import annotations

import struct

import numpy as np

# Unlike PNG (vectorized unfilters — memory is the binding resource),
# the JPEG entropy pass is per-symbol Python, so the cap bounds TIME as
# well as memory.  With the 16-bit LUT Huffman + batched IDCT + banded
# color transform the decoder sustains ~0.9 Mpx/s on photographic
# content (~0.3 worst-case noise): 8 MP ≈ 9-27 s per row — the
# feature-grade ceiling.  Deployments decoding larger media should
# mount a real codec library and bypass this decoder.
JPEG_MAX_PIXELS = 8 << 20  # 8 MP

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------

# zigzag scan order: index i of the scan → (row, col) of the 8×8 block
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# 8×8 DCT-II orthonormal basis: dct = C @ x @ C.T, idct = C.T @ X @ C
_k = np.arange(8)
_C = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.sqrt(0.25)
_C[0, :] *= 1 / np.sqrt(2)

# ITU-T T.81 Annex K.1 example quantization tables (public spec)
_QLUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QCHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list) — public spec constants
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _canonical_codes(bits: list[int], values: list[int]):
    """(symbol → (code, length)) canonical Huffman assignment per the
    spec's Generate_size_table/Generate_code_table procedure."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], values: list[int]):
    """16-bit-prefix LUT decoder tables: ``sym[peek16]`` and
    ``ln[peek16]`` (ln == 0 ⇒ invalid prefix).  One array lookup per
    Huffman symbol instead of up to 16 bit-by-bit steps — the reason
    the decoder sustains ~1 Mpx/s instead of ~150 kpx/s."""
    sym = np.zeros(1 << 16, dtype=np.uint8)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    for s, (code, length) in _canonical_codes(bits, values).items():
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = s
        ln[lo:hi] = length
    return sym, ln


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _entropy_segments(payload: bytes, start: int) -> list[bytes]:
    """Destuffed entropy-coded byte runs, split at RSTn markers and
    terminated at EOI (or any other marker).  One linear pass, done
    once, so the hot decode loop never tests for 0xFF again."""
    segs: list[bytes] = []
    cur = bytearray()
    i, n = start, len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = payload[i + 1]
        if m == 0x00:  # stuffed 0xFF data byte
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker = segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif m == 0xFF:  # fill byte
            i += 1
        else:  # EOI or any other marker ends the scan
            break
    segs.append(bytes(cur))
    return segs


class _Bits:
    """MSB-first bit cursor over one destuffed entropy segment."""

    __slots__ = ("data", "n", "pos", "acc", "bits")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.acc = 0
        self.bits = 0

    def _fill(self) -> None:
        while self.bits <= 24 and self.pos < self.n:
            self.acc = ((self.acc << 8) | self.data[self.pos]) & 0xFFFFFFFF
            self.pos += 1
            self.bits += 8

    def peek16(self) -> int:
        if self.bits < 16:
            self._fill()
        if self.bits >= 16:
            return (self.acc >> (self.bits - 16)) & 0xFFFF
        # stream tail: left-pad with zeros (only trailing pad bits land
        # here; the MCU count bounds what is actually consumed)
        return (self.acc << (16 - self.bits)) & 0xFFFF

    def take(self, k: int) -> int:
        if k == 0:
            return 0
        if self.bits < k:
            self._fill()
            if self.bits < k:
                raise ValueError("JPEG entropy stream truncated")
        self.bits -= k
        v = (self.acc >> self.bits) & ((1 << k) - 1)
        self.acc &= (1 << self.bits) - 1
        return v


def _huff_decode(br: _Bits, table) -> int:
    sym, ln = table
    p = br.peek16()
    length = int(ln[p])
    if length == 0:
        raise ValueError("invalid JPEG Huffman code")
    br.take(length)
    return int(sym[p])


def _extend(v: int, t: int) -> int:
    """DIFF/coefficient sign extension (spec EXTEND procedure)."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w, 3) RGB uint8 (grayscale replicated).

    Reference parity note: like decode_png this is the feature-extract
    decode boundary of SURVEY.md §2's multimodal columns — the
    reference parser has no analog (it parses syslog, not media); the
    op exists for the training-data pipeline surface."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, comps)
    restart_interval = 0
    data_start = None
    scan_comps = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        seg = payload[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                q = np.frombuffer(seg[p + 1:p + 65], dtype=np.uint8)
                if q.size < 64:
                    raise ValueError("truncated DQT")
                qtables[tq] = q.astype(np.int64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                values = list(seg[p + 17:p + 17 + n])
                if len(bits) < 16 or len(values) < n:
                    raise ValueError("truncated DHT")
                htables[(tc, th)] = _decode_table(bits, values)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            if w <= 0 or h <= 0 or w * h > JPEG_MAX_PIXELS:
                raise ValueError(
                    f"JPEG dimensions {w}x{h} out of bounds "
                    f"(max {JPEG_MAX_PIXELS} px)"
                )
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i:9 + 3 * i]
                hs, vs = samp >> 4, samp & 0x0F
                # per-component bound (not just the max): a hostile 0
                # factor would divide-by-zero in the upsampler
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(
                        f"JPEG component sampling factor {hs}x{vs} "
                        "out of bounds (must be 1..4)"
                    )
                comps.append({"id": cid, "hs": hs, "vs": vs, "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tbl = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append({"id": cs, "td": tbl >> 4,
                                   "ta": tbl & 0x0F})
            data_start = pos + 2 + seglen
            break
        elif marker == 0xD9:  # EOI before SOS
            break
        pos += 2 + seglen
    if frame is None or data_start is None or scan_comps is None:
        raise ValueError("missing JPEG SOF/SOS")
    h, w, comps = frame
    if len(scan_comps) != len(comps):
        raise ValueError("interleaved scan must cover all components")
    by_id = {c["id"]: c for c in comps}
    for sc in scan_comps:
        if sc["id"] not in by_id:
            raise ValueError("SOS references unknown component")
        by_id[sc["id"]].update(td=sc["td"], ta=sc["ta"])

    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("bad JPEG sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        bw, bh = mcux * c["hs"], mcuy * c["vs"]
        planes.append(np.zeros((bh * 8, bw * 8), dtype=np.float64))
        if c["tq"] not in qtables:
            raise ValueError("missing quant table")
        c["q"] = qtables[c["tq"]]

    # Entropy pass: pure-python Huffman fills a flat coefficient table
    # (plain lists — touching numpy per coefficient costs more than the
    # Huffman itself); the dequant + inverse zigzag + IDCT then run as
    # THREE batched numpy ops over all blocks at once instead of per-
    # block 8×8 matmuls (measured ~5× end-to-end).
    segs = _entropy_segments(payload, data_start)
    seg_idx = 0
    br = _Bits(segs[0])
    pred = [0] * len(comps)
    n_mcu = mcux * mcuy
    blocks_per_mcu = sum(c["hs"] * c["vs"] for c in comps)
    total_blocks = n_mcu * blocks_per_mcu
    coefs = [[0] * 64 for _ in range(total_blocks)]
    meta: list[tuple[int, int, int]] = []  # (ci, y0, x0) per block
    tabs = []
    for c in comps:
        dc_tab = htables.get((0, c.get("td", 0)))
        ac_tab = htables.get((1, c.get("ta", 0)))
        if dc_tab is None or ac_tab is None:
            raise ValueError("missing Huffman table")
        tabs.append((dc_tab, ac_tab))
    bi = 0
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("JPEG truncated at restart")
            br = _Bits(segs[seg_idx])
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, c in enumerate(comps):
            dc_tab, ac_tab = tabs[ci]
            for by in range(c["vs"]):
                for bx in range(c["hs"]):
                    zz = coefs[bi]
                    t = _huff_decode(br, dc_tab)
                    diff = _extend(br.take(t), t) if t else 0
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(br, ac_tab)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run overflow")
                        zz[k] = _extend(br.take(s), s)
                        k += 1
                    meta.append(
                        (ci, (my * c["vs"] + by) * 8, (mx * c["hs"] + bx) * 8)
                    )
                    bi += 1
    # batched dequant → inverse zigzag → IDCT, in bounded chunks: the
    # whole-image batch would allocate multi-hundred-MB transients at
    # large dims, which this host's THP/compaction behavior stalls
    # ~100× (see the chunking notes in dedup.py) — ~4k blocks ≈ 2 MB
    # per array keeps every transient small everywhere
    qtab = [c["q"].astype(np.float64) for c in comps]
    chunk = 4096
    for s in range(0, total_blocks, chunk):
        mchunk = meta[s:s + chunk]
        zz_all = np.asarray(coefs[s:s + chunk], dtype=np.float64)
        qs = np.stack([qtab[ci] for ci, _, _ in mchunk])
        nat = np.empty_like(zz_all)
        nat[:, _ZIGZAG] = zz_all * qs
        px_all = (
            np.einsum("ij,bjk,kl->bil", _C.T, nat.reshape(-1, 8, 8), _C)
            + 128.0
        )
        for b, (ci, y0, x0) in enumerate(mchunk):
            planes[ci][y0:y0 + 8, x0:x0 + 8] = px_all[b]

    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        # upsample to full resolution (nearest — feature-grade)
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        y = np.clip(out[0], 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(y[:, :, None], 3, axis=2))
    if len(out) != 3:
        raise ValueError(f"unsupported JPEG component count {len(out)}")
    # YCbCr → RGB in ~2 MB row bands: whole-image float64 transients
    # (6+ arrays × h·w·8 B) land in the host's measured large-allocation
    # stall regime (same chunking rationale as the IDCT above)
    rgb = np.empty((h, w, 3), dtype=np.uint8)
    band = max(1, (1 << 18) // max(w, 1))
    for r0 in range(0, h, band):
        ys = out[0][r0:r0 + band]
        cbs = out[1][r0:r0 + band] - 128.0
        crs = out[2][r0:r0 + band] - 128.0
        for i, ch in enumerate((
            ys + 1.402 * crs,
            ys - 0.344136 * cbs - 0.714136 * crs,
            ys + 1.772 * cbs,
        )):
            np.rint(ch, out=ch)
            np.clip(ch, 0, 255, out=ch)
            rgb[r0:r0 + band, :, i] = ch
    return rgb


# ---------------------------------------------------------------------------
# encoder (test-payload synthesis: 4:4:4 / grayscale baseline)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.acc = (self.acc << pad) | ((1 << pad) - 1)
            b = self.acc & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _csize(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    diff = int(zz[0]) - pred
    t = _csize(diff)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _csize(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    quality_scale: float = 0.04,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline encoder: (h, w, 3) RGB uint8 (or (h, w) gray) →
    JPEG bytes with Annex-K tables scaled by ``quality_scale`` (0.04 ≈
    near-lossless: every quant step rounds to 1-5).  ``subsample=True``
    writes 4:2:0 (2×2-box chroma downsample, the dominant real-world
    layout — exercises the decoder's multi-block MCU + upsample path);
    ``restart_interval`` writes DRI + RSTn markers every N MCUs
    (exercises the decoder's restart resync path)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qlum = np.maximum(1, np.rint(_QLUM * quality_scale)).astype(np.int64)
    qchrom = np.maximum(1, np.rint(_QCHROM * quality_scale)).astype(np.int64)
    if gray:
        planes = [img.astype(np.float64)]
        qsel = [0]
        samps = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        qsel = [0, 1, 1]
        samps = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    qts = [qlum, qchrom]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    for tq, q in enumerate(qts[: 1 if gray else 2]):
        seg(0xDB, bytes([tq]) + bytes(int(q[_ZIGZAG[i]]) for i in range(64)))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, (samps[i][0] << 4) | samps[i][1], qsel[i]])
    seg(0xC0, sof)
    tabs = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
    if not gray:
        tabs += [(0x01, _DC_CHROM), (0x11, _AC_CHROM)]
    for tid, (bits, values) in tabs:
        seg(0xC4, bytes([tid]) + bytes(bits) + bytes(values))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if gray or i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    dc_codes = [_canonical_codes(*_DC_LUM)] + (
        [] if gray else [_canonical_codes(*_DC_CHROM)] * 2
    )
    ac_codes = [_canonical_codes(*_AC_LUM)] + (
        [] if gray else [_canonical_codes(*_AC_CHROM)] * 2
    )
    bw = _BitWriter()
    preds = [0] * nc
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    padded = []
    for ci, p in enumerate(planes):
        hs, vs = samps[ci]
        if (hs, vs) != (hmax, vmax):
            # 2×2 box-average chroma downsample (pad odd dims first)
            ph = p if h % 2 == 0 else np.vstack([p, p[-1:, :]])
            ph = ph if w % 2 == 0 else np.hstack([ph, ph[:, -1:]])
            p = 0.25 * (ph[0::2, 0::2] + ph[1::2, 0::2]
                        + ph[0::2, 1::2] + ph[1::2, 1::2])
        ch, cw = p.shape
        pp = np.empty((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        pp[:ch, :cw] = p
        pp[ch:, :cw] = p[-1:, :]  # edge-replicate padding
        pp[:, cw:] = pp[:, cw - 1:cw]
        padded.append(pp)
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                bw.flush()
                out_rst = 0xD0 + ((mcu_n // restart_interval - 1) % 8)
                bw.out.extend((0xFF, out_rst))
                preds = [0] * nc
            for ci in range(nc):
                hs, vs = samps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blk = padded[ci][y0:y0 + 8, x0:x0 + 8]
                        coef = _C @ (blk - 128.0) @ _C.T
                        q = qts[qsel[ci]].reshape(8, 8)
                        # zigzag-order the quantized coefficients
                        zzs = np.rint(coef / q).astype(np.int64).reshape(-1)
                        zz = zzs[_ZIGZAG]
                        preds[ci] = _encode_block(
                            bw, zz, preds[ci], dc_codes[ci], ac_codes[ci]
                        )
            mcu_n += 1
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
