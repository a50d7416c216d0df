"""Baseline JPEG (ITU-T T.81) codec — pure stdlib + numpy.

Real bitstreams: SOI/APP0(JFIF)/DQT/SOF0/DHT/SOS/EOI, 8-bit baseline
sequential, Huffman entropy coding, restart-marker aware.  The encoder
emits 4:4:4 (no chroma subsampling) with the Annex K quantization tables
scaled by a libjpeg-style quality factor and the Annex K typical Huffman
tables.  The decoder accepts any sampling factors ≤ 2×2 (4:4:4, 4:2:2,
4:2:0), grayscale or YCbCr, with DRI/RSTn.

Reference behavior: frmts/jpeg/jpgdataset.cpp decodes through libjpeg;
this is the sandbox's from-spec implementation of the same bitstream
(PSNR of an encode→decode round trip is ≈40-55 dB depending on quality —
the engine's lossy-codec gate).

Performance note: Huffman symbol decoding steps a 2^16 fast lookup
table with O(1) sliding-window bit peeks (precomputed 32-bit windows,
Python-int lists — ~0.1 s for a 256×256 RGB image, 10× the round-2
per-bit loop).  Dequantization/unzigzag run once vectorized after the
scan; block DCT/IDCT, upsampling and color conversion are fully
vectorized.  This is the conformance path for real data; the synthetic
bench corpus keeps the fast deterministic container (codecs/lossy.py).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# tables (ITU-T T.81 Annex K)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K typical Huffman tables: (bits[1..16], values)
HT_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
HT_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# 8x8 DCT-II orthonormal matrix
_k = np.arange(8)
_C = np.cos((2 * _k[:, None] + 1) * _k[None, :] * np.pi / 16).T * np.sqrt(2 / 8)
_C[0] /= np.sqrt(2)  # row 0 scale


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (q * s + 50) // 100
    return np.clip(out, 1, 255)


def _huff_codes(bits, values):
    """code per value (canonical): returns dict value -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lut(bits, values):
    """2^16 fast decode LUT: lut[peek16] = (value << 5) | code_length."""
    lut = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            lut[lo:hi] = (values[k] << 5) | length
            code += 1
            k += 1
        code <<= 1
    return lut


# ---------------------------------------------------------------------------
# encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    # blocks (n, 8, 8) float; forward 2-D DCT: Y = C X C^T (orthonormal C,
    # identical scaling to T.81's (1/4)C(u)C(v) double sum)
    return np.einsum("ij,njk,lk->nil", _C, blocks, _C)


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    # inverse: X = C^T Y C
    return np.einsum("ji,njk,kl->nil", _C, coef, _C)


def _encode_component(bw: _BitWriter, blocks_q: np.ndarray, dc_tab, ac_tab, pred: int) -> int:
    for b in range(blocks_q.shape[0]):
        zz = blocks_q[b].ravel()[ZIGZAG]
        dc = int(zz[0])
        diff = dc - pred
        pred = dc
        size, bits = _magnitude(diff)
        code, length = dc_tab[size]
        bw.write(code, length)
        if size:
            bw.write(bits, size)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        k = 1
        while k <= last:
            v = int(zz[k])
            if v == 0:
                run += 1
            else:
                while run >= 16:
                    code, length = ac_tab[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = ac_tab[(run << 4) | size]
                bw.write(code, length)
                bw.write(bits, size)
                run = 0
            k += 1
        if last < 63:
            code, length = ac_tab[0x00]  # EOB
            bw.write(code, length)
    return pred


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0].astype(np.float64), rgb[..., 1].astype(np.float64), rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _component_blocks(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    H = (h + 7) // 8 * 8
    W = (w + 7) // 8 * 8
    p = np.empty((H, W), dtype=np.float64)
    p[:h, :w] = plane
    p[h:, :w] = plane[-1:, :]
    p[:, w:] = p[:, w - 1 : w]
    return p.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)


def encode_jpeg(arr: np.ndarray, quality: int = 85) -> bytes:
    """Baseline 4:4:4 JFIF encoder; arr uint8 (H,W) or (H,W,3)."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    qt_l = _quality_scale(QT_LUMA, quality)
    qt_c = _quality_scale(QT_CHROMA, quality)
    planes = (
        [arr.astype(np.float64)] if gray
        else list(np.moveaxis(rgb_to_ycbcr(arr), -1, 0))
    )
    qts = [qt_l] + ([] if gray else [qt_c, qt_c])

    out = bytearray()
    out += b"\xFF\xD8"  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT (table 0 luma, table 1 chroma)
    out += b"\xFF\xDB" + struct.pack(">H", 2 + 65) + b"\x00" + bytes(qt_l[ZIGZAG].astype(np.uint8))
    if not gray:
        out += b"\xFF\xDB" + struct.pack(">H", 2 + 65) + b"\x01" + bytes(qt_c[ZIGZAG].astype(np.uint8))
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    for cls, tid, (bits, values) in (
        (0, 0, HT_DC_LUMA), (1, 0, HT_AC_LUMA),
        (0, 1, HT_DC_CHROMA), (1, 1, HT_AC_CHROMA),
    )[: 2 if gray else 4]:
        payload = bytes([cls << 4 | tid]) + bytes(bits) + bytes(values)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(payload)) + payload
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _huff_codes(*HT_DC_LUMA)
    ac_l = _huff_codes(*HT_AC_LUMA)
    dc_c = _huff_codes(*HT_DC_CHROMA)
    ac_c = _huff_codes(*HT_AC_CHROMA)

    bw = _BitWriter()
    nby = (h + 7) // 8
    nbx = (w + 7) // 8
    qcoef = []
    for ci, plane in enumerate(planes):
        blocks = _component_blocks(plane) - 128.0
        coef = _fdct_blocks(blocks)
        q = qts[ci].reshape(8, 8).astype(np.float64)
        qc = np.round(coef / q).astype(np.int64)
        qcoef.append(qc)
    # interleaved MCU order = one block per component per MCU (4:4:4)
    preds = [0] * len(planes)
    for m in range(nby * nbx):
        for ci in range(len(planes)):
            dc_tab = dc_l if ci == 0 else dc_c
            ac_tab = ac_l if ci == 0 else ac_c
            preds[ci] = _encode_component(bw, qcoef[ci][m : m + 1], dc_tab, ac_tab, preds[ci])
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder

def _bit_words(seg: bytes) -> list[int]:
    """Sliding 32-bit big-endian window per byte offset (zero-padded tail):
    the 16 bits starting at bit position p are
    ``(words[p >> 3] >> (16 - (p & 7))) & 0xFFFF`` — one list index + two
    int ops instead of a 16-iteration Python loop per Huffman peek."""
    b = np.frombuffer(seg + b"\x00\x00\x00\x00\x00\x00", dtype=np.uint8).astype(np.uint32)
    return ((b[:-3] << 24) | (b[1:-2] << 16) | (b[2:-1] << 8) | b[3:]).tolist()


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    buf = memoryview(data)
    if bytes(buf[:2]) != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_luts: dict[tuple[int, int], np.ndarray] = {}
    frame = None
    restart_interval = 0
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", buf, pos)[0]
        seg = bytes(buf[pos + 2 : pos + seglen])
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported (baseline)")
                q = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8).astype(np.int64)
                qtables[tq] = q[UNZIGZAG].reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                values = list(seg[i + 17 : i + 17 + n])
                huff_luts[(cls, tid)] = _huff_lut(bits, values)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci], seg[7 + 3 * ci], seg[8 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scomp = []
            for si in range(ns):
                cid, tabs = seg[1 + 2 * si], seg[2 + 2 * si]
                scomp.append({"id": cid, "dc": tabs >> 4, "ac": tabs & 15})
            pos += seglen
            return _decode_scan(buf, pos, frame, scomp, qtables, huff_luts, restart_interval)
        pos += seglen
    raise ValueError("no scan found")


def _decode_scan(buf, pos, frame, scomp, qtables, huff_luts, restart_interval):
    # gather entropy data until EOI, removing stuffed zero bytes, splitting
    # at restart markers
    raw = bytes(buf[pos:])
    segments = []
    cur = bytearray()
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0xFF:
            nxt = raw[i + 1] if i + 1 < len(raw) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    for sc in scomp:
        c = by_id[sc["id"]]
        # Python-int lists: ~10× faster item access than numpy scalars in
        # the per-symbol loop below
        c["dc_lut"] = huff_luts[(0, sc["dc"])].tolist()
        c["ac_lut"] = huff_luts[(1, sc["ac"])].tolist()
        c["q"] = qtables[c["tq"]].astype(np.float64)
        # coefficients accumulate in ZIGZAG order; unzigzag + dequant happen
        # once, vectorized, after the scan loop
        c["coef_zz"] = np.zeros((mcuy * c["v"] * mcux * c["h"], 64), dtype=np.float64)
        c["pred"] = 0

    n_mcu = mcux * mcuy
    seg_idx = 0
    words = _bit_words(segments[0])
    pos = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            words = _bit_words(segments[seg_idx])
            pos = 0
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(m, mcux)
        for c in comps:
            dc_lut = c["dc_lut"]
            ac_lut = c["ac_lut"]
            coef_zz = c["coef_zz"]
            pred = c["pred"]
            nbx = mcux * c["h"]
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    zz = [0.0] * 64
                    # DC
                    lu = dc_lut[(words[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF]
                    length = lu & 31
                    if length == 0:
                        raise ValueError("bad Huffman code (DC)")
                    size = lu >> 5
                    pos += length
                    if size:
                        val = ((words[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF) >> (16 - size)
                        pos += size
                        pred += val if val >= (1 << (size - 1)) else val - (1 << size) + 1
                    zz[0] = pred
                    k = 1
                    while k <= 63:
                        lu = ac_lut[(words[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF]
                        length = lu & 31
                        if length == 0:
                            raise ValueError("bad Huffman code (AC)")
                        pos += length
                        rs = lu >> 5
                        run, size = rs >> 4, rs & 15
                        if size == 0:
                            if run == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise ValueError("AC run overflow")
                        val = ((words[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF) >> (16 - size)
                        pos += size
                        zz[k] = val if val >= (1 << (size - 1)) else val - (1 << size) + 1
                        k += 1
                    row = my * c["v"] + v
                    col = mx * c["h"] + hh
                    coef_zz[row * nbx + col] = zz
            c["pred"] = pred

    planes = []
    for c in comps:
        bw_ = mcux * c["h"]
        bh_ = mcuy * c["v"]
        coef = c["coef_zz"][:, UNZIGZAG].reshape(-1, 8, 8) * c["q"]
        blocks = _idct_blocks(coef) + 128.0
        plane = blocks.reshape(bh_, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh_ * 8, bw_ * 8)
        # upsample to full resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    return ycbcr_to_rgb(np.stack(planes, axis=-1))
