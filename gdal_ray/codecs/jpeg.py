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

Performance note (round 4): entropy decode is VECTORIZED ACROSS RESTART
SEGMENTS — ``decode_jpeg_batch`` pools every restart interval of every
image in a batch into one numpy lane array and steps a SIMD-style state
machine (one Huffman symbol per lane per step: 16-bit sliding-window
peek → stacked 2^16 LUT gather → masked DC/AC/EOB/ZRL transitions).
The encoder now emits DRI/RSTn (default: one restart per MCU row), so a
batch of B images with R segments each decodes with B×R parallel lanes;
foreign JPEGs without restart markers still decode (one lane per image,
amortized across the batch).  Dequantization/unzigzag/IDCT/upsample/
color stay fully vectorized per image.  The scalar per-symbol engine is
kept as ``decode_jpeg_scalar`` (parity reference for tests).
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
    # identical scaling to T.81's (1/4)C(u)C(v) double sum).
    # Two BLAS matmuls instead of a naive 3-operand einsum contraction:
    # U = X @ C^T per block, then Y = C @ U via the transpose identity.
    n = blocks.shape[0]
    u = (blocks.reshape(-1, 8) @ _C.T).reshape(n, 8, 8)
    return (u.transpose(0, 2, 1).reshape(-1, 8) @ _C.T).reshape(n, 8, 8).transpose(0, 2, 1)


_C32 = _C.astype(np.float32)


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    # inverse: X = C^T Y C (same two-matmul scheme); float32 inputs stay
    # float32 (decode tail precision ~2e-4 abs, far below the 0.5 LSB)
    C = _C32 if coef.dtype == np.float32 else _C
    n = coef.shape[0]
    u = (coef.reshape(-1, 8) @ C).reshape(n, 8, 8)
    return np.ascontiguousarray(
        (u.transpose(0, 2, 1).reshape(-1, 8) @ C).reshape(n, 8, 8).transpose(0, 2, 1)
    )


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


_YCC2RGB = np.array([
    [1.0, 0.0, 1.402],
    [1.0, -0.344136, -0.714136],
    [1.0, 1.772, 0.0],
]).T
_YCC_OFF = np.array([-1.402 * 128.0,
                     (0.344136 + 0.714136) * 128.0,
                     -1.772 * 128.0])


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    # one BLAS matmul instead of five elementwise passes
    if ycc.dtype == np.float32:
        rgb = ycc @ _YCC2RGB.astype(np.float32) + _YCC_OFF.astype(np.float32)
    else:
        rgb = ycc @ _YCC2RGB + _YCC_OFF
    return np.clip(np.round(rgb, out=rgb), 0, 255).astype(np.uint8)


def _component_blocks(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    H = (h + 7) // 8 * 8
    W = (w + 7) // 8 * 8
    p = np.empty((H, W), dtype=np.float64)
    p[:h, :w] = plane
    p[h:, :w] = plane[-1:, :]
    p[:, w:] = p[:, w - 1 : w]
    return p.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                restart_interval: int | None = None) -> bytes:
    """Baseline 4:4:4 JFIF encoder; arr uint8 (H,W) or (H,W,3).

    ``restart_interval`` is the DRI value in MCUs; default one MCU row
    (restart markers bound error propagation AND give the vectorized
    decoder one parallel lane per row).  Pass 0 to disable.
    """
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
    nby = (h + 7) // 8
    nbx = (w + 7) // 8
    if restart_interval is None:
        restart_interval = nbx if nby > 1 else 0  # one MCU row
    # DRI (before SOS, T.81 B.2.4.4)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
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

    qcoef = []
    for ci, plane in enumerate(planes):
        blocks = _component_blocks(plane) - 128.0
        coef = _fdct_blocks(blocks)
        q = qts[ci].reshape(8, 8).astype(np.float64)
        qc = np.round(coef / q).astype(np.int64)
        qcoef.append(qc)
    # interleaved MCU order = one block per component per MCU (4:4:4)
    bw = _BitWriter()
    preds = [0] * len(planes)
    n_mcu = nby * nbx
    rst_no = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out += bw.out
            out += bytes([0xFF, 0xD0 + rst_no])
            rst_no = (rst_no + 1) % 8
            bw = _BitWriter()
            preds = [0] * len(planes)
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


def _parse_headers(data: bytes) -> dict:
    """Marker-segment parse up to (and including) SOS.  Returns frame,
    scan components, quant tables, raw Huffman tables (bits, values),
    restart interval, and the byte offset of the entropy-coded data."""
    buf = memoryview(data)
    if bytes(buf[:2]) != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[list[int], list[int]]] = {}
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
                huff[(cls, tid)] = (bits, values)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci], seg[7 + 3 * ci], seg[8 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:  # SOF2 progressive — handled by jpeg_progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci], seg[7 + 3 * ci], seg[8 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": True}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline/progressive JPEG supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scomp = []
            for si in range(ns):
                cid, tabs = seg[1 + 2 * si], seg[2 + 2 * si]
                scomp.append({"id": cid, "dc": tabs >> 4, "ac": tabs & 15})
            pos += seglen
            if frame is None:
                raise ValueError("SOS before SOF")
            return {
                "frame": frame, "scomp": scomp, "qtables": qtables,
                "huff": huff, "dri": restart_interval, "scan_off": pos,
            }
        pos += seglen
    raise ValueError("no scan found")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode one baseline JPEG (vectorized engine, single-image batch)."""
    return decode_jpeg_batch([data])[0]


def decode_jpeg_scalar(data: bytes) -> np.ndarray:
    """Scalar per-symbol reference engine (parity baseline for tests)."""
    m = _parse_headers(data)
    if m["frame"].get("progressive"):
        from gdal_ray.codecs.jpeg_progressive import decode_jpeg_progressive

        return decode_jpeg_progressive(data)
    huff_luts = {k: _huff_lut(*v) for k, v in m["huff"].items()}
    return _decode_scan(
        memoryview(data), m["scan_off"], m["frame"], m["scomp"],
        m["qtables"], huff_luts, m["dri"],
    )


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

    coefs = [c["coef_zz"] for c in comps]
    return _reconstruct(coefs, comps, h, w, mcux, mcuy, hmax, vmax,
                        [c["q"] for c in comps])


def _reconstruct(coefs_zz, comps, h, w, mcux, mcuy, hmax, vmax, qs) -> np.ndarray:
    """Shared tail: zigzag coefficient rows per component → dequant →
    IDCT → upsample → crop → color conversion (all vectorized)."""
    planes = []
    for c, zz, q in zip(comps, coefs_zz, qs):
        bw_ = mcux * c["h"]
        bh_ = mcuy * c["v"]
        coef = (np.asarray(zz, dtype=np.float32)[:, UNZIGZAG].reshape(-1, 8, 8)
                * q.astype(np.float32))
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


# ---------------------------------------------------------------------------
# vectorized batch decoder (round 4)
#
# One "lane" per restart segment, pooled across every image in the batch.
# Each state-machine step decodes exactly one Huffman symbol in every
# active lane with pure numpy gathers/masked updates — no Python work per
# symbol.  Lane state: bit position, current block, coefficient index k
# (0 ⇒ DC expected), per-component DC predictors.

_LUT_CACHE: dict = {}


def _lut_id(registry: dict, bits, values) -> int:
    key = (bytes(bits), bytes(values))
    if key not in registry:
        if key not in _LUT_CACHE:
            _LUT_CACHE[key] = _huff_lut(list(bits), list(values))
        registry[key] = (len(registry), _LUT_CACHE[key])
    return registry[key][0]


def _split_entropy(raw: np.ndarray):
    """Vectorized de-stuffing + restart split of the entropy-coded bytes.

    raw: uint8 array starting right after the SOS header.  Returns
    (clean bytes uint8, segment start offsets incl. final end) where
    stuffed 0x00 bytes and RSTn markers are removed and each RSTn is a
    segment boundary (clean coordinates).
    """
    ff = np.flatnonzero(raw[:-1] == 0xFF)
    nxt = raw[ff + 1]
    is_stuff = nxt == 0x00
    is_rst = (nxt >= 0xD0) & (nxt <= 0xD7)
    stop_idx = np.flatnonzero(~is_stuff & ~is_rst)
    if stop_idx.size:
        stop = int(ff[stop_idx[0]])          # first real marker (EOI/next)
        in_scan = ff < stop
        ff, is_stuff, is_rst = ff[in_scan], is_stuff[in_scan], is_rst[in_scan]
    else:
        stop = len(raw)
    delete = np.zeros(stop, dtype=bool)
    delete[ff[is_stuff] + 1] = True          # drop the stuffed 0x00
    rst = ff[is_rst]
    delete[rst] = True                       # drop both marker bytes
    delete[rst + 1] = True
    keep = ~delete
    clean = raw[:stop][keep]
    csum = np.cumsum(keep)
    # kept bytes strictly before each RSTn == segment boundary
    bounds = csum[rst] if rst.size else np.empty(0, dtype=np.int64)
    offs = np.concatenate([[0], bounds, [len(clean)]]).astype(np.int64)
    return clean, offs


def _words32(buf: np.ndarray) -> np.ndarray:
    """Sliding 32-bit big-endian window per byte offset (zero-padded).
    In-place accumulation — no intermediate temporaries."""
    b = np.empty(len(buf) + 8, dtype=np.uint32)
    b[:len(buf)] = buf
    b[len(buf):] = 0
    w = b[:-3] << 8
    w |= b[1:-2]
    w <<= 8
    w |= b[2:-1]
    w <<= 8
    w |= b[3:]
    return w


def _is_progressive_stream(data: bytes) -> bool:
    """Cheap marker walk: True iff the frame header is SOF2."""
    if data[:2] != b"\xFF\xD8":
        return False
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            return False
        marker = data[pos + 1]
        pos += 2
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            continue
        if marker in (0xD9, 0xDA):
            return False
        if marker == 0xC2:
            return True
        if marker in (0xC0, 0xC1):
            return False
        pos += struct.unpack_from(">H", data, pos)[0]
    return False


def decode_jpeg_batch(datas: list[bytes], *,
                      dc_only: bool = False) -> list[np.ndarray]:
    """Decode a batch of baseline JPEGs with pooled-lane entropy decode.
    Progressive (SOF2) members route to the scalar Annex-G decoder.

    ``dc_only=True`` returns 1/8-scale images built from the DC
    coefficients alone (each output pixel is the exact 8x8-block mean)
    — the crawl-scale thumbnail/phash fast path: no IDCT, no full-res
    upsample or color conversion."""
    if not datas:
        return []
    prog = [i for i, d in enumerate(datas) if _is_progressive_stream(d)]
    if prog:
        from gdal_ray.codecs.jpeg_progressive import decode_jpeg_progressive

        out: list = [None] * len(datas)
        rest, rest_pos = [], []
        pset = set(prog)
        for i, d in enumerate(datas):
            if i in pset:
                full = decode_jpeg_progressive(d)
                out[i] = _block_means(full) if dc_only else full
            else:
                rest.append(d)
                rest_pos.append(i)
        for p, img in zip(rest_pos, decode_jpeg_batch(rest, dc_only=dc_only)):
            out[p] = img
        return out
    # bound pooled coefficient memory (~36x the compressed bytes): split
    # oversized batches; int32 lane state also requires pool < 2^31 bytes
    total = sum(len(d) for d in datas)
    if total > (4 << 20) and len(datas) > 1:
        mid = len(datas) // 2
        return (decode_jpeg_batch(datas[:mid], dc_only=dc_only)
                + decode_jpeg_batch(datas[mid:], dc_only=dc_only))
    registry: dict = {}          # (bits,values) bytes key -> (id, lut)
    images = []                  # per-image geometry + lane bookkeeping
    clean_parts: list[np.ndarray] = []   # shared entropy buffer (no per-lane copy)
    base_parts: list[np.ndarray] = []    # lane byte bases
    lo_parts: list[np.ndarray] = []      # lane first-block indices
    hi_parts: list[np.ndarray] = []
    tab_parts: list[tuple[int, np.ndarray, np.ndarray]] = []  # (n_seg, dc, ac)
    blk_comp_parts: list[np.ndarray] = []
    blk_dst_parts: list[np.ndarray] = []
    byte_cursor = 0
    block_cursor = 0             # global block index (scan order)
    row_cursor = 0               # global coefficient-row index (dst order)

    for data in datas:
        m = _parse_headers(data)
        frame, scomp, dri = m["frame"], m["scomp"], m["dri"]
        comps = frame["comps"]
        h, w = frame["h"], frame["w"]
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        n_mcu = mcux * mcuy
        by_id = {c["id"]: c for c in comps}
        dc_ids, ac_ids = [], []
        for sc in scomp:
            c = by_id[sc["id"]]
            bits_dc, vals_dc = m["huff"][(0, sc["dc"])]
            bits_ac, vals_ac = m["huff"][(1, sc["ac"])]
            dc_ids.append(_lut_id(registry, bits_dc, vals_dc))
            ac_ids.append(_lut_id(registry, bits_ac, vals_ac))
            c["q"] = m["qtables"][c["tq"]].astype(np.float64)

        # per-MCU block template: (comp_idx, v_i, h_i) in interleave order
        tmpl = [(ci, vi, hi)
                for ci, c in enumerate(comps)
                for vi in range(c["v"]) for hi in range(c["h"])]
        bpm = len(tmpl)
        # component coefficient-row bases (contiguous, per image)
        comp_rows = [mcuy * c["v"] * mcux * c["h"] for c in comps]
        comp_base = np.cumsum([0] + comp_rows[:-1]) + row_cursor
        # vectorized block→(comp, dst-row) maps in scan order
        mm = np.arange(n_mcu, dtype=np.int64)
        my, mx = mm // mcux, mm % mcux
        bc = np.empty((n_mcu, bpm), dtype=np.int16)
        bd = np.empty((n_mcu, bpm), dtype=np.int64)
        for j, (ci, vi, hi) in enumerate(tmpl):
            c = comps[ci]
            nbx_c = mcux * c["h"]
            bc[:, j] = ci
            bd[:, j] = comp_base[ci] + (my * c["v"] + vi) * nbx_c + (mx * c["h"] + hi)
        blk_comp_parts.append(bc.reshape(-1))
        blk_dst_parts.append(bd.reshape(-1))

        # entropy bytes → segments (lanes); lanes index a SHARED clean
        # buffer (prefix-property LUT peeks past a lane's end are harmless
        # — the symbol is fully determined by the lane's own bits)
        raw = np.frombuffer(data, dtype=np.uint8)[m["scan_off"]:]
        clean, offs = _split_entropy(raw)
        n_seg = len(offs) - 1
        R = dri if dri else n_mcu
        expect = (n_mcu + R - 1) // R
        if n_seg != expect:
            raise ValueError(f"restart segment count {n_seg} != expected {expect}")
        clean_parts.append(clean)
        base_parts.append(byte_cursor + offs[:-1])
        mcu_lo = np.arange(n_seg, dtype=np.int64) * R
        lo_parts.append(block_cursor + mcu_lo * bpm)
        hi_parts.append(block_cursor + np.minimum(mcu_lo + R, n_mcu) * bpm)
        tab_parts.append((n_seg,
                          np.asarray(dc_ids, dtype=np.int64),
                          np.asarray(ac_ids, dtype=np.int64)))
        byte_cursor += len(clean)

        images.append({
            "comps": comps, "h": h, "w": w, "mcux": mcux, "mcuy": mcuy,
            "hmax": hmax, "vmax": vmax, "comp_base": comp_base,
            "comp_rows": comp_rows,
        })
        block_cursor += n_mcu * bpm
        row_cursor += sum(comp_rows)

    # ---- pooled arrays ----------------------------------------------------
    words = _words32(np.concatenate(clean_parts) if clean_parts else
                     np.empty(0, dtype=np.uint8))
    nt = len(registry)
    luts = np.empty(nt << 16, dtype=np.int32)
    for _, (tid, lut) in registry.items():
        luts[tid << 16:(tid + 1) << 16] = lut
    blk_comp = np.concatenate(blk_comp_parts).astype(np.int64)
    blk_dst = np.concatenate(blk_dst_parts)
    seg_base = np.concatenate(base_parts)
    blk_lo = np.concatenate(lo_parts)
    blk_hi = np.concatenate(hi_parts)
    ncomp_max = max(t[1].size for t in tab_parts)
    nlanes = seg_base.size
    dc_tab = np.zeros((nlanes, ncomp_max), dtype=np.int64)
    ac_tab = np.zeros((nlanes, ncomp_max), dtype=np.int64)
    i = 0
    for n_seg, d, a_ in tab_parts:
        dc_tab[i:i + n_seg, :d.size] = d
        ac_tab[i:i + n_seg, :a_.size] = a_
        i += n_seg

    coef = np.zeros((row_cursor, 64), dtype=np.int16)
    _vector_scan(words, luts, seg_base, blk_lo, blk_hi, blk_comp, blk_dst,
                 dc_tab, ac_tab, coef)

    # ---- grouped reconstruction (one IDCT/color pass per distinct shape) ---
    groups: dict = {}
    for idx, im in enumerate(images):
        key = (im["h"], im["w"], tuple(
            (c["h"], c["v"], c["q"].tobytes()) for c in im["comps"]))
        groups.setdefault(key, []).append(idx)
    out: list = [None] * len(images)
    for allmembers in groups.values():
        im0 = images[allmembers[0]]
        # bound the float64 IDCT temporaries to stay cache/bandwidth
        # friendly: ≤ ~24k blocks (≈12 MB) per reconstruction pass
        rows_per_img = max(sum(im0["comp_rows"]), 1)
        step = max(1, 24576 // rows_per_img)
        chunks = [allmembers[i:i + step] for i in range(0, len(allmembers), step)]
        for members in chunks:
            _reconstruct_members(images, members, im0, coef, out,
                                 dc_only=dc_only)
    return out


def decode_jpeg_dc(data: bytes) -> np.ndarray:
    """1/8-scale decode from DC coefficients only (block means)."""
    return decode_jpeg_batch([data], dc_only=True)[0]


def _block_means(img: np.ndarray) -> np.ndarray:
    """Exact 8x8 block means of a full-resolution decode (the progressive
    fallback for dc_only; edge blocks pad by replication like the MCU
    grid does)."""
    h, w = img.shape[:2]
    H8, W8 = -(-h // 8) * 8, -(-w // 8) * 8
    pad = np.pad(img, ((0, H8 - h), (0, W8 - w)) + ((0, 0),) * (img.ndim - 2),
                 mode="edge").astype(np.float64)
    m = pad.reshape(H8 // 8, 8, W8 // 8, 8, -1).mean(axis=(1, 3))
    m = m.squeeze(-1) if img.ndim == 2 else m
    return np.clip(np.round(m), 0, 255).astype(np.uint8)


def _reconstruct_members(images, members, im0, coef, out, *,
                         dc_only: bool = False):
    gcoefs = [
        np.concatenate([
            coef[images[i]["comp_base"][ci]:
                 images[i]["comp_base"][ci] + images[i]["comp_rows"][ci]]
            for i in members
        ])
        for ci in range(len(im0["comps"]))
    ]
    planes = _reconstruct_planes(
        gcoefs, im0["comps"], len(members), im0["h"], im0["w"],
        im0["mcux"], im0["mcuy"], im0["hmax"], im0["vmax"],
        dc_only=dc_only,
    )
    if planes.ndim == 3:  # grayscale (G, H, W)
        np.clip(np.round(planes, out=planes), 0, 255, out=planes)
        imgs8 = planes.astype(np.uint8)
        for j, i in enumerate(members):
            out[i] = imgs8[j]
    else:  # (G, H, W, 3)
        imgs8 = ycbcr_to_rgb(planes)
        for j, i in enumerate(members):
            out[i] = imgs8[j]


def _reconstruct_planes(gcoefs, comps, G, h, w, mcux, mcuy, hmax, vmax,
                        *, dc_only: bool = False):
    """Grouped tail: per-component zigzag coefficient rows (stacked over G
    same-shape images) -> dequant -> IDCT -> plane assembly -> upsample.
    Returns (G, h, w) for grayscale or (G, h, w, ncomp) stacked YCbCr.
    With dc_only, planes are 1/8 scale (DC/8 + 128 per block — the exact
    block mean) and chroma upsamples at block granularity."""
    planes = []
    h_out = -(-h // 8) if dc_only else h
    w_out = -(-w // 8) if dc_only else w
    for ci, c in enumerate(comps):
        bw_ = mcux * c["h"]
        bh_ = mcuy * c["v"]
        if dc_only:
            dc = gcoefs[ci][:, 0].astype(np.float32) * float(c["q"].reshape(-1)[0])
            plane = dc.reshape(G, bh_, bw_) / 8.0 + 128.0
        else:
            z = (gcoefs[ci][:, UNZIGZAG].reshape(-1, 8, 8)
                 * c["q"].astype(np.float32))
            blocks = _idct_blocks(z) + 128.0
            plane = (blocks.reshape(G, bh_, bw_, 8, 8)
                     .transpose(0, 1, 3, 2, 4).reshape(G, bh_ * 8, bw_ * 8))
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=1), rx, axis=2)
        planes.append(plane[:, :h_out, :w_out])
    if len(planes) == 1:
        return planes[0]
    return np.stack(planes, axis=-1)


def _vector_scan(words, luts, seg_base, blk_lo, blk_hi, blk_comp, blk_dst,
                 dc_tab, ac_tab, coef):
    """Pooled SIMD-style Huffman scan: one symbol per live lane per step.

    State arrays stay COMPACTED to live lanes (finished lanes are sliced
    out immediately), so every step is a fixed ~30 numpy kernel calls
    over contiguous arrays with no per-step index re-gather."""
    keep0 = blk_lo < blk_hi
    # int32 lane state: halves the memory traffic of the hot loop
    # (pool byte/block counts are bounded by the batch-split guard)
    base = seg_base[keep0].astype(np.int32) * 8  # bit address of lane start
    gblk = blk_lo[keep0].astype(np.int32)
    bhi = blk_hi[keep0].astype(np.int32)
    dct = dc_tab[keep0].astype(np.int32)
    act = ac_tab[keep0].astype(np.int32)
    nC = dc_tab.shape[1]
    n = base.size
    pos = base.copy()                      # absolute bit position
    k = np.zeros(n, dtype=np.int32)
    pred = np.zeros((n, nC), dtype=np.int32)
    rows = np.arange(n, dtype=np.int32) * nC
    # hard bound: <=64 symbols per block (DC + 63 AC/ZRL/EOB advances >=1)
    max_steps = int((bhi - gblk).max(initial=0)) * 66 + 16
    for _ in range(max_steps):
        if not n:
            return
        peek = (words[pos >> 3] >> (16 - (pos & 7))).astype(np.int32) & 0xFFFF
        comp = blk_comp[gblk]
        isdc = k == 0
        lane_comp = rows + comp
        tabs = np.where(isdc, dct.reshape(-1)[lane_comp], act.reshape(-1)[lane_comp])
        lu = luts[(tabs << 16) + peek]
        length = lu & 31
        if not length.all():
            raise ValueError("bad Huffman code in entropy scan")
        rs = lu >> 5
        pos2 = pos + length
        size = np.where(isdc, rs, rs & 15)
        run = rs >> 4  # meaningful for AC lanes only (masked below)
        raw = ((words[pos2 >> 3] >> (16 - (pos2 & 7))).astype(np.int32) & 0xFFFF) >> (16 - size)
        pos = pos2 + size
        hasval = size > 0
        half = np.int32(1) << np.maximum(size - 1, 0)
        ext = np.where(hasval, np.where(raw >= half, raw, raw - 2 * half + 1), 0)

        pf = pred.reshape(-1)
        dcv = pf[lane_comp] + ext             # candidate DC value per lane
        val = np.where(isdc, dcv, ext)
        col = np.where(isdc, 0, k + run)
        wl = np.flatnonzero(isdc | (hasval & ~isdc))
        colw = col[wl]
        if colw.size and int(colw.max()) > 63:
            raise ValueError("AC coefficient run overflow")
        coef[blk_dst[gblk[wl]], colw] = val[wl]
        dc_idx = np.flatnonzero(isdc)
        pf[lane_comp[dc_idx]] = dcv[dc_idx]

        iszero_ac = ~isdc & ~hasval
        zrl = iszero_ac & (run == 15)
        eob = iszero_ac & (run == 0)
        if (iszero_ac & ~zrl & ~eob).any():
            raise ValueError("invalid AC symbol (size 0, run not 0/15)")
        k = np.where(isdc, 1,
                     np.where(hasval, col + 1, np.where(zrl, k + 16, 64)))

        done = k > 63
        if done.any():
            k = np.where(done, 0, k)
            gblk = gblk + done
            finished = done & (gblk >= bhi)
            if finished.any():
                keep = ~finished
                base = base[keep]
                gblk = gblk[keep]
                bhi = bhi[keep]
                k = k[keep]
                pos = pos[keep]
                dct = dct[keep]
                act = act[keep]
                pred = pred[keep]
                n = base.size
                rows = np.arange(n, dtype=np.int64) * nC
    if n:
        raise ValueError("entropy scan did not terminate (corrupt stream)")
