"""VP8 still-image (key-frame) codec, implemented from RFC 6386.

This is the lossy-WebP payload: a `VP8 ` chunk inside the RIFF/WEBP
container holds one VP8 key frame (intra-only).  The reference driver
(frmts/webp/webpdataset.cpp) delegates to libwebp; here the decoder and
a simple-profile encoder are implemented from the public specification
(RFC 6386, "VP8 Data Format and Decoding Guide"):

- boolean arithmetic coder                         §7
- frame / segment / filter / quantizer headers     §9
- key-frame intra mode parsing (incl. B_PRED 4x4)  §11
- DCT token decoding with band/context model       §13
- dequantization, inverse WHT + inverse DCT        §14
- intra prediction: 16x16, chroma 8x8, 4x4 modes   §12
- normal + simple loop filter                      §15

Decoder scope: key frames (which is every still WebP image), any
quantizer / segmentation / partition count / filter setting.  Encoder
scope: a valid simple-profile subset — intra 16x16 + chroma modes, one
token partition, default probability tables, selectable quantizer,
loop filter level 0 (the bitstream field is real; level 0 means the
normative filter is a no-op).

Conformance: tests/test_vp8.py decodes real lossy WebP files (encoded
by the system libwebp at several qualities/sizes, plus the reference
fixture autotest/gdrivers/data/webp/rgbsmall.webp) and requires OUR
reconstruction to match libwebp's own YUV output BIT-EXACTLY, and
libwebp to decode OUR encoder's bitstreams to exactly the planes our
decoder produces.  Constant tables live in vp8_tables.py (normative
RFC data).

This is a conformance-grade pure-Python path (like codecs/jpeg.py's
entropy decoder): per-bool Python loops.  The engine's bench corpus
keeps the fast deterministic stand-in; real-crawl VP8 decode at scale
would swap this module's kernels for native ones behind the same API.
"""

from __future__ import annotations

import struct

import numpy as np

from gdal_ray.codecs.vp8_tables import (
    AC_QLOOKUP,
    COEFF_BANDS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    DEFAULT_COEFF_PROBS,
    KF_BMODE_PROBS,
    KF_UVMODE_PROBS,
    KF_YMODE_PROBS,
    PCAT1,
    PCAT2,
    PCAT3,
    PCAT4,
    PCAT5,
    PCAT6,
    ZIGZAG,
)

# 16x16 / chroma prediction modes (§11.2):
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# 4x4 submodes, numbered in intra_bmode_tree leaf order (§11.2);
# KF_BMODE_PROBS is indexed by these values:
B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU = range(10)

_CAT_PROBS = (PCAT1, PCAT2, PCAT3, PCAT4, PCAT5, PCAT6)
_CAT_BASE = (5, 7, 11, 19, 35, 67)

# mode trees (§11.2)
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
BMODE_TREE = (
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU,
)
MB_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

_LAST_DEBUG: dict = {}


# ---------------------------------------------------------------------------
# boolean coder (§7)


class BoolDecoder:
    __slots__ = ("data", "pos", "value", "range", "bits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.range = 255
        self.bits = 0

    def bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bits += 1
            if self.bits == 8:
                self.bits = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                self.pos += 1
                self.value &= 0xFFFFFF
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bool(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bool(128) else v

    def tree(self, tree: tuple, probs) -> int:
        i = 0
        while True:
            i = tree[i + self.bool(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEncoder:
    """Bit-exact inverse of BoolDecoder (carry-propagating low-value
    renormalization per the reference encoder shape in RFC 6386 §7)."""

    __slots__ = ("out", "low", "range", "count")

    def __init__(self):
        self.out = bytearray()
        self.low = 0
        self.range = 255
        self.count = -24

    def bool(self, bit: int, prob: int):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        shift = 0
        r = self.range
        while r < 128:
            r <<= 1
            shift += 1
        self.range = r
        self.count += shift
        if self.count >= 0:
            offset = shift - self.count
            if (self.low << (offset - 1)) & 0x80000000:
                i = len(self.out) - 1
                while i >= 0 and self.out[i] == 0xFF:
                    self.out[i] = 0
                    i -= 1
                if i >= 0:
                    self.out[i] += 1
            self.out.append((self.low >> (24 - offset)) & 0xFF)
            self.low = (self.low << offset) & 0xFFFFFF
            shift = self.count
            self.count -= 8
        self.low <<= shift

    def literal(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bool((v >> i) & 1, 128)

    def signed_literal(self, v: int, n: int):
        self.literal(abs(v), n)
        self.bool(1 if v < 0 else 0, 128)

    def tree(self, tree: tuple, probs, value: int):
        i = 0
        while True:
            left = tree[i]
            if self._reaches(tree, left, value):
                self.bool(0, probs[i >> 1])
                i = left
            else:
                self.bool(1, probs[i >> 1])
                i = tree[i + 1]
            if i <= 0:
                return

    @staticmethod
    def _reaches(tree: tuple, node: int, value: int) -> bool:
        if node <= 0:
            return -node == value
        return (BoolEncoder._reaches(tree, tree[node], value)
                or BoolEncoder._reaches(tree, tree[node + 1], value))

    def done(self) -> bytes:
        # flush: 32 zero bits pin every pending byte (§7 stop_encode)
        for _ in range(32):
            self.bool(0, 128)
        return bytes(self.out)


# ---------------------------------------------------------------------------
# quantization (§14.1)


def _clip(q: int, hi: int = 127) -> int:
    return 0 if q < 0 else (hi if q > hi else q)


class _Quant:
    __slots__ = ("y1dc", "y1ac", "y2dc", "y2ac", "uvdc", "uvac")

    def __init__(self, q: int, ydc_d: int = 0, y2dc_d: int = 0,
                 y2ac_d: int = 0, uvdc_d: int = 0, uvac_d: int = 0):
        self.y1dc = DC_QLOOKUP[_clip(q + ydc_d)]
        self.y1ac = AC_QLOOKUP[_clip(q)]
        self.y2dc = DC_QLOOKUP[_clip(q + y2dc_d)] * 2
        self.y2ac = max((AC_QLOOKUP[_clip(q + y2ac_d)] * 155) // 100, 8)
        self.uvdc = DC_QLOOKUP[_clip(q + uvdc_d, 117)]
        self.uvac = AC_QLOOKUP[_clip(q + uvac_d)]


# ---------------------------------------------------------------------------
# inverse transforms (§14.3, §14.4) — exact integer arithmetic


def iwht4x4(coeffs):
    """Inverse Walsh-Hadamard on the Y2 block -> 16 luma DC values."""
    ip = coeffs
    t = [0] * 16
    for i in range(4):
        a1 = ip[0 + i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[0 + i] - ip[12 + i]
        t[0 + i] = a1 + b1
        t[4 + i] = c1 + d1
        t[8 + i] = a1 - b1
        t[12 + i] = d1 - c1
    op = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = t[r + 0] + t[r + 3]
        b1 = t[r + 1] + t[r + 2]
        c1 = t[r + 1] - t[r + 2]
        d1 = t[r + 0] - t[r + 3]
        op[r + 0] = (a1 + b1 + 3) >> 3
        op[r + 1] = (c1 + d1 + 3) >> 3
        op[r + 2] = (a1 - b1 + 3) >> 3
        op[r + 3] = (d1 - c1 + 3) >> 3
    return op


_COS = 20091  # (cos(pi/8)*sqrt(2) - 1) in Q16 (§14.4)
_SIN = 35468  # sin(pi/8)*sqrt(2) in Q16


def idct4x4(coeffs):
    """VP8 inverse 4x4 DCT (§14.4) -> 4x4 int64 residual array."""
    ip = coeffs
    t = [0] * 16
    for i in range(4):
        a1 = ip[0 + i] + ip[8 + i]
        b1 = ip[0 + i] - ip[8 + i]
        c1 = ((ip[4 + i] * _SIN) >> 16) - (ip[12 + i] + ((ip[12 + i] * _COS) >> 16))
        d1 = (ip[4 + i] + ((ip[4 + i] * _COS) >> 16)) + ((ip[12 + i] * _SIN) >> 16)
        t[0 + i] = a1 + d1
        t[12 + i] = a1 - d1
        t[4 + i] = b1 + c1
        t[8 + i] = b1 - c1
    out = np.empty((4, 4), dtype=np.int64)
    for i in range(4):
        r = 4 * i
        a1 = t[r + 0] + t[r + 2]
        b1 = t[r + 0] - t[r + 2]
        c1 = ((t[r + 1] * _SIN) >> 16) - (t[r + 3] + ((t[r + 3] * _COS) >> 16))
        d1 = (t[r + 1] + ((t[r + 1] * _COS) >> 16)) + ((t[r + 3] * _SIN) >> 16)
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1 + 4) >> 3
        out[i, 2] = (b1 - c1 + 4) >> 3
    return out


# forward transforms (encoder side; libvpx-shaped integer transforms whose
# round-trip with the exact inverses above is the standard VP8 pairing)


def fdct4x4(block):
    """4x4 residual -> 16 coefficients (raster order)."""
    ip = np.asarray(block, dtype=np.int64).reshape(4, 4)
    tmp = np.empty((4, 4), dtype=np.int64)
    for i in range(4):
        a1 = (ip[i, 0] + ip[i, 3]) * 8
        b1 = (ip[i, 1] + ip[i, 2]) * 8
        c1 = (ip[i, 1] - ip[i, 2]) * 8
        d1 = (ip[i, 0] - ip[i, 3]) * 8
        tmp[i, 0] = a1 + b1
        tmp[i, 2] = a1 - b1
        tmp[i, 1] = (c1 * 2217 + d1 * 5352 + 14500) >> 12
        tmp[i, 3] = (d1 * 2217 - c1 * 5352 + 7500) >> 12
    out = np.empty((4, 4), dtype=np.int64)
    for i in range(4):
        a1 = tmp[0, i] + tmp[3, i]
        b1 = tmp[1, i] + tmp[2, i]
        c1 = tmp[1, i] - tmp[2, i]
        d1 = tmp[0, i] - tmp[3, i]
        out[0, i] = (a1 + b1 + 7) >> 4
        out[2, i] = (a1 - b1 + 7) >> 4
        out[1, i] = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (1 if d1 else 0)
        out[3, i] = (d1 * 2217 - c1 * 5352 + 51000) >> 16
    return out.reshape(16)


def fwht4x4(dcs):
    """Forward WHT over the 16 luma DC coefficients (encoder Y2 path)."""
    ip = np.asarray(dcs, dtype=np.int64).reshape(4, 4)
    tmp = np.empty((4, 4), dtype=np.int64)
    for i in range(4):
        a1 = (ip[i, 0] + ip[i, 2]) << 2
        d1 = (ip[i, 1] + ip[i, 3]) << 2
        c1 = (ip[i, 1] - ip[i, 3]) << 2
        b1 = (ip[i, 0] - ip[i, 2]) << 2
        tmp[i, 0] = a1 + d1 + (1 if a1 else 0)
        tmp[i, 1] = b1 + c1
        tmp[i, 2] = b1 - c1
        tmp[i, 3] = a1 - d1
    out = np.empty((4, 4), dtype=np.int64)
    for i in range(4):
        a1 = tmp[0, i] + tmp[2, i]
        d1 = tmp[1, i] + tmp[3, i]
        c1 = tmp[1, i] - tmp[3, i]
        b1 = tmp[0, i] - tmp[2, i]
        a2 = a1 + d1
        b2 = b1 + c1
        c2 = b1 - c1
        d2 = a1 - d1
        out[0, i] = (a2 + (1 if a2 < 0 else 0) + 3) >> 3
        out[1, i] = (b2 + (1 if b2 < 0 else 0) + 3) >> 3
        out[2, i] = (c2 + (1 if c2 < 0 else 0) + 3) >> 3
        out[3, i] = (d2 + (1 if d2 < 0 else 0) + 3) >> 3
    return out.reshape(16)


# ---------------------------------------------------------------------------
# coefficient tokens (§13.2 / §13.3)


def _decode_coeffs(bd: BoolDecoder, probs, first: int, ctx: int,
                   dq_dc: int, dq_ac: int):
    """Decode one 4x4 block's tokens -> (raster-order dequantized coeffs,
    any_nonzero).  `probs` is coeff_probs[plane] (8 bands x 3 ctx x 11)."""
    coeffs = [0] * 16
    nz = False
    i = first
    skip_eob = False
    bdb = bd.bool
    while i < 16:
        p = probs[COEFF_BANDS[i]][ctx]
        if not skip_eob:
            if not bdb(p[0]):
                break
        if not bdb(p[1]):
            ctx = 0
            skip_eob = True
            i += 1
            continue
        skip_eob = False
        if not bdb(p[2]):
            v = 1
            ctx = 1
        else:
            ctx = 2
            if not bdb(p[3]):
                if not bdb(p[4]):
                    v = 2
                else:
                    v = 3 + bdb(p[5])
            else:
                if not bdb(p[6]):
                    cat = bdb(p[7])
                elif not bdb(p[8]):
                    cat = 2 + bdb(p[9])
                else:
                    cat = 4 + bdb(p[10])
                v = _CAT_BASE[cat]
                extra = 0
                for ep in _CAT_PROBS[cat]:
                    extra = (extra << 1) | bdb(ep)
                v += extra
        if bdb(128):
            v = -v
        coeffs[ZIGZAG[i]] = v * (dq_dc if i == 0 else dq_ac)
        nz = True
        i += 1
    return coeffs, nz


def _encode_coeffs(be: BoolEncoder, probs, first: int, ctx: int, qcoeffs):
    """Encode one block's quantized coefficients (scan-order values) with
    the same band/context walk the decoder uses.  Returns any_nonzero."""
    last = -1
    for i in range(15, first - 1, -1):
        if qcoeffs[i]:
            last = i
            break
    i = first
    skip_eob = False
    while i < 16:
        p = probs[COEFF_BANDS[i]][ctx]
        if i > last:
            be.bool(0, p[0])  # EOB
            return last >= first
        if not skip_eob:
            be.bool(1, p[0])
        v = int(qcoeffs[i])
        if v == 0:
            be.bool(0, p[1])
            ctx = 0
            skip_eob = True
            i += 1
            continue
        be.bool(1, p[1])
        skip_eob = False
        a = abs(v)
        if a == 1:
            be.bool(0, p[2])
            ctx = 1
        else:
            be.bool(1, p[2])
            ctx = 2
            if a <= 4:
                be.bool(0, p[3])
                if a == 2:
                    be.bool(0, p[4])
                else:
                    be.bool(1, p[4])
                    be.bool(a - 3, p[5])
            else:
                be.bool(1, p[3])
                cat = 5
                while cat > 0 and a < _CAT_BASE[cat]:
                    cat -= 1
                if cat <= 1:
                    be.bool(0, p[6])
                    be.bool(cat, p[7])
                elif cat <= 3:
                    be.bool(1, p[6])
                    be.bool(0, p[8])
                    be.bool(cat - 2, p[9])
                else:
                    be.bool(1, p[6])
                    be.bool(1, p[8])
                    be.bool(cat - 4, p[10])
                extra = a - _CAT_BASE[cat]
                nb = len(_CAT_PROBS[cat])
                for k, ep in enumerate(_CAT_PROBS[cat]):
                    be.bool((extra >> (nb - 1 - k)) & 1, ep)
        be.bool(1 if v < 0 else 0, 128)
        i += 1
    return last >= first


# ---------------------------------------------------------------------------
# intra prediction (§12)


def _pred_mb(mode: int, plane, py: int, px: int, size: int):
    """Whole-MB prediction (16x16 luma / 8x8 chroma) into an int array.
    `plane` carries a 1-px border: row 0 = 127, col 0 = 129."""
    have_above = py > 1
    have_left = px > 1
    a = plane[py - 1, px:px + size].astype(np.int64)
    l = plane[py:py + size, px - 1].astype(np.int64)
    if mode == DC_PRED:
        shift = 4 if size == 16 else 3
        if have_above and have_left:
            dc = (int(a.sum()) + int(l.sum()) + size) >> (shift + 1)
        elif have_above:
            dc = (int(a.sum()) + size // 2) >> shift
        elif have_left:
            dc = (int(l.sum()) + size // 2) >> shift
        else:
            dc = 128
        return np.full((size, size), dc, dtype=np.int64)
    if mode == V_PRED:
        return np.tile(a, (size, 1))
    if mode == H_PRED:
        return np.tile(l[:, None], (1, size))
    tl = int(plane[py - 1, px - 1])
    return np.clip(l[:, None] + a[None, :] - tl, 0, 255)


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def _pred4(mode: int, A, L, P):
    """4x4 subblock prediction (§12.3).  A: 8 above pixels (A[4..7] =
    above-right), L: 4 left pixels, P: above-left pixel.  Plain ints."""
    b = [[0] * 4 for _ in range(4)]
    if mode == B_DC:
        dc = (A[0] + A[1] + A[2] + A[3] + L[0] + L[1] + L[2] + L[3] + 4) >> 3
        for r in range(4):
            for c in range(4):
                b[r][c] = dc
    elif mode == B_TM:
        for r in range(4):
            for c in range(4):
                v = L[r] + A[c] - P
                b[r][c] = 0 if v < 0 else (255 if v > 255 else v)
    elif mode == B_VE:
        row = (_avg3(P, A[0], A[1]), _avg3(A[0], A[1], A[2]),
               _avg3(A[1], A[2], A[3]), _avg3(A[2], A[3], A[4]))
        for r in range(4):
            b[r][:] = row
    elif mode == B_HE:
        col = (_avg3(P, L[0], L[1]), _avg3(L[0], L[1], L[2]),
               _avg3(L[1], L[2], L[3]), _avg3(L[2], L[3], L[3]))
        for r in range(4):
            for c in range(4):
                b[r][c] = col[r]
    elif mode == B_LD:
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    b[r][c] = _avg3(A[i], A[i + 1], A[i + 2])
                else:
                    b[r][c] = _avg3(A[6], A[7], A[7])
    elif mode == B_RD:
        e = (L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3])
        for r in range(4):
            for c in range(4):
                i = 4 + c - r
                b[r][c] = _avg3(e[i - 1], e[i], e[i + 1])
    elif mode == B_VR:
        e = (L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3])
        # diagonal index d = 2c - r; §12.3 reference pattern
        b[0][0] = _avg2(e[4], e[5]); b[0][1] = _avg2(e[5], e[6])
        b[0][2] = _avg2(e[6], e[7]); b[0][3] = _avg2(e[7], e[8])
        b[1][0] = _avg3(e[3], e[4], e[5]); b[1][1] = _avg3(e[4], e[5], e[6])
        b[1][2] = _avg3(e[5], e[6], e[7]); b[1][3] = _avg3(e[6], e[7], e[8])
        b[2][0] = _avg3(e[2], e[3], e[4]); b[2][1] = b[0][0]
        b[2][2] = b[0][1]; b[2][3] = b[0][2]
        b[3][0] = _avg3(e[1], e[2], e[3]); b[3][1] = b[1][0]
        b[3][2] = b[1][1]; b[3][3] = b[1][2]
    elif mode == B_VL:
        b[0][0] = _avg2(A[0], A[1]); b[0][1] = _avg2(A[1], A[2])
        b[0][2] = _avg2(A[2], A[3]); b[0][3] = _avg2(A[3], A[4])
        b[1][0] = _avg3(A[0], A[1], A[2]); b[1][1] = _avg3(A[1], A[2], A[3])
        b[1][2] = _avg3(A[2], A[3], A[4]); b[1][3] = _avg3(A[3], A[4], A[5])
        b[2][0] = b[0][1]; b[2][1] = b[0][2]
        b[2][2] = b[0][3]; b[2][3] = _avg3(A[4], A[5], A[6])
        b[3][0] = b[1][1]; b[3][1] = b[1][2]
        b[3][2] = b[1][3]; b[3][3] = _avg3(A[5], A[6], A[7])
    elif mode == B_HD:
        e = (L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3])
        b[3][0] = _avg2(e[0], e[1]); b[3][1] = _avg3(e[0], e[1], e[2])
        b[2][0] = _avg2(e[1], e[2]); b[2][1] = _avg3(e[1], e[2], e[3])
        b[3][2] = b[2][0]; b[3][3] = b[2][1]
        b[1][0] = _avg2(e[2], e[3]); b[1][1] = _avg3(e[2], e[3], e[4])
        b[2][2] = b[1][0]; b[2][3] = b[1][1]
        b[0][0] = _avg2(e[3], e[4]); b[0][1] = _avg3(e[3], e[4], e[5])
        b[1][2] = b[0][0]; b[1][3] = b[0][1]
        b[0][2] = _avg3(e[4], e[5], e[6]); b[0][3] = _avg3(e[5], e[6], e[7])
    else:  # B_HU
        b[0][0] = _avg2(L[0], L[1]); b[0][1] = _avg3(L[0], L[1], L[2])
        b[0][2] = _avg2(L[1], L[2]); b[0][3] = _avg3(L[1], L[2], L[3])
        b[1][0] = b[0][2]; b[1][1] = b[0][3]
        b[1][2] = _avg2(L[2], L[3]); b[1][3] = _avg3(L[2], L[3], L[3])
        b[2][0] = b[1][2]; b[2][1] = b[1][3]
        b[2][2] = L[3]; b[2][3] = L[3]
        b[3][0] = L[3]; b[3][1] = L[3]; b[3][2] = L[3]; b[3][3] = L[3]
    return np.asarray(b, dtype=np.int64)


# ---------------------------------------------------------------------------
# loop filter (§15) — vectorized: one numpy call per 16/8-pixel edge.
# Signed arithmetic around 128 with int32 lanes; every clamp/shift matches
# the reference scalar semantics bit-for-bit (conformance-gated).


def _filter_edge(seg: np.ndarray, kind: str, hev_t: int,
                 interior: int, edge: int) -> np.ndarray:
    """seg: (n, 8) int32 pixel columns [p3 p2 p1 p0 q0 q1 q2 q3] in
    0..255.  Returns the filtered (n, 8) array.  kind: 'mb' (macroblock
    edge, 6-tap), 'sub' (subblock edge, 4-tap), 'simple' (luma-only)."""
    p3, p2, p1, p0 = seg[:, 0], seg[:, 1], seg[:, 2], seg[:, 3]
    q0, q1, q2, q3 = seg[:, 4], seg[:, 5], seg[:, 6], seg[:, 7]
    base = np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= edge
    if kind == "simple":
        mask = base
    else:
        mask = (base
                & (np.abs(p3 - p2) <= interior) & (np.abs(p2 - p1) <= interior)
                & (np.abs(p1 - p0) <= interior) & (np.abs(q1 - q0) <= interior)
                & (np.abs(q2 - q1) <= interior) & (np.abs(q3 - q2) <= interior))
    if not mask.any():
        return seg
    hev = (np.abs(p1 - p0) > hev_t) | (np.abs(q1 - q0) > hev_t)

    def c(v):
        return np.maximum(np.minimum(v, 127), -128)

    P2, P1, P0 = p2 - 128, p1 - 128, p0 - 128
    Q0, Q1, Q2 = q0 - 128, q1 - 128, q2 - 128
    out = seg.copy()

    def common(outer_mask, apply_mask):
        # §15.2 common_adjust: returns F; updates p0/q0 where apply_mask
        a = c(np.where(outer_mask, c(P1 - Q1), 0) + 3 * (Q0 - P0))
        F = c(a + 4) >> 3
        E = c(a + 3) >> 3
        out[:, 4] = np.where(apply_mask, c(Q0 - F) + 128, out[:, 4])
        out[:, 3] = np.where(apply_mask, c(P0 + E) + 128, out[:, 3])
        return F

    if kind == "simple":
        common(np.ones_like(mask), mask)
        return out
    if kind == "sub":
        F = common(hev, mask)
        a2 = (F + 1) >> 1
        soft = mask & ~hev
        out[:, 5] = np.where(soft, c(Q1 - a2) + 128, out[:, 5])
        out[:, 2] = np.where(soft, c(P1 + a2) + 128, out[:, 2])
        return out
    # 'mb': 6-tap where not hev, common_adjust where hev (§15.3)
    w = c(c(P1 - Q1) + 3 * (Q0 - P0))
    soft = mask & ~hev
    a27 = c((27 * w + 63) >> 7)
    a18 = c((18 * w + 63) >> 7)
    a9 = c((9 * w + 63) >> 7)
    out[:, 4] = np.where(soft, c(Q0 - a27) + 128, out[:, 4])
    out[:, 3] = np.where(soft, c(P0 + a27) + 128, out[:, 3])
    out[:, 5] = np.where(soft, c(Q1 - a18) + 128, out[:, 5])
    out[:, 2] = np.where(soft, c(P1 + a18) + 128, out[:, 2])
    out[:, 6] = np.where(soft, c(Q2 - a9) + 128, out[:, 6])
    out[:, 1] = np.where(soft, c(P2 + a9) + 128, out[:, 1])
    common(np.ones_like(mask), mask & hev)
    return out


def _v_edge(plane: np.ndarray, r0: int, n: int, x: int, kind: str,
            hev_t: int, interior: int, edge: int) -> None:
    seg = plane[r0:r0 + n, x - 4:x + 4].astype(np.int32)
    plane[r0:r0 + n, x - 4:x + 4] = _filter_edge(
        seg, kind, hev_t, interior, edge).astype(np.uint8)


def _h_edge(plane: np.ndarray, c0: int, n: int, y: int, kind: str,
            hev_t: int, interior: int, edge: int) -> None:
    seg = plane[y - 4:y + 4, c0:c0 + n].T.astype(np.int32)
    plane[y - 4:y + 4, c0:c0 + n] = _filter_edge(
        seg, kind, hev_t, interior, edge).astype(np.uint8).T


class _FilterParams:
    __slots__ = ("level", "interior", "mb_edge", "sub_edge", "hev")

    def __init__(self, level: int, sharpness: int):
        self.level = level
        interior = level
        if sharpness:
            interior >>= 2 if sharpness > 4 else 1
            if interior > 9 - sharpness:
                interior = 9 - sharpness
        if interior < 1:
            interior = 1
        self.interior = interior
        self.mb_edge = (level + 2) * 2 + interior
        self.sub_edge = level * 2 + interior
        self.hev = 2 if level >= 40 else (1 if level >= 15 else 0)  # key frame


# ---------------------------------------------------------------------------
# decoder


class VP8Frame:
    """Decoded key frame: cropped Y/U/V planes + geometry."""

    __slots__ = ("width", "height", "y", "u", "v")

    def __init__(self, width, height, y, u, v):
        self.width = width
        self.height = height
        self.y = y
        self.u = u
        self.v = v

    def rgb(self) -> np.ndarray:
        return yuv420_to_rgb(self.y, self.u, self.v)


def decode_vp8(data: bytes) -> VP8Frame:
    """Decode one VP8 key frame (payload of a `VP8 ` WebP chunk)."""
    if len(data) < 10:
        raise ValueError("VP8 frame too short")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise NotImplementedError("VP8 interframe (stills are key frames)")
    part0_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    width = struct.unpack_from("<H", data, 6)[0] & 0x3FFF
    height = struct.unpack_from("<H", data, 8)[0] & 0x3FFF
    if not width or not height:
        raise ValueError("empty VP8 frame")

    bd = BoolDecoder(data[10:10 + part0_size])
    bd.bool(128)  # color space
    bd.bool(128)  # clamping type

    # segmentation header (§9.3)
    seg_enabled = bd.bool(128)
    seg_update_map = 0
    seg_abs = 0
    seg_q = [0, 0, 0, 0]
    seg_lf = [0, 0, 0, 0]
    seg_tree_probs = [255, 255, 255]
    if seg_enabled:
        seg_update_map = bd.bool(128)
        update_data = bd.bool(128)
        if update_data:
            seg_abs = bd.bool(128)
            for i in range(4):
                if bd.bool(128):
                    seg_q[i] = bd.signed_literal(7)
            for i in range(4):
                if bd.bool(128):
                    seg_lf[i] = bd.signed_literal(6)
        if seg_update_map:
            for i in range(3):
                if bd.bool(128):
                    seg_tree_probs[i] = bd.literal(8)

    # loop filter header (§9.4)
    filter_type = bd.bool(128)  # 0 normal, 1 simple
    filter_level = bd.literal(6)
    sharpness = bd.literal(3)
    lf_delta_enabled = bd.bool(128)
    ref_lf_delta = [0, 0, 0, 0]
    mode_lf_delta = [0, 0, 0, 0]
    if lf_delta_enabled:
        if bd.bool(128):
            for i in range(4):
                if bd.bool(128):
                    ref_lf_delta[i] = bd.signed_literal(6)
            for i in range(4):
                if bd.bool(128):
                    mode_lf_delta[i] = bd.signed_literal(6)

    # token partitions (§9.5)
    n_parts = 1 << bd.literal(2)
    part_start = 10 + part0_size
    off = part_start + (n_parts - 1) * 3
    token_bds = []
    for i in range(n_parts):
        if i < n_parts - 1:
            sz = (data[part_start + 3 * i]
                  | (data[part_start + 3 * i + 1] << 8)
                  | (data[part_start + 3 * i + 2] << 16))
        else:
            sz = len(data) - off
        token_bds.append(BoolDecoder(data[off:off + sz]))
        off += sz

    # quantizer header (§9.6)
    y_ac_qi = bd.literal(7)
    ydc_d = bd.signed_literal(4) if bd.bool(128) else 0
    y2dc_d = bd.signed_literal(4) if bd.bool(128) else 0
    y2ac_d = bd.signed_literal(4) if bd.bool(128) else 0
    uvdc_d = bd.signed_literal(4) if bd.bool(128) else 0
    uvac_d = bd.signed_literal(4) if bd.bool(128) else 0
    quants = []
    for s in range(4):
        q = (seg_q[s] if seg_abs else y_ac_qi + seg_q[s]) if seg_enabled else y_ac_qi
        quants.append(_Quant(_clip(q), ydc_d, y2dc_d, y2ac_d, uvdc_d, uvac_d))

    bd.bool(128)  # refresh entropy probs (no-op for stills)

    # coefficient probability updates (§13.4)
    coeff_probs = [[[list(DEFAULT_COEFF_PROBS[((t * 8 + b) * 3 + c) * 11:
                                              ((t * 8 + b) * 3 + c) * 11 + 11])
                     for c in range(3)] for b in range(8)] for t in range(4)]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                base = ((t * 8 + b) * 3 + c) * 11
                for k in range(11):
                    if bd.bool(COEFF_UPDATE_PROBS[base + k]):
                        coeff_probs[t][b][c][k] = bd.literal(8)

    mb_no_skip = bd.bool(128)
    prob_skip_false = bd.literal(8) if mb_no_skip else 0

    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16

    # ---- pass 1: per-MB modes (all of partition 0)
    ymodes = np.zeros((mb_h, mb_w), dtype=np.int32)
    uvmodes = np.zeros((mb_h, mb_w), dtype=np.int32)
    segments = np.zeros((mb_h, mb_w), dtype=np.int32)
    skip_flag = np.zeros((mb_h, mb_w), dtype=np.int32)
    bmodes = np.zeros((mb_h, mb_w, 16), dtype=np.int32)
    above_bm = np.full((mb_w, 4), B_DC, dtype=np.int32)
    for my in range(mb_h):
        left_bm = np.full(4, B_DC, dtype=np.int32)
        for mx in range(mb_w):
            if seg_enabled and seg_update_map:
                segments[my, mx] = bd.tree(MB_SEGMENT_TREE, seg_tree_probs)
            if mb_no_skip:
                skip_flag[my, mx] = bd.bool(prob_skip_false)
            ym = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            ymodes[my, mx] = ym
            if ym == B_PRED:
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    a = bmodes[my, mx, sb - 4] if r else above_bm[mx, c]
                    l = bmodes[my, mx, sb - 1] if c else left_bm[r]
                    base = (a * 10 + l) * 9
                    m = bd.tree(BMODE_TREE, KF_BMODE_PROBS[base:base + 9])
                    bmodes[my, mx, sb] = m
                above_bm[mx] = bmodes[my, mx, 12:16]
                left_bm[:] = bmodes[my, mx, 3::4]
            else:
                # non-split MBs contribute a fixed submode to B contexts
                fill = (B_DC, B_VE, B_HE, B_TM)[ym]
                bmodes[my, mx, :] = fill
                above_bm[mx] = fill
                left_bm[:] = fill
            uvmodes[my, mx] = bd.tree(UV_MODE_TREE, KF_UVMODE_PROBS)

    # ---- pass 2: tokens + reconstruction
    W16, H16 = mb_w * 16, mb_h * 16
    # planes with a 1-px top/left border: row 0 = 127, col 0 = 129
    Y = np.empty((H16 + 1, W16 + 1), dtype=np.uint8)
    U = np.empty((H16 // 2 + 1, W16 // 2 + 1), dtype=np.uint8)
    V = np.empty_like(U)
    for P in (Y, U, V):
        P[0, :] = 127
        P[:, 0] = 129
        P[0, 0] = 127  # top-left corner of the frame follows the top row

    above_nz_y = np.zeros((mb_w, 4), dtype=np.int32)
    above_nz_u = np.zeros((mb_w, 2), dtype=np.int32)
    above_nz_v = np.zeros((mb_w, 2), dtype=np.int32)
    above_nz_y2 = np.zeros(mb_w, dtype=np.int32)
    mb_inner_filter = np.zeros((mb_h, mb_w), dtype=bool)

    # debugging/introspection hook (used by conformance tests to localize
    # divergence: header fields + per-MB modes of the last decoded frame)
    _LAST_DEBUG.clear()
    _LAST_DEBUG.update(dict(
        filter_type=filter_type, filter_level=filter_level,
        sharpness=sharpness, lf_delta=lf_delta_enabled,
        ref_lf_delta=ref_lf_delta, mode_lf_delta=mode_lf_delta,
        seg_enabled=seg_enabled, y_ac_qi=y_ac_qi, n_parts=n_parts,
        ymodes=ymodes, uvmodes=uvmodes, bmodes=bmodes,
        skip_flag=skip_flag, mb_no_skip=mb_no_skip))

    for my in range(mb_h):
        tbd = token_bds[my % n_parts]
        left_nz_y = [0, 0, 0, 0]
        left_nz_u = [0, 0]
        left_nz_v = [0, 0]
        left_nz_y2 = 0
        for mx in range(mb_w):
            q = quants[segments[my, mx]]
            ym = ymodes[my, mx]
            have_y2 = ym != B_PRED
            skipped = bool(skip_flag[my, mx])
            y_blocks = [[0] * 16 for _ in range(16)]
            u_blocks = [[0] * 16 for _ in range(4)]
            v_blocks = [[0] * 16 for _ in range(4)]
            any_nz = False
            if skipped:
                left_nz_y[:] = [0, 0, 0, 0]
                above_nz_y[mx, :] = 0
                left_nz_u[:] = [0, 0]
                above_nz_u[mx, :] = 0
                left_nz_v[:] = [0, 0]
                above_nz_v[mx, :] = 0
                if have_y2:
                    left_nz_y2 = 0
                    above_nz_y2[mx] = 0
            else:
                if have_y2:
                    ctx = left_nz_y2 + above_nz_y2[mx]
                    coeffs, nz = _decode_coeffs(tbd, coeff_probs[1], 0, ctx,
                                                q.y2dc, q.y2ac)
                    left_nz_y2 = above_nz_y2[mx] = int(nz)
                    any_nz |= nz
                    ydc = iwht4x4(coeffs)
                plane_t = 0 if have_y2 else 3
                first = 1 if have_y2 else 0
                a_nz = above_nz_y[mx]
                l_nz = left_nz_y
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    coeffs, nz = _decode_coeffs(tbd, coeff_probs[plane_t],
                                                first, a_nz[c] + l_nz[r],
                                                q.y1dc, q.y1ac)
                    if have_y2:
                        coeffs[0] = ydc[sb]
                        nzf = int(nz or coeffs[0] != 0)
                    else:
                        nzf = int(nz)
                    any_nz |= nz
                    a_nz[c] = l_nz[r] = int(nz)
                    y_blocks[sb] = coeffs
                for blocks, probsuv, a_nzuv, l_nzuv in (
                        (u_blocks, coeff_probs[2], above_nz_u[mx], left_nz_u),
                        (v_blocks, coeff_probs[2], above_nz_v[mx], left_nz_v)):
                    for sb in range(4):
                        r, c = sb >> 1, sb & 1
                        coeffs, nz = _decode_coeffs(tbd, probsuv, 0,
                                                    a_nzuv[c] + l_nzuv[r],
                                                    q.uvdc, q.uvac)
                        any_nz |= nz
                        a_nzuv[c] = l_nzuv[r] = int(nz)
                        blocks[sb] = coeffs

            mb_inner_filter[my, mx] = (not skipped and any_nz) or ym == B_PRED

            # ---- reconstruct: luma
            py, px = 1 + my * 16, 1 + mx * 16
            if ym == B_PRED:
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    by, bx = py + r * 4, px + c * 4
                    Arow = Y[by - 1, bx:bx + 4].astype(np.int64)
                    if c < 3:
                        Aright = Y[by - 1, bx + 4:bx + 8].astype(np.int64)
                    elif mx == mb_w - 1 or r > 0:
                        # §12.3: right-column subblocks reuse the above-MB
                        # row; at the frame edge replicate its last pixel
                        if mx == mb_w - 1:
                            Aright = np.full(4, int(Y[py - 1, px + 15]),
                                             dtype=np.int64)
                        else:
                            Aright = Y[py - 1, px + 16:px + 20].astype(np.int64)
                    else:
                        Aright = Y[py - 1, px + 16:px + 20].astype(np.int64)
                    A = list(map(int, Arow)) + list(map(int, Aright))
                    L = [int(Y[by + i, bx - 1]) for i in range(4)]
                    Pp = int(Y[by - 1, bx - 1])
                    pred = _pred4(bmodes[my, mx, sb], A, L, Pp)
                    res = idct4x4(y_blocks[sb])
                    Y[by:by + 4, bx:bx + 4] = np.clip(pred + res, 0, 255)
            else:
                pred = _pred_mb(ym, Y, py, px, 16)
                out = pred.copy()
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    res = idct4x4(y_blocks[sb])
                    out[r * 4:r * 4 + 4, c * 4:c * 4 + 4] += res
                Y[py:py + 16, px:px + 16] = np.clip(out, 0, 255)

            # ---- reconstruct: chroma
            cy, cx = 1 + my * 8, 1 + mx * 8
            um = uvmodes[my, mx]
            for blocks, P in ((u_blocks, U), (v_blocks, V)):
                pred = _pred_mb(um, P, cy, cx, 8)
                out = pred.copy()
                for sb in range(4):
                    r, c = sb >> 1, sb & 1
                    res = idct4x4(blocks[sb])
                    out[r * 4:r * 4 + 4, c * 4:c * 4 + 4] += res
                P[cy:cy + 8, cx:cx + 8] = np.clip(out, 0, 255)

    # ---- loop filter (§15), in MB raster order over the borderless view
    if filter_level:
        Yv = Y[1:, 1:]
        Uv = U[1:, 1:]
        Vv = V[1:, 1:]
        for my in range(mb_h):
            for mx in range(mb_w):
                level = filter_level
                if seg_enabled:
                    level = seg_lf[segments[my, mx]] if seg_abs \
                        else filter_level + seg_lf[segments[my, mx]]
                if lf_delta_enabled:
                    level += ref_lf_delta[0]  # intra frame
                    if ymodes[my, mx] == B_PRED:
                        level += mode_lf_delta[0]
                level = _clip(level, 63)
                if level == 0:
                    continue
                fp = _FilterParams(level, sharpness)
                inner = bool(mb_inner_filter[my, mx])
                _filter_mb(Yv, Uv, Vv, my, mx, fp, filter_type, inner,
                           mb_w, mb_h)

    y = Y[1:1 + height, 1:1 + width].copy()
    u = U[1:1 + (height + 1) // 2, 1:1 + (width + 1) // 2].copy()
    v = V[1:1 + (height + 1) // 2, 1:1 + (width + 1) // 2].copy()
    return VP8Frame(width, height, y, u, v)


def _filter_mb(Y, U, V, my, mx, fp, filter_type, inner, mb_w, mb_h):
    """Apply the loop filter to one macroblock (§15.1 ordering: left MB
    edge, inner vertical edges, top MB edge, inner horizontal edges) —
    each edge is ONE vectorized call over its 16/8 pixel lanes."""
    py, px = my * 16, mx * 16
    cy, cx = my * 8, mx * 8
    hev, interior = fp.hev, fp.interior

    if filter_type == 1:  # simple: luma only
        if mx > 0:
            _v_edge(Y, py, 16, px, "simple", hev, interior, fp.mb_edge)
        if inner:
            for x0 in (4, 8, 12):
                _v_edge(Y, py, 16, px + x0, "simple", hev, interior,
                        fp.sub_edge)
        if my > 0:
            _h_edge(Y, px, 16, py, "simple", hev, interior, fp.mb_edge)
        if inner:
            for y0 in (4, 8, 12):
                _h_edge(Y, px, 16, py + y0, "simple", hev, interior,
                        fp.sub_edge)
        return

    if mx > 0:
        _v_edge(Y, py, 16, px, "mb", hev, interior, fp.mb_edge)
        _v_edge(U, cy, 8, cx, "mb", hev, interior, fp.mb_edge)
        _v_edge(V, cy, 8, cx, "mb", hev, interior, fp.mb_edge)
    if inner:
        for x0 in (4, 8, 12):
            _v_edge(Y, py, 16, px + x0, "sub", hev, interior, fp.sub_edge)
        _v_edge(U, cy, 8, cx + 4, "sub", hev, interior, fp.sub_edge)
        _v_edge(V, cy, 8, cx + 4, "sub", hev, interior, fp.sub_edge)
    if my > 0:
        _h_edge(Y, px, 16, py, "mb", hev, interior, fp.mb_edge)
        _h_edge(U, cx, 8, cy, "mb", hev, interior, fp.mb_edge)
        _h_edge(V, cx, 8, cy, "mb", hev, interior, fp.mb_edge)
    if inner:
        for y0 in (4, 8, 12):
            _h_edge(Y, px, 16, py + y0, "sub", hev, interior, fp.sub_edge)
        _h_edge(U, cx, 8, cy + 4, "sub", hev, interior, fp.sub_edge)
        _h_edge(V, cx, 8, cy + 4, "sub", hev, interior, fp.sub_edge)


# ---------------------------------------------------------------------------
# encoder (simple-profile subset: intra 16x16 + chroma, 1 partition,
# default probabilities, loop filter level 0)


def encode_vp8(rgb: np.ndarray, qindex: int = 20, **opts) -> bytes:
    """Encode an RGB image as a VP8 key frame.  qindex 0..127 selects the
    quantizer (lower = better).  Returns the raw VP8 frame payload."""
    y, u, v = rgb_to_yuv420(np.asarray(rgb))
    return encode_vp8_yuv(y, u, v, qindex=qindex, **opts)


def encode_vp8_yuv(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                   qindex: int = 20, *, filter_level: int = 0,
                   filter_type: int = 0, sharpness: int = 0,
                   n_partitions: int = 1) -> bytes:
    """Encode YUV420 planes as a VP8 key frame.  filter_level/type/
    sharpness set the in-loop filter the DECODER applies (intra
    prediction is normatively pre-filter, so the encoder loop is
    unchanged); n_partitions (1/2/4/8) splits token rows across
    partitions for parallel decode."""
    if n_partitions not in (1, 2, 4, 8):
        raise ValueError("n_partitions must be 1, 2, 4 or 8")
    height, width = y.shape
    if width >= 1 << 14 or height >= 1 << 14:
        raise ValueError("VP8 dimensions are 14-bit")
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    W16, H16 = mb_w * 16, mb_h * 16
    q = _Quant(_clip(qindex))

    # padded reconstruction planes with 127/129 borders (same as decoder)
    Y = np.empty((H16 + 1, W16 + 1), dtype=np.uint8)
    U = np.empty((H16 // 2 + 1, W16 // 2 + 1), dtype=np.uint8)
    V = np.empty_like(U)
    for P in (Y, U, V):
        P[0, :] = 127
        P[:, 0] = 129
        P[0, 0] = 129

    def _pad(src, Wp, Hp):
        out = np.empty((Hp, Wp), dtype=np.uint8)
        h, w = src.shape
        out[:h, :w] = src
        out[:h, w:] = src[:, w - 1:w]
        out[h:, :] = out[h - 1:h, :]
        return out

    ysrc = _pad(y, W16, H16)
    usrc = _pad(u, W16 // 2, H16 // 2)
    vsrc = _pad(v, W16 // 2, H16 // 2)

    # ---- per-MB encode: choose modes, transform, quantize, reconstruct
    n_mb = mb_h * mb_w
    mb_ymode = np.zeros(n_mb, dtype=np.int32)
    mb_uvmode = np.zeros(n_mb, dtype=np.int32)
    mb_skip = np.zeros(n_mb, dtype=np.int32)
    mb_tokens = []  # (y2_q, y_qs[16], u_qs[4], v_qs[4]) scan-order lists

    def quantize(coeffs, dc_q, ac_q, first=0):
        qs = [0] * 16
        for i in range(first, 16):
            val = int(coeffs[ZIGZAG[i]])
            dq = dc_q if i == 0 else ac_q
            qv = abs(val) // dq
            if qv > 2047 + 67 - 1:
                qv = 2047 + 66  # cat6 11-bit extra cap
            qs[i] = -qv if val < 0 else qv
        return qs

    for my in range(mb_h):
        for mx in range(mb_w):
            py, px = 1 + my * 16, 1 + mx * 16
            cy, cx = 1 + my * 8, 1 + mx * 8
            tgt = ysrc[py - 1:py + 15, px - 1:px + 15]  # unused; kept simple
            src_y = ysrc[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16].astype(np.int64)
            # pick the 16x16 mode with least SAD vs source
            best, best_mode, best_pred = None, DC_PRED, None
            for m in (DC_PRED, V_PRED, H_PRED, TM_PRED):
                pred = _pred_mb(m, Y, py, px, 16)
                sad = int(np.abs(src_y - pred).sum())
                if best is None or sad < best:
                    best, best_mode, best_pred = sad, m, pred
            mb_ymode[my * mb_w + mx] = best_mode
            resid = src_y - best_pred

            y_qs = [None] * 16
            dcs = np.zeros(16, dtype=np.int64)
            y_coeffs = [None] * 16
            for sb in range(16):
                r, c = sb >> 2, sb & 3
                blk = resid[r * 4:r * 4 + 4, c * 4:c * 4 + 4]
                coeffs = fdct4x4(blk)
                dcs[sb] = coeffs[0]
                y_coeffs[sb] = coeffs
            y2 = fwht4x4(dcs)
            y2_q = quantize(_scan_to_raster(y2), q.y2dc, q.y2ac)
            # reconstruct DCs the decoder will see
            y2_deq = [y2_q[i] * (q.y2dc if i == 0 else q.y2ac)
                      for i in range(16)]
            y2_deq_raster = [0] * 16
            for i in range(16):
                y2_deq_raster[ZIGZAG[i]] = y2_deq[i]
            dec_dcs = iwht4x4(y2_deq_raster)

            out = best_pred.copy()
            for sb in range(16):
                r, c = sb >> 2, sb & 3
                qs = quantize(y_coeffs[sb], q.y1dc, q.y1ac, first=1)
                y_qs[sb] = qs
                deq = [0] * 16
                for i in range(1, 16):
                    deq[ZIGZAG[i]] = qs[i] * q.y1ac
                deq[0] = dec_dcs[sb]
                res = idct4x4(deq)
                out[r * 4:r * 4 + 4, c * 4:c * 4 + 4] += res
            Y[py:py + 16, px:px + 16] = np.clip(out, 0, 255)

            # chroma (DC mode choice among the 4)
            src_u = usrc[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8].astype(np.int64)
            src_v = vsrc[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8].astype(np.int64)
            bestc, bestc_mode = None, DC_PRED
            for m in (DC_PRED, V_PRED, H_PRED, TM_PRED):
                pu = _pred_mb(m, U, cy, cx, 8)
                pv = _pred_mb(m, V, cy, cx, 8)
                sad = int(np.abs(src_u - pu).sum()) + int(np.abs(src_v - pv).sum())
                if bestc is None or sad < bestc:
                    bestc, bestc_mode = sad, m
            mb_uvmode[my * mb_w + mx] = bestc_mode
            u_qs, v_qs = [], []
            for (srcp, P, oy, ox, qs_out) in ((src_u, U, cy, cx, u_qs),
                                              (src_v, V, cy, cx, v_qs)):
                pred = _pred_mb(bestc_mode, P, oy, ox, 8)
                residc = srcp - pred
                out = pred.copy()
                for sb in range(4):
                    r, c = sb >> 1, sb & 1
                    blk = residc[r * 4:r * 4 + 4, c * 4:c * 4 + 4]
                    coeffs = fdct4x4(blk)
                    qs = quantize(coeffs, q.uvdc, q.uvac)
                    qs_out.append(qs)
                    deq = [0] * 16
                    for i in range(16):
                        deq[ZIGZAG[i]] = qs[i] * (q.uvdc if i == 0 else q.uvac)
                    res = idct4x4(deq)
                    out[r * 4:r * 4 + 4, c * 4:c * 4 + 4] += res
                P[oy:oy + 8, ox:ox + 8] = np.clip(out, 0, 255)

            has = any(v_ != 0 for v_ in y2_q) or \
                any(any(v_ != 0 for v_ in qs) for qs in y_qs) or \
                any(any(v_ != 0 for v_ in qs) for qs in u_qs + v_qs)
            mb_skip[my * mb_w + mx] = 0 if has else 1
            mb_tokens.append((y2_q, y_qs, u_qs, v_qs))

    # ---- headers (partition 0)
    be = BoolEncoder()
    be.bool(0, 128)  # color space
    be.bool(0, 128)  # clamping
    be.bool(0, 128)  # segmentation disabled
    be.bool(filter_type & 1, 128)  # filter type (0 normal, 1 simple)
    be.literal(_clip(filter_level, 63), 6)
    be.literal(_clip(sharpness, 7), 3)
    be.bool(0, 128)  # no lf deltas
    be.literal({1: 0, 2: 1, 4: 2, 8: 3}[n_partitions], 2)
    be.literal(_clip(qindex), 7)
    for _ in range(5):
        be.bool(0, 128)  # no quantizer deltas
    be.bool(1, 128)  # refresh entropy probs
    for t in range(4):
        for b in range(8):
            for c in range(3):
                base = ((t * 8 + b) * 3 + c) * 11
                for k in range(11):
                    be.bool(0, COEFF_UPDATE_PROBS[base + k])  # keep defaults
    be.bool(1, 128)  # mb_no_coeff_skip enabled
    prob_skip_false = 128
    be.literal(prob_skip_false, 8)

    for my in range(mb_h):
        for mx in range(mb_w):
            i = my * mb_w + mx
            be.bool(int(mb_skip[i]), prob_skip_false)
            be.tree(KF_YMODE_TREE, KF_YMODE_PROBS, int(mb_ymode[i]))
            be.tree(UV_MODE_TREE, KF_UVMODE_PROBS, int(mb_uvmode[i]))
    part0 = be.done()

    # ---- token partitions (MB row r goes to partition r % n)
    te_parts = [BoolEncoder() for _ in range(n_partitions)]
    probs = [[[list(DEFAULT_COEFF_PROBS[((t * 8 + b) * 3 + c) * 11:
                                        ((t * 8 + b) * 3 + c) * 11 + 11])
               for c in range(3)] for b in range(8)] for t in range(4)]
    above_nz_y = np.zeros((mb_w, 4), dtype=np.int32)
    above_nz_u = np.zeros((mb_w, 2), dtype=np.int32)
    above_nz_v = np.zeros((mb_w, 2), dtype=np.int32)
    above_nz_y2 = np.zeros(mb_w, dtype=np.int32)
    for my in range(mb_h):
        te = te_parts[my % n_partitions]
        left_nz_y = [0, 0, 0, 0]
        left_nz_u = [0, 0]
        left_nz_v = [0, 0]
        left_nz_y2 = 0
        for mx in range(mb_w):
            i = my * mb_w + mx
            y2_q, y_qs, u_qs, v_qs = mb_tokens[i]
            if mb_skip[i]:
                left_nz_y[:] = [0, 0, 0, 0]
                above_nz_y[mx, :] = 0
                left_nz_u[:] = [0, 0]
                above_nz_u[mx, :] = 0
                left_nz_v[:] = [0, 0]
                above_nz_v[mx, :] = 0
                left_nz_y2 = 0
                above_nz_y2[mx] = 0
                continue
            ctx = left_nz_y2 + above_nz_y2[mx]
            nz = _encode_coeffs(te, probs[1], 0, ctx, y2_q)
            left_nz_y2 = above_nz_y2[mx] = int(nz)
            a_nz = above_nz_y[mx]
            for sb in range(16):
                r, c = sb >> 2, sb & 3
                nz = _encode_coeffs(te, probs[0], 1,
                                    a_nz[c] + left_nz_y[r], y_qs[sb])
                a_nz[c] = left_nz_y[r] = int(nz)
            for qs_list, a_nzuv, l_nzuv in ((u_qs, above_nz_u[mx], left_nz_u),
                                            (v_qs, above_nz_v[mx], left_nz_v)):
                for sb in range(4):
                    r, c = sb >> 1, sb & 1
                    nz = _encode_coeffs(te, probs[2], 0,
                                        a_nzuv[c] + l_nzuv[r], qs_list[sb])
                    a_nzuv[c] = l_nzuv[r] = int(nz)
    token_parts = [te.done() for te in te_parts]
    sizes = b"".join(struct.pack("<I", len(p))[:3] for p in token_parts[:-1])

    tag = (len(part0) << 5) | (1 << 4) | (0 << 1) | 0  # show_frame, v0, key
    head = bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    head += b"\x9d\x01\x2a"
    head += struct.pack("<HH", width, height)
    return head + part0 + sizes + b"".join(token_parts)


def _scan_to_raster(coeffs):
    """fdct/fwht output is raster order; quantize() reads raster via
    ZIGZAG, so this is the identity — kept for call-site clarity."""
    return coeffs


# ---------------------------------------------------------------------------
# RIFF container + colorspace


def encode_webp_vp8(rgb: np.ndarray, qindex: int = 20, **opts) -> bytes:
    """RGB -> RIFF/WEBP file bytes with a lossy `VP8 ` payload.  Extra
    options (filter_level, filter_type, sharpness, n_partitions) pass
    through to :func:`encode_vp8_yuv`."""
    payload = encode_vp8(rgb, qindex=qindex, **opts)
    if len(payload) & 1:
        payload += b"\x00"
    riff = b"WEBP" + b"VP8 " + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_webp_vp8(data: bytes) -> VP8Frame:
    """RIFF/WEBP bytes with a `VP8 ` chunk -> decoded frame."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if tag == b"VP8 ":
            return decode_vp8(data[pos + 8:pos + 8 + size])
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8 chunk")


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """BT.601 studio-range YUV420 -> RGB888 (2x2 chroma replication)."""
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w].astype(np.float64)
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w].astype(np.float64)
    yf = (y.astype(np.float64) - 16.0) * 1.164
    rf = yf + 1.596 * (vv - 128.0)
    gf = yf - 0.813 * (vv - 128.0) - 0.391 * (uu - 128.0)
    bf = yf + 2.018 * (uu - 128.0)
    out = np.stack([rf, gf, bf], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def rgb_to_yuv420(rgb: np.ndarray):
    """RGB888 -> BT.601 studio-range YUV420 (libwebp's integer matrix,
    2x2 box-filtered chroma)."""
    rgb = np.asarray(rgb)
    if rgb.ndim == 2:
        rgb = np.stack([rgb] * 3, axis=-1)
    if rgb.shape[2] == 4:
        rgb = rgb[:, :, :3]
    r = rgb[:, :, 0].astype(np.int32)
    g = rgb[:, :, 1].astype(np.int32)
    b = rgb[:, :, 2].astype(np.int32)
    y = (66 * r + 129 * g + 25 * b + 128 + (16 << 8)) >> 8
    h, w = r.shape
    he, we = (h + 1) & ~1, (w + 1) & ~1
    rp = np.pad(r, ((0, he - h), (0, we - w)), mode="edge")
    gp = np.pad(g, ((0, he - h), (0, we - w)), mode="edge")
    bp = np.pad(b, ((0, he - h), (0, we - w)), mode="edge")
    r2 = (rp[0::2, 0::2] + rp[0::2, 1::2] + rp[1::2, 0::2] + rp[1::2, 1::2] + 2) >> 2
    g2 = (gp[0::2, 0::2] + gp[0::2, 1::2] + gp[1::2, 0::2] + gp[1::2, 1::2] + 2) >> 2
    b2 = (bp[0::2, 0::2] + bp[0::2, 1::2] + bp[1::2, 0::2] + bp[1::2, 1::2] + 2) >> 2
    u = (-38 * r2 - 74 * g2 + 112 * b2 + 128 + (128 << 8)) >> 8
    v = (112 * r2 - 94 * g2 - 18 * b2 + 128 + (128 << 8)) >> 8
    return (np.clip(y, 0, 255).astype(np.uint8),
            np.clip(u, 0, 255).astype(np.uint8),
            np.clip(v, 0, 255).astype(np.uint8))
