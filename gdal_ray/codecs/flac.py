"""FLAC codec — pure stdlib + numpy, from the public FLAC format
specification (RFC 9639 / xiph.org "FLAC format").

Real bitstreams: "fLaC" magic, STREAMINFO metadata block (incl. the MD5
of the unencoded audio, which `decode_flac` verifies), frames with the
14-bit sync code, UTF-8-coded frame numbers, CRC-8 header / CRC-16 frame
checksums, subframe types CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32),
rice + rice2 residual coding with partitions and escape codes, stereo
decorrelation (left/side, right/side, mid/side) and wasted bits.

The encoder emits fixed-blocksize frames with per-channel best-of
CONSTANT / FIXED(0-4) subframes and 4-bit rice residuals (partition
order 0) — decode(encode(x)) is bit-exact for 8/16/24-bit PCM, which is
the verifiable-lossless contract (same as codecs/png.py).  The decoder
additionally handles LPC subframes, rice partitions/escapes and the
stereo modes, so third-party FLAC streams within those bounds decode.

Reference behavior: GDAL has no FLAC driver (audio is outside raster
scope); in this engine audio is a first-class multimodal binary column
(stages/multimodal.py) and FLAC is its non-RIFF container, decoded the
same way frmts/ drivers decode rasters.  Scalar per-sample loops =
conformance path (clips in the media table are a few k-samples).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEF = {
    0: np.array([], dtype=np.int64),
    1: np.array([1], dtype=np.int64),
    2: np.array([2, -1], dtype=np.int64),
    3: np.array([3, -3, 1], dtype=np.int64),
    4: np.array([4, -6, 4, -1], dtype=np.int64),
}

_BLOCKSIZE_CODE = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8,
                   512: 9, 1024: 10, 2048: 11, 4096: 12, 8192: 13,
                   16384: 14, 32768: 15}
_SAMPLE_RATE_CODE = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
                     22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
                     96000: 11}
_BPS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_BPS_FROM_CODE = {v: k for k, v in _BPS_CODE.items()}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v: int, n: int):
        # MSB-first
        self.acc = (self.acc << n) | (int(v) & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def unary(self, q: int):
        while q >= 32:
            self.bits(0, 32)
            q -= 32
        self.bits(1, q + 1)  # q zeros then a one

    def align(self):
        if self.n:
            self.bits(0, 8 - self.n)

    def done(self) -> bytes:
        self.align()
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.data = data
        self.pos = pos_bytes  # byte position
        self.acc = 0
        self.n = 0

    def bits(self, n: int) -> int:
        while self.n < n:
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= n
        v = (self.acc >> self.n) & ((1 << n) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def signed(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
        return q

    def align(self):
        self.n = 0
        self.acc = 0

    def byte_pos(self) -> int:
        return self.pos - (self.n + 7) // 8


def _utf8_coded(w: _BitWriter, v: int):
    """FLAC's UTF-8-style coded number (up to 36 bits)."""
    if v < 0x80:
        w.bits(v, 8)
        return
    for nbytes, maxv in ((2, 1 << 11), (3, 1 << 16), (4, 1 << 21),
                         (5, 1 << 26), (6, 1 << 31), (7, 1 << 36)):
        if v < maxv:
            shift = 6 * (nbytes - 1)
            w.bits((0xFF << (8 - nbytes)) & 0xFF | (v >> shift), 8)
            for i in range(nbytes - 2, -1, -1):
                w.bits(0x80 | ((v >> (6 * i)) & 0x3F), 8)
            return
    raise ValueError("coded number out of range")


def _utf8_decode(r: _BitReader) -> int:
    b0 = r.bits(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    while b0 & (0x80 >> nbytes):
        nbytes += 1
    v = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        v = (v << 6) | (r.bits(8) & 0x3F)
    return v


# ---------------------------------------------------------------------------
# encode

def _rice_param(res: np.ndarray) -> int:
    """Smallest k minimizing the coded size estimate (exact sum per k)."""
    fold = np.where(res >= 0, res.astype(np.int64) << 1,
                    (((-res).astype(np.int64)) << 1) - 1).astype(np.uint64)
    best_k, best_len = 0, None
    for k in range(15):
        ln = int(np.sum(fold >> np.uint64(k))) + (k + 1) * len(fold)
        if best_len is None or ln < best_len:
            best_k, best_len = k, ln
        elif ln > best_len * 2:
            break
    return best_k


def _write_rice(w: _BitWriter, res: np.ndarray, k: int):
    fold = np.where(res >= 0, res.astype(np.int64) << 1,
                    (((-res).astype(np.int64)) << 1) - 1)
    if k:
        for v in fold.tolist():
            w.unary(v >> k)
            w.bits(v & ((1 << k) - 1), k)
    else:
        for v in fold.tolist():
            w.unary(v)


def _encode_subframe(w: _BitWriter, s: np.ndarray, bps: int):
    s = s.astype(np.int64)
    n = len(s)
    if np.all(s == s[0]):
        w.bits(0, 1)           # zero pad
        w.bits(0b000000, 6)    # CONSTANT
        w.bits(0, 1)           # no wasted bits
        w.bits(int(s[0]) & ((1 << bps) - 1), bps)
        return
    # pick best fixed order by sum |residual|
    best_o, best_res, best_cost = 0, s, int(np.abs(s).sum())
    d = s
    for o in range(1, 5):
        if n <= o:
            break
        d = np.diff(d)
        cost = int(np.abs(d).sum())
        if cost < best_cost:
            best_o, best_res, best_cost = o, d, cost
    o, res = best_o, best_res
    w.bits(0, 1)
    w.bits(0b001000 | o, 6)    # FIXED order o
    w.bits(0, 1)               # no wasted bits
    for i in range(o):         # warmup
        w.bits(int(s[i]) & ((1 << bps) - 1), bps)
    k = _rice_param(res)
    # residual: method 0 (4-bit rice), partition order 0
    w.bits(0, 2)
    w.bits(0, 4)
    if k <= 14:
        w.bits(k, 4)
        _write_rice(w, res, k)
    else:                      # escape: raw residuals
        w.bits(0b1111, 4)
        nb = bps + 2
        w.bits(nb, 5)
        for v in res.tolist():
            w.bits(int(v) & ((1 << nb) - 1), nb)


def encode_flac(samples: np.ndarray, sample_rate: int = 16000, *,
                bps: int = 16, block_size: int = 4096) -> bytes:
    """(n,) or (n, channels) int PCM -> FLAC bytes (lossless)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if not 1 <= ch <= 8:
        raise ValueError("1-8 channels")
    if bps not in (8, 16, 24):
        raise NotImplementedError("encode_flac: bps 8/16/24")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if s.min() < lo or s.max() > hi:
        raise ValueError(f"samples out of {bps}-bit range")
    s = s.astype(np.int64)

    # MD5 of the unencoded audio: interleaved little-endian bps-bit samples
    md5 = hashlib.md5()
    width = bps // 8
    inter = s.astype("<i4").tobytes()  # 4-byte LE, take low `width` bytes
    raw = np.frombuffer(inter, dtype=np.uint8).reshape(-1, 4)[:, :width]
    md5.update(raw.tobytes())

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.bits(min(block_size, n) if n else block_size, 16)  # min block size
    si.bits(block_size, 16)                               # max block size
    si.bits(0, 24)  # min frame size unknown
    si.bits(0, 24)  # max frame size unknown
    si.bits(sample_rate, 20)
    si.bits(ch - 1, 3)
    si.bits(bps - 1, 5)
    si.bits(n, 36)
    body = si.done() + md5.digest()
    out += bytes([0x80 | 0x00]) + struct.pack(">I", len(body))[1:] + body

    for fno, start in enumerate(range(0, n, block_size)):
        blk = s[start:start + block_size]
        bs = len(blk)
        w = _BitWriter()
        w.bits(0b11111111111110, 14)
        w.bits(0, 1)   # reserved
        w.bits(0, 1)   # fixed-blocksize strategy
        bs_code = _BLOCKSIZE_CODE.get(bs, 7)
        w.bits(bs_code, 4)
        sr_code = _SAMPLE_RATE_CODE.get(sample_rate, 0)
        w.bits(sr_code, 4)
        w.bits(ch - 1, 4)          # independent channels
        w.bits(_BPS_CODE[bps], 3)
        w.bits(0, 1)   # reserved
        _utf8_coded(w, fno)
        if bs_code == 7:
            w.bits(bs - 1, 16)
        hdr = w.done()
        hdr += bytes([_crc8(hdr)])
        w = _BitWriter()
        for c in range(ch):
            _encode_subframe(w, blk[:, c], bps)
        frame = hdr + w.done()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


# ---------------------------------------------------------------------------
# decode

def _read_residual(r: _BitReader, bs: int, order: int) -> np.ndarray:
    method = r.bits(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.bits(4)
    nparts = 1 << porder
    if bs % nparts or (bs >> porder) <= order:
        raise ValueError("FLAC: bad partition order")
    res = np.empty(bs - order, dtype=np.int64)
    pos = 0
    for p in range(nparts):
        cnt = (bs >> porder) - (order if p == 0 else 0)
        k = r.bits(pbits)
        if k == escape:
            nb = r.bits(5)
            for i in range(cnt):
                res[pos + i] = r.signed(nb) if nb else 0
        else:
            for i in range(cnt):
                q = r.unary()
                v = (q << k) | r.bits(k) if k else q
                res[pos + i] = -(v >> 1) - 1 if v & 1 else v >> 1
        pos += cnt
    return res


def _decode_subframe(r: _BitReader, bs: int, bps: int) -> np.ndarray:
    if r.bits(1):
        raise ValueError("FLAC: subframe pad bit set")
    t = r.bits(6)
    wasted = 0
    if r.bits(1):
        wasted = 1 + r.unary()
    bps -= wasted
    if t == 0:                      # CONSTANT
        out = np.full(bs, r.signed(bps), dtype=np.int64)
    elif t == 1:                    # VERBATIM
        out = np.array([r.signed(bps) for _ in range(bs)], dtype=np.int64)
    elif 8 <= t <= 12:              # FIXED
        order = t - 8
        warm = [r.signed(bps) for _ in range(order)]
        res = _read_residual(r, bs, order)
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        coef = _FIXED_COEF[order]
        for i in range(order, bs):
            out[i] = res[i - order] + int(coef @ out[i - order:i][::-1]) \
                if order else res[i]
    elif t >= 32:                   # LPC
        order = (t & 0x1F) + 1
        warm = [r.signed(bps) for _ in range(order)]
        prec = r.bits(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid LPC precision")
        shift = r.signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coef = np.array([r.signed(prec) for _ in range(order)], dtype=np.int64)
        res = _read_residual(r, bs, order)
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        for i in range(order, bs):
            pred = int(coef @ out[i - order:i][::-1]) >> shift
            out[i] = res[i - order] + pred
    else:
        raise ValueError(f"FLAC: reserved subframe type {t}")
    return out << wasted


def decode_flac(data: bytes, *, verify_md5: bool = True):
    """FLAC bytes -> (samples (n, channels) int32, sample_rate)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    sr = ch = bps = total = None
    md5_ref = None
    while True:
        hdr = data[pos]
        btype = hdr & 0x7F
        ln = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + ln]
        if btype == 0:  # STREAMINFO
            r = _BitReader(body)
            r.bits(16); r.bits(16); r.bits(24); r.bits(24)
            sr = r.bits(20)
            ch = r.bits(3) + 1
            bps = r.bits(5) + 1
            total = r.bits(36)
            md5_ref = body[18:34]
        pos += 4 + ln
        if hdr & 0x80:
            break
    if sr is None:
        raise ValueError("FLAC: no STREAMINFO")

    chunks = []
    got = 0
    while (total == 0 or got < total) and pos < len(data) - 1:
        frame_start = pos
        r = _BitReader(data, pos)
        sync = r.bits(14)
        if sync != 0b11111111111110:
            raise ValueError("FLAC: lost frame sync")
        r.bits(1)
        r.bits(1)  # blocking strategy (number is informational here)
        bs_code = r.bits(4)
        sr_code = r.bits(4)
        ca = r.bits(4)
        bps_code = r.bits(3)
        r.bits(1)
        _utf8_decode(r)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = r.bits(8) + 1
        elif bs_code == 7:
            bs = r.bits(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 12:
            r.bits(8)
        elif sr_code in (13, 14):
            r.bits(16)
        fbps = bps if bps_code == 0 else _BPS_FROM_CODE[bps_code]
        hdr_end = r.byte_pos()
        crc8 = r.bits(8)
        if _crc8(data[frame_start:hdr_end]) != crc8:
            raise ValueError("FLAC: frame header CRC-8 mismatch")

        if ca < 8:
            nch = ca + 1
            subs = [_decode_subframe(r, bs, fbps) for _ in range(nch)]
        elif ca == 8:    # left/side
            left = _decode_subframe(r, bs, fbps)
            side = _decode_subframe(r, bs, fbps + 1)
            subs = [left, left - side]
        elif ca == 9:    # right/side
            side = _decode_subframe(r, bs, fbps + 1)
            right = _decode_subframe(r, bs, fbps)
            subs = [right + side, right]
        elif ca == 10:   # mid/side
            mid = _decode_subframe(r, bs, fbps)
            side = _decode_subframe(r, bs, fbps + 1)
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError("FLAC: reserved channel assignment")
        r.align()
        crc_end = r.byte_pos()
        crc16 = struct.unpack_from(">H", data, crc_end)[0]
        if _crc16(data[frame_start:crc_end]) != crc16:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = crc_end + 2
        chunks.append(np.stack(subs, axis=1))
        got += bs

    out = np.concatenate(chunks, axis=0) if chunks else \
        np.empty((0, ch), dtype=np.int64)
    if total:
        out = out[:total]
    if verify_md5 and md5_ref and md5_ref != b"\x00" * 16:
        width = bps // 8
        raw = np.frombuffer(out.astype("<i4").tobytes(),
                            dtype=np.uint8).reshape(-1, 4)[:, :width]
        if hashlib.md5(raw.tobytes()).digest() != md5_ref:
            raise ValueError("FLAC: decoded-audio MD5 mismatch")
    return out.astype(np.int32), sr
