"""FLAC codec (from-spec RFC 9639): lossless round trips through our
encoder, plus hand-built bitstreams exercising decoder-only paths (LPC
subframes, rice partitions, left/side + mid/side stereo, wasted bits)
verified against an independent reference recurrence computed in the
test itself."""
import hashlib
import struct

import numpy as np
import pytest

from gdal_ray.codecs.flac import (
    _BitWriter, _crc8, _crc16, _utf8_coded,
    decode_flac, encode_flac,
)

RNG = np.random.default_rng(11)


# ------------------------------------------------------------- round trips

def test_roundtrip_stereo_noise_multiblock():
    s = RNG.integers(-32768, 32768, (9500, 2)).astype(np.int16)
    dec, sr = decode_flac(encode_flac(s, 44100, block_size=4096))
    assert sr == 44100
    assert np.array_equal(dec, s.astype(np.int32))


def test_roundtrip_tone_compresses():
    t = np.arange(16000)
    s = (12000 * np.sin(2 * np.pi * 220 * t / 16000)).astype(np.int16)
    enc = encode_flac(s, 16000)
    assert len(enc) < s.nbytes * 0.8  # fixed predictors actually help
    dec, _ = decode_flac(enc)
    assert np.array_equal(dec[:, 0], s.astype(np.int32))


def test_roundtrip_constant_and_ramp():
    c = np.full(4097, 321, np.int16)  # crosses a block boundary
    dec, _ = decode_flac(encode_flac(c, 8000))
    assert np.array_equal(dec[:, 0], c.astype(np.int32))
    r = np.arange(-5000, 5000, 3, dtype=np.int16)
    dec, _ = decode_flac(encode_flac(r, 8000))
    assert np.array_equal(dec[:, 0], r.astype(np.int32))


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_roundtrip_bit_depths(bps):
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1))
    s = RNG.integers(lo, hi, 3000).astype(np.int64)
    dec, _ = decode_flac(encode_flac(s, 16000, bps=bps))
    assert np.array_equal(dec[:, 0], s.astype(np.int32))


def test_md5_verified():
    s = RNG.integers(-1000, 1000, 2000).astype(np.int16)
    enc = bytearray(encode_flac(s, 16000))
    # corrupt the STREAMINFO MD5 (last 16 bytes of the 34-byte block at 8)
    enc[4 + 4 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(enc))
    decode_flac(bytes(enc), verify_md5=False)  # opt-out still decodes


def test_crc_detects_corruption():
    s = RNG.integers(-1000, 1000, 500).astype(np.int16)
    enc = bytearray(encode_flac(s, 16000))
    enc[-10] ^= 0x01  # flip a bit inside the frame payload
    with pytest.raises(ValueError, match="CRC|MD5|sync"):
        decode_flac(bytes(enc))


# -------------------------------------------- hand-built decoder-only paths

def _streaminfo(n, sr, ch, bps, md5):
    w = _BitWriter()
    w.bits(192, 16)
    w.bits(192, 16)
    w.bits(0, 24)
    w.bits(0, 24)
    w.bits(sr, 20)
    w.bits(ch - 1, 3)
    w.bits(bps - 1, 5)
    w.bits(n, 36)
    body = w.done() + md5
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:] + body


def _frame_header(bs_code, ca, bps_code=4, fno=0):
    w = _BitWriter()
    w.bits(0b11111111111110, 14)
    w.bits(0, 2)
    w.bits(bs_code, 4)
    w.bits(0, 4)        # sample rate from STREAMINFO
    w.bits(ca, 4)
    w.bits(bps_code, 3)
    w.bits(0, 1)
    _utf8_coded(w, fno)
    hdr = w.done()
    return hdr + bytes([_crc8(hdr)])


def _md5_of(samples, bps):
    width = bps // 8
    raw = np.frombuffer(np.asarray(samples, np.int64).astype("<i4").tobytes(),
                        dtype=np.uint8).reshape(-1, 4)[:, :width]
    return hashlib.md5(raw.tobytes()).digest()


def _write_rice_partitioned(w, res, porder, ks, order):
    bs = len(res) + order
    w.bits(0, 2)         # 4-bit rice
    w.bits(porder, 4)
    pos = 0
    for p in range(1 << porder):
        cnt = (bs >> porder) - (order if p == 0 else 0)
        k = ks[p]
        w.bits(k, 4)
        for v in res[pos:pos + cnt]:
            f = (int(v) << 1) if v >= 0 else ((-int(v)) << 1) - 1
            w.unary(f >> k)
            if k:
                w.bits(f & ((1 << k) - 1), k)
        pos += cnt
    assert pos == len(res)


def test_lpc_subframe_with_partitions_left_side_and_wasted_bits():
    bs, bps = 192, 16
    # --- channel design: left = LPC order 2 with wasted bit, side = FIXED 1
    coef = np.array([3, -1], dtype=np.int64)  # precision 4 bits, shift 1
    shift = 1
    warm = [10, 12]
    res_l = RNG.integers(-40, 40, bs - 2).tolist()
    left_half = np.empty(bs, np.int64)  # LPC runs on (sample >> wasted)
    left_half[:2] = warm
    for i in range(2, bs):
        left_half[i] = res_l[i - 2] + ((coef[0] * left_half[i - 1]
                                        + coef[1] * left_half[i - 2]) >> shift)
    left = left_half << 1                         # wasted bits = 1
    assert np.abs(left).max() < 1 << 15

    res_s = RNG.integers(-30, 30, bs - 1).tolist()
    side = np.empty(bs, np.int64)                  # side = left - right
    side[0] = 5
    for i in range(1, bs):
        side[i] = res_s[i - 1] + side[i - 1]
    right = left - side
    expected = np.stack([left, right], axis=1)

    hdr = _frame_header(bs_code=1, ca=8)           # 192 samples, left/side
    w = _BitWriter()
    # subframe 1: LPC order 2 on left, wasted=1 (bps 16 -> 15)
    w.bits(0, 1)
    w.bits(0b100001, 6)      # LPC order 2 = 0b1_00001
    w.bits(1, 1)             # wasted flag
    w.bits(1, 1)             # unary 0 -> wasted = 1
    for v in warm:
        w.bits(int(v) & 0x7FFF, 15)
    w.bits(4 - 1, 4)         # precision 4
    w.bits(shift & 0x1F, 5)
    for c in coef:
        w.bits(int(c) & 0xF, 4)
    _write_rice_partitioned(w, res_l, porder=1, ks=[3, 5], order=2)
    # subframe 2: FIXED order 1 on side (bps 17 for the side channel)
    w.bits(0, 1)
    w.bits(0b001001, 6)
    w.bits(0, 1)
    w.bits(int(side[0]) & 0x1FFFF, 17)
    _write_rice_partitioned(w, res_s, porder=0, ks=[4], order=1)
    frame = hdr + w.done()
    stream = _streaminfo(bs, 16000, 2, bps, _md5_of(expected, bps)) \
        + frame + struct.pack(">H", _crc16(frame))

    dec, sr = decode_flac(stream)
    assert sr == 16000
    assert np.array_equal(dec, expected.astype(np.int32))


def test_mid_side_and_escape_partition():
    bs, bps = 192, 16
    left = RNG.integers(-20000, 20000, bs).astype(np.int64)
    right = RNG.integers(-20000, 20000, bs).astype(np.int64)
    mid = (left + right) >> 1
    side = left - right
    expected = np.stack([left, right], axis=1)

    hdr = _frame_header(bs_code=1, ca=10)          # mid/side
    w = _BitWriter()
    # subframe mid: VERBATIM (bps 16)
    w.bits(0, 1); w.bits(0b000001, 6); w.bits(0, 1)
    for v in mid:
        w.bits(int(v) & 0xFFFF, 16)
    # subframe side: FIXED order 0, escape partition (raw nbits=18), bps 17
    w.bits(0, 1); w.bits(0b001000, 6); w.bits(0, 1)
    w.bits(0, 2)
    w.bits(0, 4)        # partition order 0
    w.bits(0b1111, 4)   # escape
    w.bits(18, 5)
    for v in side:
        w.bits(int(v) & 0x3FFFF, 18)
    frame = hdr + w.done()
    stream = _streaminfo(bs, 8000, 2, bps, _md5_of(expected, bps)) \
        + frame + struct.pack(">H", _crc16(frame))

    dec, _ = decode_flac(stream)
    assert np.array_equal(dec, expected.astype(np.int32))


# ------------------------------------------------------------ integration

def test_multimodal_dispatch():
    from gdal_ray.stages.multimodal import decode_audio

    s = RNG.integers(-3000, 3000, (1200, 2)).astype(np.int16)
    out = decode_audio(encode_flac(s, 16000), 16000, 2)
    assert np.array_equal(out, s.astype(np.int32))
