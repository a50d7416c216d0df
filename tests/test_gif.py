"""GIF codec (from-spec GIF89a: LZW, interlace, palettes, transparency).

Reference behavior: frmts/gif/gifdataset.cpp via the vendored giflib; we
verify exact round trips through our own encoder plus hand-built worked
examples of the wire format.
"""
import struct

import numpy as np
import pytest

from gdal_ray.codecs.gif import decode_gif, encode_gif, _lzw_decode, _lzw_encode


RNG = np.random.default_rng(7)


def test_lzw_worked_example():
    # spec-style worked stream, min_code_size=2: clear(4) 0 1 0 eoi(5)
    # widths: clear/first codes at 3 bits
    # encode by hand: codes [4,0,1,0,5] all 3-bit LSB-first
    acc, n, out = 0, 0, bytearray()
    for c in (4, 0, 1, 0, 5):
        acc |= c << n
        n += 3
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        out.append(acc & 0xFF)
    got = _lzw_decode(bytes(out), 2, 3)
    assert got.tolist() == [0, 1, 0]


def test_lzw_roundtrip_width_growth_and_clear():
    # enough symbols to push the table through 9->12 bit widths and a reset
    data = RNG.integers(0, 200, 120_000).astype(np.uint8)
    enc = _lzw_encode(data, 8)
    dec = _lzw_decode(enc, 8, len(data))
    assert np.array_equal(dec, data)


def test_lzw_kwkwk():
    # classic KwKwK: "aaaa..." emits code == next_code immediately
    data = np.zeros(64, dtype=np.uint8)
    enc = _lzw_encode(data, 2)
    assert np.array_equal(_lzw_decode(enc, 2, 64), data)


def test_rgb_roundtrip_exact():
    pal = RNG.integers(0, 256, (31, 3), dtype=np.uint8)
    img = pal[RNG.integers(0, 31, (45, 67))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_grayscale_promotes_to_rgb():
    g = RNG.integers(0, 256, (19, 23), dtype=np.uint8)
    out = decode_gif(encode_gif(g))
    assert np.array_equal(out, np.dstack([g] * 3))


def test_interlaced_roundtrip():
    pal = RNG.integers(0, 256, (9, 3), dtype=np.uint8)
    img = pal[RNG.integers(0, 9, (33, 17))]  # height not divisible by 8
    enc = encode_gif(img, interlace=True)
    # interlace flag really set in the image descriptor
    # (descriptor follows header 13 + GCT 3*16... locate 0x2C)
    i = enc.index(b"\x2C", 13)
    assert enc[i + 9] & 0x40
    assert np.array_equal(decode_gif(enc), img)


def test_transparency_rgba():
    pal = RNG.integers(0, 256, (5, 3), dtype=np.uint8)
    idx = RNG.integers(0, 5, (12, 12))
    alpha = np.where(idx == 2, 0, 255).astype(np.uint8)
    rgba = np.dstack([pal[idx], alpha])
    out = decode_gif(encode_gif(rgba))
    assert out.shape[2] == 4
    assert np.array_equal(out[:, :, 3], alpha)
    m = alpha == 255
    assert np.array_equal(out[:, :, :3][m], pal[idx][m])


def test_full_256_color_palette():
    keys = np.arange(256, dtype=np.uint32) * 65537 % (1 << 24)
    pal = np.stack([(keys >> 16) & 255, (keys >> 8) & 255, keys & 255],
                   axis=1).astype(np.uint8)
    assert len(np.unique(keys)) == 256
    img = pal[RNG.integers(0, 256, (101, 73))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_too_many_colors_gate():
    r = (np.arange(1024, dtype=np.uint16) % 256).astype(np.uint8)
    g = (np.arange(1024, dtype=np.uint16) // 4).astype(np.uint8)
    img = np.dstack([r, g, np.zeros_like(r)]).reshape(32, 32, 3)
    with pytest.raises(NotImplementedError):
        encode_gif(img)


def test_header_fields():
    img = np.full((7, 11, 3), 42, dtype=np.uint8)
    enc = encode_gif(img)
    assert enc[:6] == b"GIF89a"
    w, h = struct.unpack_from("<HH", enc, 6)
    assert (w, h) == (11, 7)
    assert enc[-1] == 0x3B


def test_codec_dispatch():
    from gdal_ray.codecs import decode, encode

    pal = RNG.integers(0, 256, (4, 3), dtype=np.uint8)
    img = pal[RNG.integers(0, 4, (8, 8))]
    data = encode(img, "gif")
    assert np.array_equal(decode(data), img)


def test_info_door(tmp_path):
    from gdal_ray.info import describe

    img = np.full((5, 6, 3), 9, dtype=np.uint8)
    p = tmp_path / "x.gif"
    p.write_bytes(encode_gif(img))
    d = describe(str(p))
    assert d["driver"] == "GIF"
    assert (d["width"], d["height"]) == (6, 5)
