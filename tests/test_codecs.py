import numpy as np
import pytest

from gdal_ray.codecs import decode, encode
from gdal_ray.codecs.png import decode_png, encode_png
from gdal_ray.synth import pixels_for


def test_png_roundtrip_rgb():
    img = pixels_for(3, 64, 48)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_roundtrip_gray_and_rgba():
    g = pixels_for(4, 33, 17)[:, :, 0]
    assert np.array_equal(decode_png(encode_png(g)), g)
    rgba = np.dstack([pixels_for(5, 20, 20), np.full((20, 20), 200, np.uint8)])
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)


def test_png_odd_sizes():
    img = pixels_for(6, 257, 255)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_decodes_filtered_rows():
    # hand-build a 2x2 gray PNG using filter 1 (Sub) and 2 (Up)
    import struct
    import zlib

    def chunk(tag, payload):
        import struct as s

        return s.pack(">I", len(payload)) + tag + payload + s.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    # row0: filter 1 (Sub): raw [10, +5] -> pixels [10, 15]
    # row1: filter 2 (Up): raw [+1, +2] -> pixels [11, 17]
    raw = bytes([1, 10, 5, 2, 1, 2])
    data = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    out = decode_png(data)
    assert out.tolist() == [[10, 15], [11, 17]]


def test_lossy_psnr_gate():
    img = pixels_for(7, 64, 64)
    for fmt in ("jpeg", "webp"):
        dec = decode(encode(img, fmt), fmt)
        mse = np.mean((dec.astype(np.float64) - img.astype(np.float64)) ** 2)
        psnr = 10 * np.log10(255.0**2 / mse) if mse > 0 else np.inf
        assert psnr >= 40.0


def test_unknown_format_raises():
    # real WebP container now dispatches to the VP8L decoder; a lossy VP8
    # payload is gated, a truncated container errors
    fake_vp8 = b"RIFF" + (20).to_bytes(4, "little") + b"WEBP" + b"VP8 " + (4).to_bytes(4, "little") + b"\0\0\0\0"
    with pytest.raises(NotImplementedError):
        decode(fake_vp8, "webp")
    with pytest.raises(ValueError):
        decode(b"RIFF....WEBP", "webp")  # no chunk at all
    with pytest.raises(ValueError):
        decode(b"\xff\xd8\xff\xe0 truncated jpeg", "jpeg")  # real decoder engages
    with pytest.raises(NotImplementedError):
        decode(b"GIF89a not supported", "gif")
