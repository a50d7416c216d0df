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
    # real WebP container dispatches to VP8L/VP8 decoders; a truncated
    # lossy VP8 payload is a data error (lossy is fully supported now)
    fake_vp8 = b"RIFF" + (20).to_bytes(4, "little") + b"WEBP" + b"VP8 " + (4).to_bytes(4, "little") + b"\0\0\0\0"
    with pytest.raises(ValueError):
        decode(fake_vp8, "webp")
    with pytest.raises(ValueError):
        decode(b"RIFF....WEBP", "webp")  # no chunk at all
    with pytest.raises(ValueError):
        decode(b"\xff\xd8\xff\xe0 truncated jpeg", "jpeg")  # real decoder engages
    # GIF now decodes for real (codecs/gif.py): a corrupt stream errors
    with pytest.raises(ValueError):
        decode(b"GIF89a not a real stream", "gif")
    with pytest.raises(NotImplementedError):
        decode(b"ID3\x03unsupported container", "mp3")


def test_png_16bit_roundtrip():
    import numpy as np

    from gdal_ray.codecs.png import decode_png, encode_png

    rng = np.random.default_rng(6)
    for shape in [(20, 30), (15, 10, 3), (8, 8, 4)]:
        arr = rng.integers(0, 65535, shape).astype(np.uint16)
        got = decode_png(encode_png(arr))
        assert got.dtype == np.uint16
        assert np.array_equal(got, arr)


def test_png_palette_roundtrip():
    import numpy as np

    from gdal_ray.codecs.png import decode_png, encode_png_palette

    rng = np.random.default_rng(7)
    pal = rng.integers(0, 255, (16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (20, 25)).astype(np.uint8)
    got = decode_png(encode_png_palette(idx, pal))
    assert got.shape == (20, 25, 3)
    assert np.array_equal(got, pal[idx])

    # tRNS: entry 0 transparent -> RGBA output
    got = decode_png(encode_png_palette(idx, pal, transparent=0))
    assert got.shape == (20, 25, 4)
    assert np.array_equal(got[:, :, :3], pal[idx])
    assert np.array_equal(got[:, :, 3] == 0, idx == 0)


def test_png_filters_defilter_16bit():
    """Hand-built 16-bit PNG using Sub/Up/Average/Paeth filters decodes to
    the same pixels as the filter-0 encoding (spec byte-wise semantics)."""
    import struct
    import zlib

    import numpy as np

    from gdal_ray.codecs.png import _MAGIC, _chunk, decode_png, encode_png

    rng = np.random.default_rng(8)
    arr = rng.integers(0, 65535, (6, 5)).astype(np.uint16)
    bpp = 2
    body = arr.astype(">u2").view(np.uint8).reshape(6, 10).astype(np.int32)
    lines = []
    filters = [0, 1, 2, 3, 4, 1]
    prev = np.zeros(10, np.int32)
    for y, f in enumerate(filters):
        cur = body[y]
        enc = np.zeros(10, np.int32)
        for x in range(10):
            left = cur[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = (body[y - 1][x - bpp] if (y and x >= bpp) else 0)
            if f == 0:
                v = cur[x]
            elif f == 1:
                v = cur[x] - left
            elif f == 2:
                v = cur[x] - up
            elif f == 3:
                v = cur[x] - ((left + up) >> 1)
            else:
                p = left + up - ul
                pa_, pb_, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa_ <= pb_ and pa_ <= pc_) else (up if pb_ <= pc_ else ul)
                v = cur[x] - pred
            enc[x] = v & 0xFF
        lines.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", 5, 6, 16, 0, 0, 0, 0)
    png = (_MAGIC + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
           + _chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png), arr)


# ------------------------------------------------------ PNG Adam7


def test_png_adam7_roundtrip_shapes():
    from gdal_ray.codecs.png import decode_png, encode_png

    rng = np.random.default_rng(2)
    for shape in ((1, 1), (7, 5), (8, 8), (33, 47, 3), (19, 10, 4)):
        a = rng.integers(0, 255, shape).astype(np.uint8)
        np.testing.assert_array_equal(
            decode_png(encode_png(a, interlace=True)), a)
    a16 = rng.integers(0, 65535, (21, 13, 3)).astype(np.uint16)
    np.testing.assert_array_equal(
        decode_png(encode_png(a16, interlace=True)), a16)


def test_png_adam7_pass_order_pinned():
    """Hand-build an interlaced 8x8 gray PNG: pass k pixels carry value k
    — decode must scatter each pass onto the spec's grid positions."""
    import struct
    import zlib

    from gdal_ray.codecs.png import _ADAM7, _MAGIC, _chunk, decode_png

    w = h = 8
    passes = []
    dims = []
    for (x0, y0, dx, dy) in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        dims.append((pw, ph))
    raw = bytearray()
    for k, ((x0, y0, dx, dy), (pw, ph)) in enumerate(zip(_ADAM7, dims), 1):
        for _y in range(ph):
            raw.append(0)  # filter byte
            raw += bytes([k]) * pw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1)
    blob = (_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))
    out = decode_png(blob)
    want = np.zeros((h, w), dtype=np.uint8)
    for k, ((x0, y0, dx, dy), (pw, ph)) in enumerate(zip(_ADAM7, dims), 1):
        want[y0::dy, x0::dx] = k
    np.testing.assert_array_equal(out, want)
    # spec worked example: top-left 8x8 pass-number grid row 0
    np.testing.assert_array_equal(
        want[0], np.array([1, 6, 4, 6, 2, 6, 4, 6], np.uint8))
    np.testing.assert_array_equal(
        want[1], np.array([7, 7, 7, 7, 7, 7, 7, 7], np.uint8))


def test_png_adam7_filtered_passes():
    """A filter-2 (Up) row inside a pass defilters against the PASS's
    previous row, not the image row."""
    import struct
    import zlib

    from gdal_ray.codecs.png import _MAGIC, _chunk, decode_png

    # 2x16: only passes with pixels are 1,2,4,6 (y rows 0..1)... simplest:
    # 16x1-high image has passes 1,2,4,6; use 1 column, 16 rows instead:
    # passes 1,3,5,7 (x0=0 ones)
    w, h = 1, 16
    # pass1 ph=2 rows (y=0,8); pass3 ph=2 (y=4,12); pass5 ph=4 (y=2,6,10,14);
    # pass7 ph=8 (odd rows)
    raw = bytearray()
    # pass1: rows [filter0,10], [filter2,+5] -> 10,15
    raw += bytes([0, 10]); raw += bytes([2, 5])
    # pass3: [0,20],[2,7] -> 20,27
    raw += bytes([0, 20]); raw += bytes([2, 7])
    # pass5: [0,30],[2,1],[2,1],[2,1] -> 30,31,32,33
    raw += bytes([0, 30]); raw += bytes([2, 1]); raw += bytes([2, 1]); raw += bytes([2, 1])
    # pass7: filter0 rows 1..8
    for v in range(1, 9):
        raw += bytes([0, v])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1)
    blob = (_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))
    out = decode_png(blob)[:, 0]
    want = np.zeros(16, np.uint8)
    want[[0, 8]] = [10, 15]
    want[[4, 12]] = [20, 27]
    want[[2, 6, 10, 14]] = [30, 31, 32, 33]
    want[1::2] = range(1, 9)
    np.testing.assert_array_equal(out, want)
