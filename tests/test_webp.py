"""VP8L (WebP lossless) codec: exact round-trips across every supported
feature (transforms, palette bundling, RLE backrefs, huffman code forms),
container structure, registry dispatch, and the honest gates."""

import numpy as np
import pytest

from gdal_ray.codecs import decode
from gdal_ray.codecs.webp import decode_webp, encode_webp


def _rt(img, **kw):
    out = decode_webp(encode_webp(img, **kw))
    ref = np.stack([img] * 3, axis=2) if img.ndim == 2 else img
    assert out.shape == ref.shape
    assert np.array_equal(out, ref)
    return out


def test_roundtrip_random_rgb():
    rng = np.random.default_rng(1)
    _rt(rng.integers(0, 256, (64, 64, 3)).astype(np.uint8))


def test_roundtrip_no_subtract_green():
    rng = np.random.default_rng(2)
    _rt(rng.integers(0, 256, (33, 47, 3)).astype(np.uint8),
        subtract_green=False, palette="off")


def test_rle_backrefs_compress_flat_regions():
    flat = np.zeros((48, 48, 3), np.uint8)
    flat[10:30, 5:40] = (10, 200, 30)
    data = encode_webp(flat, palette="off")
    assert len(data) < 48 * 48 * 3 // 10  # far below raw
    assert np.array_equal(decode_webp(data), flat)


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_modes_roundtrip(mode):
    rng = np.random.default_rng(40 + mode)
    smooth = np.cumsum(rng.integers(0, 3, (32, 29, 3)), axis=1).astype(np.uint8)
    _rt(smooth, predictor_mode=mode, palette="off")


@pytest.mark.parametrize("ncol", [2, 3, 5, 16, 17, 256])
def test_palette_bundling_roundtrip(ncol):
    rng = np.random.default_rng(60 + ncol)
    vals = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
    img = vals[rng.integers(0, ncol, (33, 29))]
    data = encode_webp(img)
    assert np.array_equal(decode_webp(data), img)
    if ncol <= 16:  # bundling: ≥2 pixels per green byte
        assert len(data) < 33 * 29


def test_gray_and_degenerate_sizes():
    rng = np.random.default_rng(8)
    _rt(rng.integers(0, 256, (17, 23)).astype(np.uint8))
    _rt(rng.integers(0, 256, (1, 1, 3)).astype(np.uint8))
    _rt(rng.integers(0, 256, (1, 40, 3)).astype(np.uint8))
    _rt(rng.integers(0, 256, (40, 1, 3)).astype(np.uint8))


def test_container_structure():
    img = np.full((8, 8, 3), 9, np.uint8)
    data = encode_webp(img)
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    assert data[12:16] == b"VP8L"
    assert int.from_bytes(data[4:8], "little") == len(data) - 8


def test_registry_dispatch_on_riff_magic():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    out = decode(encode_webp(img), fmt="webp")
    assert np.array_equal(out, img)


def test_deterministic():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    assert encode_webp(img) == encode_webp(img)


def test_lossy_vp8_dispatch():
    # lossy VP8 payloads now route to the RFC 6386 decoder (vp8.py);
    # a truncated/garbage VP8 chunk is a data error, not a capability gate
    fake = b"RIFF" + (20).to_bytes(4, "little") + b"WEBP" + b"VP8 " + (4).to_bytes(4, "little") + b"\0\0\0\0"
    with pytest.raises(ValueError):
        decode_webp(fake)
    # real lossy round-trip through the container door
    from gdal_ray.codecs.vp8 import encode_webp_vp8

    img = np.tile(np.arange(32, dtype=np.uint8) * 8, (16, 1))
    rgb = np.stack([img, img, img], axis=-1)
    out = decode_webp(encode_webp_vp8(rgb, qindex=4))
    assert out.shape == (16, 32, 3)
    assert abs(out.astype(int).mean() - rgb.astype(int).mean()) < 8


def test_not_webp_raises():
    with pytest.raises(ValueError):
        decode_webp(b"\x89PNG\r\n\x1a\nnope")


# --- conformance vs real libwebp bitstreams (round 4c: the decoder is
# feature-complete — meta-Huffman groups, cross-color transform, 2D
# distance codes, ALPH alpha planes) -----------------------------------

def _libwebp():
    import ctypes
    try:
        lw = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lw.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    lw.WebPEncodeRGBA.restype = ctypes.c_size_t
    lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
    return lw


_LW = _libwebp()
needs_libwebp = pytest.mark.skipif(_LW is None, reason="libwebp unavailable")


def _lw_lossless(img):
    import ctypes
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = _LW.WebPEncodeLosslessRGB(
        np.ascontiguousarray(img).tobytes(), img.shape[1], img.shape[0],
        img.shape[1] * 3, ctypes.byref(out))
    d = bytes(np.ctypeslib.as_array(out, shape=(n,)))
    _LW.WebPFree(out)
    return d


@needs_libwebp
def test_decodes_real_libwebp_lossless():
    """libwebp's own lossless encoder uses meta-Huffman groups, the
    cross-color transform and 2D distance codes — all must decode to the
    exact source pixels."""
    rng = np.random.RandomState(3)
    cases = [
        (np.clip(np.cumsum(rng.randn(120, 90, 3) * 7, axis=0) + 100,
                 0, 255)).astype(np.uint8),
        (np.clip(np.cumsum(rng.randn(200, 160, 3) * 4, axis=1) + 60,
                 0, 255)).astype(np.uint8),
        np.clip(rng.randint(0, 256, (150, 130, 3))
                * (np.arange(130)[None, :, None] > 65), 0, 255).astype(np.uint8),
        np.full((40, 40, 3), 99, np.uint8),
        (rng.randint(0, 4, (40, 40, 1))
         * np.array([[[60, 30, 90]]])).astype(np.uint8),
    ]
    for img in cases:
        out = decode_webp(_lw_lossless(img))
        assert np.array_equal(out[:, :, :3], img)


@needs_libwebp
def test_lossy_alpha_plane_bit_exact():
    """VP8X + ALPH + VP8 files (libwebp WebPEncodeRGBA): the alpha plane
    must match libwebp's own RGBA decode bit-exactly across filter and
    compression variants."""
    import ctypes
    rng = np.random.RandomState(3)
    for alpha in (np.clip(np.arange(40)[None, :] * 6 * np.ones((56, 1)),
                          0, 255),
                  rng.randint(0, 256, (56, 40)),
                  (rng.rand(56, 40) > 0.5) * 255,
                  np.full((56, 40), 128)):
        rgba = np.zeros((56, 40, 4), np.uint8)
        rgba[:, :, :3] = rng.randint(0, 256, (56, 40, 3))
        rgba[:, :, 3] = alpha.astype(np.uint8)
        for q in (90, 40):
            out = ctypes.POINTER(ctypes.c_ubyte)()
            n = _LW.WebPEncodeRGBA(rgba.tobytes(), 40, 56, 40 * 4,
                                   ctypes.c_float(q), ctypes.byref(out))
            d = bytes(np.ctypeslib.as_array(out, shape=(n,)))
            _LW.WebPFree(out)
            w = ctypes.c_int()
            h = ctypes.c_int()
            p = _LW.WebPDecodeRGBA(d, ctypes.c_size_t(len(d)),
                                   ctypes.byref(w), ctypes.byref(h))
            ref = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
            _LW.WebPFree(p)
            mine = decode_webp(d)
            assert mine.shape[2] == 4
            assert np.array_equal(mine[:, :, 3], ref[:, :, 3])
