"""VP8 (lossy WebP, RFC 6386) codec tests.

Three layers:

1. Structural unit tests (always run): boolean-coder round-trips,
   transform inverses, quant table anchors.
2. Self round-trip (always run): our encoder -> our decoder, PSNR gate.
3. Conformance vs libwebp (run when the system libwebp shared library
   is loadable): our decoder must reproduce libwebp's YUV planes
   BIT-EXACTLY on bitstreams produced by libwebp's own encoder across
   sizes/qualities (exercising B_PRED, segmentation, the normal loop
   filter), and libwebp must decode OUR encoder's bitstreams to exactly
   the planes our decoder produces.  The reference repo's fixture
   autotest/gdrivers/data/webp/rgbsmall.webp is included when present.

Reference behavior parity: frmts/webp/webpdataset.cpp (decodes via
libwebp); our decode path is gdal_ray.codecs.decode on RIFF magic.
"""

import ctypes
import os

import numpy as np
import pytest

from gdal_ray.codecs.vp8 import (
    BoolDecoder,
    BoolEncoder,
    KF_YMODE_TREE,
    KF_YMODE_PROBS,
    decode_webp_vp8,
    encode_webp_vp8,
    fdct4x4,
    fwht4x4,
    idct4x4,
    iwht4x4,
    rgb_to_yuv420,
)
from gdal_ray.codecs import decode


def _load_libwebp():
    try:
        lw = ctypes.CDLL("libwebp.so.7")
        lw.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
        lw.WebPEncodeRGB.restype = ctypes.c_size_t
        return lw
    except OSError:
        return None


_LW = _load_libwebp()
needs_libwebp = pytest.mark.skipif(_LW is None, reason="libwebp unavailable")

REF_FIXTURE = "/root/reference/autotest/gdrivers/data/webp/rgbsmall.webp"


def _libwebp_yuv(data: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_ubyte)()
    v = ctypes.POINTER(ctypes.c_ubyte)()
    stride = ctypes.c_int()
    uvstride = ctypes.c_int()
    y = _LW.WebPDecodeYUV(data, ctypes.c_size_t(len(data)), ctypes.byref(w),
                          ctypes.byref(h), ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uvstride))
    assert y, "libwebp decode failed"
    H, W = h.value, w.value
    Y = np.ctypeslib.as_array(y, shape=(H, stride.value))[:, :W].copy()
    cw, ch = (W + 1) // 2, (H + 1) // 2
    U = np.ctypeslib.as_array(u, shape=(ch, uvstride.value))[:, :cw].copy()
    V = np.ctypeslib.as_array(v, shape=(ch, uvstride.value))[:, :cw].copy()
    _LW.WebPFree(y)
    return Y, U, V


def _libwebp_encode(rgb: np.ndarray, quality: float) -> bytes:
    h, w, _ = rgb.shape
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = _LW.WebPEncodeRGB(np.ascontiguousarray(rgb).tobytes(), w, h, w * 3,
                          ctypes.c_float(quality), ctypes.byref(out))
    assert n, "libwebp encode failed"
    enc = bytes(np.ctypeslib.as_array(out, shape=(n,)))
    _LW.WebPFree(out)
    return enc


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _test_image(w, h, seed=5):
    rng = np.random.RandomState(seed)
    img = np.clip(np.cumsum(rng.randn(h, w, 3) * 6, axis=1) + 128, 0, 255)
    return img.astype(np.uint8)


# ---------------------------------------------------------------------------
# 1. structural


def test_bool_coder_roundtrip():
    rng = np.random.RandomState(42)
    for _ in range(10):
        n = int(rng.randint(1, 3000))
        probs = rng.randint(1, 255, size=n)
        bits = rng.randint(0, 2, size=n)
        be = BoolEncoder()
        for b, p in zip(bits, probs):
            be.bool(int(b), int(p))
        bd = BoolDecoder(be.done())
        assert [bd.bool(int(p)) for p in probs] == list(bits)


def test_bool_literal_tree_roundtrip():
    be = BoolEncoder()
    be.literal(93, 7)
    be.signed_literal(-12, 6)
    for v in range(5):
        be.tree(KF_YMODE_TREE, KF_YMODE_PROBS, v)
    d = BoolDecoder(be.done())
    assert d.literal(7) == 93
    assert d.signed_literal(6) == -12
    for v in range(5):
        assert d.tree(KF_YMODE_TREE, KF_YMODE_PROBS) == v


def test_wht_inverse_identity():
    rng = np.random.RandomState(0)
    for _ in range(50):
        dcs = rng.randint(-2000, 2000, 16)
        back = iwht4x4(list(fwht4x4(dcs)))
        assert np.abs(np.asarray(back) - dcs).max() <= 1


def test_dct_inverse_near_identity():
    rng = np.random.RandomState(1)
    for _ in range(50):
        blk = rng.randint(-255, 255, (4, 4))
        coeffs = fdct4x4(blk)
        raster = np.zeros(16, dtype=np.int64)
        raster[:] = coeffs  # fdct output is raster order already
        back = idct4x4(list(raster))
        assert np.abs(back - blk).max() <= 2


def test_quant_table_anchors():
    # §14.1: published lookup-table endpoints
    from gdal_ray.codecs.vp8_tables import AC_QLOOKUP, DC_QLOOKUP
    assert DC_QLOOKUP[0] == 4 and DC_QLOOKUP[127] == 157
    assert AC_QLOOKUP[0] == 4 and AC_QLOOKUP[127] == 284
    assert all(b >= a for a, b in zip(DC_QLOOKUP, DC_QLOOKUP[1:]))
    assert all(b >= a for a, b in zip(AC_QLOOKUP, AC_QLOOKUP[1:]))


# ---------------------------------------------------------------------------
# 2. self round-trip


def test_encode_decode_roundtrip_psnr():
    img = _test_image(50, 34)
    data = encode_webp_vp8(img, qindex=8)
    fr = decode_webp_vp8(data)
    assert (fr.width, fr.height) == (50, 34)
    ys, _, _ = rgb_to_yuv420(img)
    assert _psnr(ys, fr.y) > 38.0
    # the generic codec door dispatches lossy WebP on the RIFF magic
    rgb = decode(data, "webp")
    assert rgb.shape == (34, 50, 3)


def test_encode_decode_odd_sizes():
    for (w, h) in [(16, 16), (17, 13), (33, 31)]:
        img = _test_image(w, h, seed=w * h)
        fr = decode_webp_vp8(encode_webp_vp8(img, qindex=12))
        assert (fr.width, fr.height) == (w, h)
        ys, _, _ = rgb_to_yuv420(img)
        assert _psnr(ys, fr.y) > 36.0


# ---------------------------------------------------------------------------
# 3. conformance vs libwebp


def _assert_bit_exact(data: bytes, label: str):
    Y1, U1, V1 = _libwebp_yuv(data)
    fr = decode_webp_vp8(data)
    for name, ours, ref in (("Y", fr.y, Y1), ("U", fr.u, U1), ("V", fr.v, V1)):
        assert ours.shape == ref.shape, f"{label} {name} shape"
        nbad = int((ours != ref).sum())
        assert nbad == 0, f"{label} {name}: {nbad}/{ref.size} pixels differ"


@needs_libwebp
def test_decode_conformance_sizes_and_qualities():
    for seed, (w, h) in enumerate([(16, 16), (48, 48), (50, 50), (33, 17)]):
        rng = np.random.RandomState(seed)
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        base = (xx * 3 + yy * 2) % 256
        img = np.stack([base, 255 - base, (base * 2) % 256], axis=-1)
        img = np.clip(img.astype(int) + rng.randint(-25, 25, img.shape),
                      0, 255).astype(np.uint8)
        for q in (95, 75, 50, 25):
            _assert_bit_exact(_libwebp_encode(img, q), f"{w}x{h}@q{q}")


@needs_libwebp
def test_decode_conformance_flat_and_noise():
    _assert_bit_exact(_libwebp_encode(np.full((64, 80, 3), 77, np.uint8), 75),
                      "flat")
    rng = np.random.RandomState(9)
    _assert_bit_exact(
        _libwebp_encode(rng.randint(0, 256, (61, 67, 3)).astype(np.uint8), 60),
        "noise")
    _assert_bit_exact(_libwebp_encode(_test_image(128, 96), 100), "q100")
    _assert_bit_exact(_libwebp_encode(_test_image(128, 96), 5), "q5")


@needs_libwebp
@pytest.mark.skipif(not os.path.exists(REF_FIXTURE),
                    reason="reference fixture not present")
def test_decode_conformance_reference_fixture():
    data = open(REF_FIXTURE, "rb").read()
    _assert_bit_exact(data, "rgbsmall.webp")
    # and the generic door returns sane RGB for it
    rgb = decode(data, "webp")
    assert rgb.shape == (50, 50, 3)


@needs_libwebp
def test_decoder_filter_and_partition_matrix():
    """Paths libwebp's simple encoder never emits — simple filter type,
    extreme filter levels/sharpness, multi-partition token streams —
    exercised via OUR encoder, with libwebp as the decode oracle."""
    img = _test_image(64, 48)
    for opts in (dict(qindex=8, n_partitions=4),
                 dict(qindex=8, n_partitions=8),
                 dict(qindex=20, filter_level=24),
                 dict(qindex=20, filter_level=48, sharpness=3),
                 dict(qindex=20, filter_level=20, filter_type=1),
                 dict(qindex=30, filter_level=63, filter_type=1,
                      sharpness=7, n_partitions=2)):
        data = encode_webp_vp8(img, **opts)
        Y1, U1, V1 = _libwebp_yuv(data)
        fr = decode_webp_vp8(data)
        assert np.array_equal(fr.y, Y1), opts
        assert np.array_equal(fr.u, U1), opts
        assert np.array_equal(fr.v, V1), opts


@needs_libwebp
def test_encoder_bitstream_decodable_by_libwebp():
    for (w, h, qi) in [(16, 16, 8), (50, 50, 20), (33, 17, 40)]:
        img = _test_image(w, h, seed=qi)
        data = encode_webp_vp8(img, qindex=qi)
        Y1, U1, V1 = _libwebp_yuv(data)  # libwebp parses OUR bitstream
        fr = decode_webp_vp8(data)
        assert np.array_equal(fr.y, Y1)
        assert np.array_equal(fr.u, U1)
        assert np.array_equal(fr.v, V1)
