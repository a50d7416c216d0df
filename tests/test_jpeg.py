"""Real baseline JPEG codec (codecs/jpeg.py): bitstream structure,
round-trip PSNR at several qualities, odd dimensions, grayscale,
determinism, and registry dispatch on the FFD8 magic."""

import numpy as np
import pytest

from gdal_ray.codecs import decode
from gdal_ray.codecs.jpeg import decode_jpeg, encode_jpeg
from gdal_ray.synth import pixels_for


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255**2 / mse) if mse else np.inf


def test_bitstream_markers():
    img = pixels_for(1, 32, 24)
    data = encode_jpeg(img)
    assert data[:2] == b"\xFF\xD8" and data[-2:] == b"\xFF\xD9"
    assert b"JFIF\x00" in data[:32]
    for marker in (b"\xFF\xDB", b"\xFF\xC0", b"\xFF\xC4", b"\xFF\xDA"):
        assert marker in data


@pytest.mark.parametrize("hw", [(16, 16), (64, 48), (33, 17), (8, 8), (9, 9)])
def test_roundtrip_shapes(hw):
    h, w = hw
    img = pixels_for(5, w, h)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape


def test_roundtrip_quality_ladder():
    img = pixels_for(7, 64, 64)  # includes a random-noise quadrant
    p85 = _psnr(img, decode_jpeg(encode_jpeg(img, 85)))
    p97 = _psnr(img, decode_jpeg(encode_jpeg(img, 97)))
    p100 = _psnr(img, decode_jpeg(encode_jpeg(img, 100)))
    assert p85 >= 28
    assert p97 >= 40  # the engine's lossy gate at conformance quality
    assert p100 >= 50
    assert p85 < p97 < p100


def test_smooth_image_high_fidelity():
    sm = np.zeros((64, 64, 3), np.uint8)
    sm[:] = np.linspace(0, 255, 64, dtype=np.uint8)[None, :, None]
    assert _psnr(sm, decode_jpeg(encode_jpeg(sm, 95))) >= 42


def test_grayscale():
    g = pixels_for(3, 40, 40)[:, :, 0]
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == g.shape and out.ndim == 2
    assert _psnr(g, out) >= 40


def test_deterministic():
    img = pixels_for(11, 48, 32)
    assert encode_jpeg(img) == encode_jpeg(img)


def test_registry_dispatches_on_magic():
    img = pixels_for(2, 24, 24)
    data = encode_jpeg(img, quality=100)
    out = decode(data, fmt="jpeg")
    assert out.shape == img.shape
    assert _psnr(img, out) >= 50


def test_constant_color_block_exact():
    img = np.full((16, 16, 3), 137, np.uint8)
    out = decode_jpeg(encode_jpeg(img, 85))
    assert int(np.abs(out.astype(int) - 137).max()) <= 1


def test_decode_throughput():
    """Round-3 gate: the O(1) sliding-window bit reader decodes a 256×256
    RGB image in well under the round-2 per-bit loop's ~1 s (≥10× there);
    generous wall bound to stay robust under host throttling."""
    import time

    img = pixels_for(5, 256, 256)
    data = encode_jpeg(img, quality=85)
    t0 = time.time()
    out = decode_jpeg(data)
    dt = time.time() - t0
    assert out.shape == img.shape
    assert dt < 0.6, f"decode took {dt:.2f}s — Huffman path regressed"


# ---------------------------------------------------------------------------
# round 4: vectorized pooled-lane decoder

def test_vectorized_matches_scalar_exactly():
    """The SIMD lane engine must be BIT-IDENTICAL to the scalar reference
    across shapes, quality, grayscale, and restart-interval settings."""
    from gdal_ray.codecs.jpeg import decode_jpeg_scalar

    cases = [
        (16, 16, 85, False, None), (64, 48, 90, False, None),
        (33, 17, 85, False, 1), (8, 8, 95, False, None),
        (9, 9, 90, False, 4), (64, 64, 85, True, None),
        (128, 96, 85, False, 0),   # no restart markers (foreign-style)
        (256, 255, 92, False, 2),
    ]
    for (w, h, q, gray, ri) in cases:
        img = pixels_for(7, w, h)
        if gray:
            img = img[:, :, 0]
        data = encode_jpeg(img, q, restart_interval=ri)
        a = decode_jpeg_scalar(data)
        b = decode_jpeg(data)
        assert a.shape == b.shape
        assert np.array_equal(a, b), (w, h, q, gray, ri)


def test_batch_decode_matches_per_image():
    from gdal_ray.codecs.jpeg import decode_jpeg_batch, decode_jpeg_scalar

    imgs = [pixels_for(i, [64, 96, 33][i % 3], [48, 64, 57][i % 3]) for i in range(12)]
    imgs[5] = imgs[5][:, :, 0]  # one grayscale in the pool
    datas = [encode_jpeg(im, 85) for im in imgs]
    outs = decode_jpeg_batch(datas)
    assert len(outs) == len(datas)
    for o, d in zip(outs, datas):
        assert np.array_equal(o, decode_jpeg_scalar(d))


def test_dri_restart_markers_emitted_and_consumed():
    img = pixels_for(3, 64, 64)
    data = encode_jpeg(img, 85, restart_interval=2)
    assert b"\xFF\xDD" in data            # DRI segment
    assert b"\xFF\xD0" in data            # at least RST0
    out = decode_jpeg(data)
    assert out.shape == img.shape
    # restart markers must not change the decoded pixels
    no_rst = encode_jpeg(img, 85, restart_interval=0)
    assert np.array_equal(out, decode_jpeg(no_rst))


def test_batch_throughput():
    """Round-4 gate: the pooled vectorized engine decodes a 64-image
    bench-dims batch well inside the old ~0.1 s/image scalar bill
    (generous wall bound for host throttling)."""
    import time

    dims = [(64, 64), (128, 128), (256, 255), (96, 128), (128, 96)]
    datas = [encode_jpeg(pixels_for(i, *dims[i % 5]), 85) for i in range(64)]
    from gdal_ray.codecs.jpeg import decode_jpeg_batch

    decode_jpeg_batch(datas[:4])  # warm LUT cache
    t0 = time.time()
    out = decode_jpeg_batch(datas)
    dt = time.time() - t0
    assert len(out) == 64
    assert dt < 2.5, f"batch decode took {dt:.2f}s (>39 ms/img) — engine regressed"


def test_dc_only_fast_path():
    """decode_jpeg_dc: 1/8-scale image from DC coefficients = the exact
    8x8-block means of the full decode (±1 rounding), for gray and RGB,
    odd sizes, and 2x2-subsampled chroma."""
    import numpy as np

    from gdal_ray.codecs.jpeg import (_block_means, decode_jpeg,
                                      decode_jpeg_batch, decode_jpeg_dc,
                                      encode_jpeg)

    rng = np.random.RandomState(0)
    for shape in ((128, 160), (61, 77, 3), (128, 160, 3)):
        img = (np.clip(np.cumsum(rng.randn(*shape) * 4, axis=1) + 128,
                       0, 255)).astype(np.uint8)
        d = encode_jpeg(img)
        dc = decode_jpeg_dc(d)
        bm = _block_means(decode_jpeg(d))
        assert dc.shape == bm.shape
        assert dc.shape[0] == -(-shape[0] // 8)
        diff = np.abs(dc.astype(int) - bm.astype(int))
        # interior blocks are the exact block means (±1 rounding); edge
        # blocks of odd-sized images include the encoder's MCU padding,
        # which the cropped full decode cannot reproduce exactly
        assert diff[:shape[0] // 8, :shape[1] // 8].max() <= 1
        assert diff.max() <= 8
    # batch door agrees with the single door
    imgs = [(np.clip(np.cumsum(rng.randn(40, 56, 3) * 4, axis=1) + 128,
                     0, 255)).astype(np.uint8) for _ in range(3)]
    datas = [encode_jpeg(i) for i in imgs]
    outs = decode_jpeg_batch(datas, dc_only=True)
    for d, o in zip(datas, outs):
        assert np.array_equal(decode_jpeg_dc(d), o)
