"""Progressive JPEG (T.81 Annex G): encode→decode round trips.

The pin: for identical quantized coefficients, progressive decode must
be PIXEL-IDENTICAL to baseline decode — both scan orders transmit the
same integers.  The encoder's 10-scan successive-approximation script
exercises DC first+refine, AC band splits at Al=2/1, AC refinement
(ZRL + correction bits + EOB runs), and restart markers.
"""

import numpy as np
import pytest

from gdal_ray.codecs.jpeg import (
    _is_progressive_stream,
    decode_jpeg,
    decode_jpeg_batch,
    encode_jpeg,
)
from gdal_ray.codecs.jpeg_progressive import (
    decode_jpeg_progressive,
    encode_jpeg_progressive,
)


def _image(h=48, w=64, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 9.0) + 50 * np.cos(yy / 7.0))
    img = np.stack([base, np.roll(base, 5, 1), 255 - base], axis=-1)
    img += rng.normal(0, 12, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_progressive_equals_baseline_color():
    img = _image()
    base = decode_jpeg(encode_jpeg(img, quality=85, restart_interval=0))
    prog_bytes = encode_jpeg_progressive(img, quality=85)
    assert prog_bytes[:2] == b"\xFF\xD8" and b"\xFF\xC2" in prog_bytes
    assert _is_progressive_stream(prog_bytes)
    prog = decode_jpeg_progressive(prog_bytes)
    assert np.array_equal(prog, base)


def test_progressive_equals_baseline_gray():
    img = _image()[:, :, 0]
    base = decode_jpeg(encode_jpeg(img, quality=70, restart_interval=0))
    prog = decode_jpeg_progressive(encode_jpeg_progressive(img, quality=70))
    assert np.array_equal(prog, base)


def test_progressive_restart_markers():
    img = _image(40, 40, seed=3)
    base = decode_jpeg(encode_jpeg(img, quality=85, restart_interval=0))
    by = encode_jpeg_progressive(img, quality=85, restart_interval=3)
    assert b"\xFF\xD0" in by                  # RST0 present
    assert np.array_equal(decode_jpeg_progressive(by), base)


def test_decode_jpeg_autoroutes_progressive():
    img = _image(24, 32, seed=11)
    by = encode_jpeg_progressive(img, quality=90)
    out = decode_jpeg(by)
    assert np.array_equal(out, decode_jpeg_progressive(by))


def test_mixed_batch_order_preserved():
    imgs = [_image(16, 24, seed=s) for s in range(4)]
    datas = [
        encode_jpeg(imgs[0], quality=85),
        encode_jpeg_progressive(imgs[1], quality=85),
        encode_jpeg(imgs[2], quality=85),
        encode_jpeg_progressive(imgs[3], quality=85),
    ]
    out = decode_jpeg_batch(datas)
    for o, d in zip(out, datas):
        assert np.array_equal(o, decode_jpeg(d))


def test_psnr_against_original():
    img = _image(64, 64, seed=5)
    out = decode_jpeg_progressive(encode_jpeg_progressive(img, quality=90))
    mse = np.mean((out.astype(np.float64) - img) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    assert psnr > 30.0, psnr


def test_truncated_progressive_decodes_coarse():
    """Cutting the stream after the first few scans must still decode
    (the progressive property) — replace the tail with EOI."""
    img = _image(32, 32, seed=9)
    by = encode_jpeg_progressive(img, quality=85)
    # find the 5th SOS, truncate there
    pos, hits = 2, []
    while pos + 4 <= len(by):
        if by[pos] == 0xFF and by[pos + 1] == 0xDA:
            hits.append(pos)
        pos += 1
    assert len(hits) == 10
    cut = by[: hits[4]] + b"\xFF\xD9"
    coarse = decode_jpeg_progressive(cut)
    full = decode_jpeg_progressive(by)
    assert coarse.shape == full.shape
    # coarse pass correlates with the full image but differs
    assert not np.array_equal(coarse, full)
    err = np.mean(np.abs(coarse.astype(float) - full.astype(float)))
    assert err < 40.0, err
