"""Animated WebP mux/demux (codecs/webp_anim.py) — round-trip through
our own VP8/VP8L codecs, spec blend/dispose composition semantics."""

import numpy as np
import pytest

from gdal_ray.codecs.webp_anim import (
    compose_webp_anim,
    decode_webp_anim,
    encode_webp_anim,
)


def _frames():
    f0 = np.full((32, 48, 3), 40, np.uint8)
    f1 = np.full((32, 48, 3), 200, np.uint8)
    f2 = np.zeros((16, 16, 3), np.uint8)
    f2[:, :, 0] = 255
    return [f0, f1, f2]


def test_mux_demux_lossless():
    frames = _frames()
    data = encode_webp_anim(frames, [100, 80, 60],
                            offsets=[(0, 0), (0, 0), (8, 4)],
                            loop_count=3, lossless=True)
    meta = decode_webp_anim(data)
    assert (meta["canvas_w"], meta["canvas_h"]) == (48, 32)
    assert meta["loop_count"] == 3
    assert [f["duration_ms"] for f in meta["frames"]] == [100, 80, 60]
    # lossless sub-images are exact
    for got, want in zip(meta["frames"], frames):
        assert np.array_equal(got["image"][:, :, :3], want)
    assert (meta["frames"][2]["x"], meta["frames"][2]["y"]) == (8, 4)


def test_mux_demux_lossy_vp8():
    frames = _frames()
    data = encode_webp_anim(frames, [50, 50, 50], qindex=4)
    meta = decode_webp_anim(data)
    for got, want in zip(meta["frames"], frames):
        assert got["image"].shape[:2] == want.shape[:2]
        # flat frames quantize nearly exactly at qindex 4
        assert np.abs(got["image"][:, :, :3].astype(int)
                      - want.astype(int)).max() <= 12


def test_compose_overwrite_and_dispose():
    frames = _frames()
    data = encode_webp_anim(frames, [10, 10, 10],
                            offsets=[(0, 0), (0, 0), (8, 4)],
                            lossless=True, dispose_background=True)
    canvases = compose_webp_anim(data)
    assert len(canvases) == 3
    # frame 1 fully overwrites frame 0 (opaque blend)
    assert (canvases[1][:, :, 0] == 200).all()
    # frame 2 sits on a background-disposed canvas region: outside the
    # 16x16 rect at (8,4) the canvas is transparent (frame 1 disposed)
    c2 = canvases[2]
    assert (c2[4:20, 8:24, 0] == 255).all()
    assert (c2[:, :, 3][0, 0] == 0)  # outside rect: background (alpha 0)


def test_not_animated_raises():
    from gdal_ray.codecs.vp8 import encode_webp_vp8

    still = encode_webp_vp8(np.zeros((16, 16, 3), np.uint8))
    with pytest.raises(ValueError):
        decode_webp_anim(still)


def test_frame_sampler_handles_animated_webp_and_gif(ray_session):
    """The multimodal video path samples frames from animated WebP/GIF
    through the real demuxers (stages/multimodal.decode_video)."""
    from gdal_ray.codecs.gif import encode_gif_anim
    from gdal_ray.stages.multimodal import decode_video

    frames = [np.full((16, 16, 3), v, np.uint8) for v in (10, 100, 250)]
    wdata = encode_webp_anim(frames, [10, 10, 10], lossless=True)
    out = decode_video(wdata, 16, 16, 3)
    assert out.shape == (3, 16, 16)
    assert abs(int(out[1].mean()) - 100) <= 1
    gdata = encode_gif_anim(frames, [1, 1, 1])
    out = decode_video(gdata, 16, 16, 3)
    assert out.shape == (3, 16, 16)
    assert abs(int(out[2].mean()) - 250) <= 1
