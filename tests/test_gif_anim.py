"""Animated GIF demux/mux (codecs/gif.py round 4c additions): NETSCAPE
loop extension, per-frame GCE delays/disposal, composition semantics."""

import numpy as np

from gdal_ray.codecs.gif import (
    compose_gif,
    decode_gif,
    decode_gif_frames,
    encode_gif_anim,
)


def _frames():
    f0 = np.full((20, 30, 3), 50, np.uint8)
    f1 = np.full((20, 30, 3), 180, np.uint8)
    f2 = np.zeros((10, 10, 3), np.uint8)
    f2[:, :, 2] = 255
    return [f0, f1, f2]


def test_anim_roundtrip():
    frames = _frames()
    data = encode_gif_anim(frames, [10, 20, 30],
                           offsets=[(0, 0), (0, 0), (4, 6)], loop=2)
    meta = decode_gif_frames(data)
    assert (meta["width"], meta["height"]) == (30, 20)
    assert meta["loop_count"] == 2
    assert [f["delay_cs"] for f in meta["frames"]] == [10, 20, 30]
    for got, want in zip(meta["frames"], frames):
        assert np.array_equal(got["image"][:, :, :3], want)
    assert (meta["frames"][2]["left"], meta["frames"][2]["top"]) == (4, 6)
    # decode_gif still returns the first frame
    assert np.array_equal(decode_gif(data)[:, :, :3], frames[0])


def test_compose_disposal():
    frames = _frames()
    data = encode_gif_anim(frames, [1, 1, 1],
                           offsets=[(0, 0), (0, 0), (4, 6)],
                           disposal=2)  # restore background after each
    canvases = compose_gif(data)
    assert len(canvases) == 3
    assert (canvases[1][:, :, 0] == 180).all()
    c2 = canvases[2]
    assert (c2[6:16, 4:14, 2] == 255).all()
    # frame 1 was disposed to background before frame 2
    assert c2[0, 0, 3] == 0
