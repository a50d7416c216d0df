"""ISO BMFF (MP4) mux/demux + MPEG-audio frame indexing.

The container layers are REAL (from the public ISO/IEC 14496-12 and
11172-3/13818-3 specs); elementary-stream decode is gated except MJPEG
samples, which round-trip through our ITU-T T.81 codec.
"""

import numpy as np
import pytest

from gdal_ray.codecs.mp3 import (
    build_frame,
    build_mp3,
    decode_mp3,
    index_mp3,
    parse_frame_header,
)
from gdal_ray.codecs.mp4 import (
    Mp4Track,
    decode_mjpeg_mp4,
    decode_sample,
    encode_mjpeg_mp4,
    encode_mp4,
    parse_mp4,
    read_sample,
    walk_boxes,
)


def _payloads(n, seed=3):
    return [bytes(((seed * 31 + i * 17 + j) % 256) for j in range(20 + 7 * i))
            for i in range(n)]


class TestMp4:
    def test_round_trip_payloads_and_timing(self):
        samples = _payloads(11)
        durs = np.array([40] * 5 + [20] * 6)
        kf = np.array([True, False, False, True] + [False] * 7)
        data = encode_mp4(samples, codec="raw ", width=32, height=16,
                          durations=durs, keyframes=kf, samples_per_chunk=3)
        mp4 = parse_mp4(data)
        assert mp4.major_brand == "isom"
        (t,) = mp4.tracks
        assert t.handler == "vide" and t.codec == "raw "
        assert t.width == 32 and t.height == 16
        assert t.n_samples == 11
        assert [read_sample(data, t, i) for i in range(11)] == samples
        assert (t.durations == durs).all()
        assert (t.keyframe == kf).all()
        np.testing.assert_array_equal(
            t.dts, np.concatenate([[0], np.cumsum(durs)[:-1]]))
        assert t.duration == int(durs.sum())

    def test_stss_absent_means_all_sync(self):
        data = encode_mp4(_payloads(4), codec="raw ")
        (t,) = parse_mp4(data).tracks
        assert t.keyframe.all()

    @pytest.mark.parametrize("spc", [1, 2, 5, 100])
    def test_chunk_layouts(self, spc):
        samples = _payloads(9, seed=spc)
        data = encode_mp4(samples, codec="raw ", samples_per_chunk=spc)
        (t,) = parse_mp4(data).tracks
        assert [read_sample(data, t, i) for i in range(9)] == samples

    def test_co64_offsets(self):
        samples = _payloads(6)
        data = encode_mp4(samples, codec="raw ", use_co64=True)
        assert b"co64" in data and b"stco" not in data
        (t,) = parse_mp4(data).tracks
        assert [read_sample(data, t, i) for i in range(6)] == samples

    def test_largesize_box(self):
        # wrap an 8-byte-header box into the 16-byte largesize form and
        # confirm the walker still finds moov behind it
        import struct

        data = encode_mp4(_payloads(3), codec="raw ")
        boxes = list(walk_boxes(memoryview(data), 0, len(data)))
        tag, ps, pe, hdr = boxes[1]          # mdat
        assert tag == b"mdat"
        payload = data[ps:pe]
        big = (struct.pack(">I", 1) + b"mdat"
               + struct.pack(">Q", 16 + len(payload)) + payload)
        # rebuilding shifts chunk offsets by 8, so only test the walker
        rebuilt = data[:ps - hdr] + big + data[pe:]
        tags = [t for t, *_ in walk_boxes(memoryview(rebuilt), 0, len(rebuilt))]
        assert tags == [b"ftyp", b"mdat", b"moov"]

    def test_mjpeg_round_trip_psnr(self):
        rng = np.random.default_rng(7)
        # smooth gradient frames compress well -> high PSNR
        y, x = np.mgrid[0:24, 0:32]
        frames = np.stack([((x * 4 + y * 3 + 20 * k) % 256).astype(np.uint8)
                           for k in range(4)])
        data = encode_mjpeg_mp4(frames, fps=25, quality=95)
        dec, fps = decode_mjpeg_mp4(data)
        assert fps == pytest.approx(25.0)
        assert dec.shape[0] == 4
        d = dec if dec.ndim == 3 else dec.mean(axis=-1)
        mse = ((d.astype(float) - frames) ** 2).mean()
        psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-9))
        assert psnr > 30.0
        del rng

    def test_fragmented_round_trip(self):
        samples = _payloads(10, seed=9)
        kf = np.array([i % 4 == 0 for i in range(10)])
        from gdal_ray.codecs.mp4 import encode_fmp4

        data = encode_fmp4(samples, codec="raw ", width=20, height=10,
                           keyframes=kf, default_duration=33,
                           samples_per_fragment=3)
        assert data.count(b"moof") >= 4
        (t,) = parse_mp4(data).tracks
        assert t.n_samples == 10
        assert [read_sample(data, t, i) for i in range(10)] == samples
        assert (t.keyframe == kf).all()
        assert (t.durations == 33).all()
        np.testing.assert_array_equal(t.dts, np.arange(10) * 33)

    def test_fragmented_per_sample_durations(self):
        from gdal_ray.codecs.mp4 import encode_fmp4

        samples = _payloads(7, seed=2)
        durs = np.array([40, 20, 40, 20, 40, 20, 40])
        data = encode_fmp4(samples, codec="raw ", durations=durs,
                           samples_per_fragment=2)
        (t,) = parse_mp4(data).tracks
        assert (t.durations == durs).all()
        assert t.duration == int(durs.sum())
        assert [read_sample(data, t, i) for i in range(7)] == samples

    def test_fragmented_equals_progressive_semantics(self):
        # same samples through both wire formats -> identical flat table
        from gdal_ray.codecs.mp4 import encode_fmp4

        samples = _payloads(8, seed=5)
        durs = np.array([40 if i % 2 == 0 else 20 for i in range(8)])
        kf = np.array([i % 3 == 0 for i in range(8)])
        prog = encode_mp4(samples, codec="raw ", durations=durs,
                          keyframes=kf, samples_per_chunk=3)
        frag = encode_fmp4(samples, codec="raw ", durations=durs,
                           keyframes=kf, samples_per_fragment=3)
        (tp,) = parse_mp4(prog).tracks
        (tf,) = parse_mp4(frag).tracks
        assert [read_sample(prog, tp, i) for i in range(8)] == \
               [read_sample(frag, tf, i) for i in range(8)]
        np.testing.assert_array_equal(tp.durations, tf.durations)
        np.testing.assert_array_equal(tp.keyframe, tf.keyframe)
        np.testing.assert_array_equal(tp.dts, tf.dts)

    def test_compressed_codec_gated(self):
        data = encode_mp4(_payloads(2), codec="avc1")
        (t,) = parse_mp4(data).tracks
        with pytest.raises(NotImplementedError, match="avc1"):
            decode_sample(data, t, 0)

    def test_multimodal_decode_video_branch(self):
        from gdal_ray.stages.multimodal import decode_video

        y, x = np.mgrid[0:16, 0:16]
        frames = np.stack([((x * 8 + y * 8 + 32 * k) % 256).astype(np.uint8)
                           for k in range(3)])
        data = encode_mjpeg_mp4(frames, fps=10, quality=95)
        out = decode_video(data, 16, 16, 3)
        assert out.shape == (3, 16, 16) and out.dtype == np.uint8


class TestMp3:
    def test_cbr_walk(self):
        data = build_mp3([128] * 10, sample_rate=44100)
        ix = index_mp3(data)
        assert ix["n_frames"] == 10
        assert ix["frames"][0].size == 144 * 128000 // 44100
        assert ix["total_samples"] == 10 * 1152
        assert ix["duration_ms"] == 10 * 1152 * 1000 // 44100
        assert not ix["is_vbr"] and ix["xing"] is None

    def test_vbr_xing_id3_padding(self):
        data = build_mp3([64, 128, 192, 320, 96] * 4, sample_rate=32000,
                         pad_every=3, id3v2=b"\x00" * 64, xing=True)
        ix = index_mp3(data)
        assert ix["n_frames"] == 20            # Xing frame excluded
        assert ix["is_vbr"]
        assert ix["xing"] == {"tag": "Xing", "vbr": True, "frames": 20}
        assert ix["n_padded"] == 6
        # padded frames are exactly one byte longer
        sizes = {f.size for f in ix["frames"][1:]}
        assert 144 * 64000 // 32000 in sizes and 144 * 64000 // 32000 + 1 in sizes

    def test_resync_and_id3v1_trailer(self):
        data = (build_mp3([128] * 3) + b"\xAA" * 17 + build_mp3([128] * 2)
                + b"TAG" + b"\x00" * 125)
        assert index_mp3(data)["n_frames"] == 5

    @pytest.mark.parametrize(
        "kw,samples,size",
        [
            (dict(bitrate_kbps=64, sample_rate=22050, version=2.0), 576,
             72 * 64000 // 22050),
            (dict(bitrate_kbps=32, sample_rate=8000, version=2.5), 576,
             72 * 32000 // 8000),
            (dict(bitrate_kbps=256, sample_rate=44100, layer=1), 384,
             (12 * 256000 // 44100) * 4),
            (dict(bitrate_kbps=96, sample_rate=48000, layer=2), 1152,
             144 * 96000 // 48000),
        ],
    )
    def test_version_layer_matrix(self, kw, samples, size):
        f = parse_frame_header(build_frame(**kw), 0)
        assert f.samples == samples and f.size == size

    def test_mono_side_info_offset(self):
        data = build_mp3([128] * 4, xing=True, mono=True)
        ix = index_mp3(data)
        assert ix["xing"]["frames"] == 4 and ix["channels"] == 1

    def test_decode_gated(self):
        with pytest.raises(NotImplementedError, match="frame INDEX"):
            decode_mp3(b"\xff\xfb\x90\x00")

    def test_not_a_frame(self):
        assert parse_frame_header(b"\x00\x00\x00\x00", 0) is None
        assert parse_frame_header(b"\xff\xe6\x00\x00", 0) is None  # reserved ver
