"""Audio/video multimodal stages: REAL RIFF container decode (WAVE PCM,
AVI MJPEG/DIB via codecs/riff.py) through actor-pool map_batches stages;
non-RIFF payloads fall back to the documented deterministic stub."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.codecs import riff
from gdal_ray.stages import multimodal as mm


def test_wav_roundtrip_exact():
    s = (np.sin(np.arange(4000) / 7.0) * 20000).astype(np.int16).reshape(-1, 2)
    data = riff.encode_wav(s, 22050)
    s2, rate = riff.decode_wav(data)
    assert rate == 22050
    assert np.array_equal(s, s2)


def test_wav_decodes_8bit_and_float():
    import struct

    # 8-bit unsigned PCM
    raw8 = np.array([0, 128, 255, 64], np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + riff._chunk(b"fmt ", fmt) + riff._chunk(b"data", raw8.tobytes())
    data = riff._chunk(b"RIFF", body)
    s, rate = riff.decode_wav(data)
    assert rate == 8000
    assert np.array_equal(s[:, 0], (raw8.astype(np.int16) - 128) << 8)
    # IEEE float32
    f = np.array([0.0, 0.5, -1.0, 1.0], "<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = b"WAVE" + riff._chunk(b"fmt ", fmt) + riff._chunk(b"data", f.tobytes())
    s, _ = riff.decode_wav(riff._chunk(b"RIFF", body))
    assert np.array_equal(s[:, 0], np.array([0, 16384, -32767, 32767], np.int16))


def test_g711_known_spec_properties():
    # ITU-T G.711 published invariants: decode maxima 32124 (µ) / 32256
    # (A-law); µ-law has TWO zero codes (0xFF positive, 0x7F negative
    # zero — encoders only ever emit 0xFF)
    assert int(riff.MULAW_LUT.max()) == 32124
    assert int(riff.MULAW_LUT.min()) == -32124
    assert int(riff.ALAW_LUT.max()) == 32256
    assert int(riff.ALAW_LUT.min()) == -32256
    assert (riff.MULAW_LUT == 0).sum() == 2
    codes = np.arange(256, dtype=np.uint8)
    # encode(decode(code)) == code for every code (0x7F maps to 0xFF)
    mu = riff.mulaw_encode(riff.MULAW_LUT[codes])
    assert np.array_equal(mu[codes != 0x7F], codes[codes != 0x7F])
    assert mu[0x7F] == 0xFF
    assert np.array_equal(riff.alaw_encode(riff.ALAW_LUT[codes]), codes)


@pytest.mark.parametrize("law", ["mulaw", "alaw"])
def test_g711_wav_roundtrip_snr(law):
    s = (np.sin(np.arange(4000) / 19.0) * 20000).astype(np.int16)
    dec, rate = riff.decode_wav(riff.encode_wav_g711(s, 8000, law))
    assert rate == 8000 and dec.shape == (4000, 1)
    err = dec[:, 0].astype(float) - s.astype(float)
    snr = 10 * np.log10((s.astype(float) ** 2).mean() / (err ** 2).mean())
    assert snr > 30  # G.711 delivers ~35-38 dB on a full-scale sine
    # companding is logarithmic: relative error bounded everywhere
    x = np.linspace(-32000, 32000, 9999).astype(np.int16)
    for lut, enc in [(riff.MULAW_LUT, riff.mulaw_encode),
                     (riff.ALAW_LUT, riff.alaw_encode)]:
        e = np.abs(lut[enc(x)].astype(np.int32) - x)
        assert (e / np.maximum(np.abs(x.astype(np.int32)), 256)).max() < 0.04


def _frames(n=7, h=24, w=32):
    yy, xx = np.mgrid[0:h, 0:w]
    g = np.stack([((xx + yy + 5 * f) % 256).astype(np.uint8) for f in range(n)])
    return np.repeat(g[..., None], 3, axis=3)


def test_avi_dib_roundtrip_exact():
    rgb = _frames()
    f2, fps = riff.decode_avi(riff.encode_avi(rgb, 30.0, codec="DIB "))
    assert fps == 30.0
    assert np.array_equal(f2, rgb)


def test_avi_mjpeg_roundtrip_psnr():
    rgb = _frames()
    f2, fps = riff.decode_avi(riff.encode_avi(rgb, 25.0, codec="MJPG", quality=90))
    assert fps == 25.0 and f2.shape == rgb.shape
    mse = ((f2.astype(float) - rgb.astype(float)) ** 2).mean()
    psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
    assert psnr >= 40.0  # BASELINE lossy gate


def test_decode_dispatch_real_vs_stub():
    s = (np.arange(500) % 251).astype(np.int16)[:, None]
    wav = riff.encode_wav(s, 16000)
    assert np.array_equal(mm.decode_audio(wav, 16000, 1), s)
    # non-RIFF bytes → deterministic stub fallback
    raw = bytes(range(256)) * 4
    assert np.array_equal(
        mm.decode_audio(raw, 16000, 1), mm._stub_decode_audio(raw, 16000, 1)
    )
    rgb = _frames(3)
    avi = riff.encode_avi(rgb, 25.0, codec="DIB ")
    luma = mm.decode_video(avi, 32, 24, 3)
    assert luma.shape == (3, 24, 32)
    assert np.array_equal(
        mm.decode_video(raw, 8, 8, 2), mm._stub_decode_video(raw, 8, 8, 2)
    )


def test_schemas_and_fixtures():
    audio, video = mm.synth_media_tables()
    assert audio.schema.equals(mm.AUDIO_SCHEMA)
    assert video.schema.equals(mm.VIDEO_SCHEMA)
    assert len(audio) == 64 and len(video) == 16
    # fixture payloads are real containers, not raw bytes (WAV/FLAC mix)
    blobs = audio.column("bytes").to_pylist()
    assert all(b[:4] in (b"RIFF", b"fLaC") for b in blobs)
    assert any(b[:4] == b"RIFF" for b in blobs)
    assert any(b[:4] == b"fLaC" for b in blobs)
    assert all(b[8:12] == b"AVI " for b in video.column("bytes").to_pylist())


def test_audio_features_deterministic():
    audio, _ = mm.synth_media_tables()
    a = mm.AudioFeatures()(audio)
    b = mm.AudioFeatures()(audio)
    assert a.equals(b)
    assert a.column_names == ["media_id", "n_samples", "rms1000", "zero_crossings", "peak"]
    # n_samples matches the container's actual frame count (WAV or FLAC)
    ns = a.column("n_samples").to_numpy()
    want = np.array(
        [len(mm.decode_audio(x, 16000, 1))
         for x in audio.column("bytes").to_pylist()]
    )
    assert (ns == want).all()
    assert (a.column("peak").to_numpy() > 0).all()


def test_video_frame_sample_stride():
    _, video = mm.synth_media_tables()
    out = mm.VideoFrameSample(every=10)(video)
    import collections

    per = collections.Counter(out.column("media_id").to_pylist())
    nf = dict(zip(video.column("media_id").to_pylist(), video.column("n_frames").to_numpy()))
    for mid, cnt in per.items():
        assert cnt == -(-int(nf[mid]) // 10)  # ceil(n_frames / stride)
    frames = out.column("frame").to_numpy()
    assert (frames % 10 == 0).all()


def test_stages_run_as_ray_actor_pools(ray_session):
    import ray.data as rd

    audio, video = mm.synth_media_tables()
    feats = (
        rd.from_arrow(audio)
        .map_batches(mm.AudioFeatures, batch_format="pyarrow", batch_size=16,
                     concurrency=(1, 2))
        .to_pandas()
    )
    assert len(feats) == 64
    frames = (
        rd.from_arrow(video)
        .map_batches(mm.VideoFrameSample, batch_format="pyarrow", batch_size=8,
                     concurrency=(1, 2))
        .to_pandas()
    )
    assert len(frames) == sum(-(-int(n) // 10) for n in video.column("n_frames").to_numpy())
    # distributed result equals the single-process run exactly
    local = mm.VideoFrameSample(every=10)(video).to_pandas()
    lhs = frames.sort_values(["media_id", "frame"]).reset_index(drop=True)
    rhs = local.sort_values(["media_id", "frame"]).reset_index(drop=True)
    assert lhs.equals(rhs)


# ------------------------------------------ spectrogram / scene changes


def test_audio_spectrogram_sine_invariants():
    import pyarrow as pa

    from gdal_ray.codecs.riff import encode_wav
    from gdal_ray.stages.multimodal import AudioSpectrogram

    sr = 8000
    t = np.arange(sr) / sr
    # pure 1 kHz tone: spectral centroid ~1 kHz, dominant bin = 1000/31.25
    tone = (np.sin(2 * np.pi * 1000.0 * t) * 20000).astype(np.int16)
    wav = encode_wav(tone[:, None], sr)
    batch = pa.table({
        "media_id": pa.array(["tone"]),
        "bytes": pa.array([wav], pa.binary()),
        "sample_rate": pa.array([sr], pa.int32()),
        "n_channels": pa.array([1], pa.int32()),
    })
    row = AudioSpectrogram(n_fft=256, hop=128)(batch).to_pandas().iloc[0]
    assert abs(row.centroid_hz - 1000.0) < 40.0
    assert row.dom_bin_mid == round(1000.0 / (sr / 256))
    assert row.n_stft == 1 + (sr - 256) // 128
    # low tone concentrates energy in the bottom band
    low = (np.sin(2 * np.pi * 60.0 * t) * 20000).astype(np.int16)
    batch2 = pa.table({
        "media_id": pa.array(["low"]),
        "bytes": pa.array([encode_wav(low[:, None], sr)], pa.binary()),
        "sample_rate": pa.array([sr], pa.int32()),
        "n_channels": pa.array([1], pa.int32()),
    })
    r2 = AudioSpectrogram(n_fft=256, hop=128)(batch2).to_pandas().iloc[0]
    assert r2.e_low > 0.9


def test_video_scene_changes_hard_cut():
    import pyarrow as pa

    from gdal_ray.codecs.riff import encode_avi
    from gdal_ray.stages.multimodal import VideoSceneChanges

    # 12 frames: dark scene, hard cut at frame 6 to bright scene
    frames = np.zeros((12, 32, 48, 3), dtype=np.uint8)
    frames[:6] = 20
    frames[6:] = 200
    avi = encode_avi(frames, fps=10, codec="DIB ")
    batch = pa.table({
        "media_id": pa.array(["cut"]),
        "bytes": pa.array([avi], pa.binary()),
        "w": pa.array([48], pa.int32()),
        "h": pa.array([32], pa.int32()),
        "n_frames": pa.array([12], pa.int32()),
        "codec": pa.array(["dib"]),
    })
    out = VideoSceneChanges(threshold=50.0)(batch).to_pandas()
    assert len(out) == 1
    assert out.iloc[0].frame == 6
    assert out.iloc[0].score > 150.0


def test_audio_resample_invariants():
    import pyarrow as pa

    from gdal_ray.codecs.riff import decode_wav, encode_wav
    from gdal_ray.stages.multimodal import AudioResample

    sr_in, sr_out = 8000, 16000
    n = 4000
    # linear ramp resamples EXACTLY under linear interpolation
    ramp = np.linspace(-16000, 16000, n).astype(np.int16)
    batch = pa.table({
        "media_id": pa.array(["ramp"]),
        "bytes": pa.array([encode_wav(ramp[:, None], sr_in)], pa.binary()),
        "sample_rate": pa.array([sr_in], pa.int32()),
        "n_channels": pa.array([1], pa.int32()),
    })
    row = AudioResample(sr_out)(batch).to_pandas().iloc[0]
    assert row.n_samples == n * 2
    got, sr = decode_wav(row.bytes)
    assert sr == sr_out
    t_out = np.arange(n * 2) * (sr_in / sr_out)
    want = np.clip(np.round(np.interp(
        t_out, np.arange(n), ramp.astype(np.float64))), -32768, 32767)
    np.testing.assert_array_equal(got[:, 0], want.astype(np.int16))

    # tone frequency survives: zero-crossing count is rate-invariant
    t = np.arange(sr_in) / sr_in
    tone = (np.sin(2 * np.pi * 440.0 * t) * 20000).astype(np.int16)
    b2 = pa.table({
        "media_id": pa.array(["tone"]),
        "bytes": pa.array([encode_wav(tone[:, None], sr_in)], pa.binary()),
        "sample_rate": pa.array([sr_in], pa.int32()),
        "n_channels": pa.array([1], pa.int32()),
    })
    r2 = AudioResample(sr_out)(b2).to_pandas().iloc[0]
    s2, _ = decode_wav(r2.bytes)
    zc_in = int(np.count_nonzero(np.diff(np.signbit(tone.astype(np.int32)))))
    zc_out = int(np.count_nonzero(np.diff(np.signbit(s2[:, 0].astype(np.int32)))))
    assert abs(zc_in - zc_out) <= 2
