"""Multimodal columns beyond images: audio / video as opaque binary
columns with typed metadata, processed by actor-pool map_batches stages.

Decode is REAL for RIFF containers — WAVE (PCM/IEEE float) and AVI
(MJPEG via our from-spec ITU-T T.81 codec, or uncompressed DIB) via
:mod:`gdal_ray.codecs.riff` — for FLAC (from-spec RFC 9639 decoder
incl. LPC subframes, rice partitions and stereo decorrelation,
:mod:`gdal_ray.codecs.flac`), for ISO BMFF / MP4 (from-spec box walker
+ sample tables, :mod:`gdal_ray.codecs.mp4`; MJPEG samples decode end
to end, avc1/hvc1 payloads raise naming the missing codec) and for
MP3 frame INDEXING (:mod:`gdal_ray.codecs.mp3` — headers/duration/
bitrate, the corpus-curation scan; payload decode gated).  Payloads that are none of those fall back
to a clearly-marked deterministic stub (`_stub_decode_audio` /
`_stub_decode_video`) that synthesizes samples/frames from the byte
content; swap those two fallbacks for libsndfile/ffmpeg bindings for
MP3/H.264-class formats and every downstream stage (schema, batch
shapes, actor signatures, output layout) keeps working unchanged.  The
reference analog is the format-driver boundary (frmts/...) which this
engine deliberately treats as a pluggable leaf.

Stages (all callable classes for map_batches actor pools — state built
once per actor in __init__, SURVEY.md §2.3):

- AudioFeatures: bytes → (n_samples, rms1000, zero_crossings, peak)
- VideoFrameSample: bytes → one row per sampled frame with the frame's
  phash (uniform stride sampling, the gdal2tiles task-table idiom)

Batch-size note: binary payloads dominate row size — callers should pass
small batch_size (8-64) exactly like the image decode stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

AUDIO_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("bytes", pa.binary()),
        ("sample_rate", pa.int32()),
        ("n_channels", pa.int32()),
    ]
)

VIDEO_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("n_frames", pa.int32()),
        ("fps", pa.float64()),
    ]
)


def decode_audio(data: bytes, sample_rate: int, n_channels: int) -> np.ndarray:
    """bytes → int samples (n, channels).  RIFF/WAVE decodes for real
    (PCM 8/16/32 + IEEE float, codecs/riff.py), as does FLAC
    (codecs/flac.py); anything else hits the deterministic stub fallback
    (no MP3/AAC codec libs in sandbox)."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        from gdal_ray.codecs.riff import decode_wav

        return decode_wav(data)[0]
    if data[:4] == b"fLaC":
        from gdal_ray.codecs.flac import decode_flac

        return decode_flac(data)[0]
    return _stub_decode_audio(data, sample_rate, n_channels)


def decode_video(data: bytes, w: int, h: int, n_frames: int) -> np.ndarray:
    """bytes → grayscale uint8 frames (n, h, w).  RIFF/AVI decodes for
    real (MJPEG / BI_RGB DIB, codecs/riff.py), reduced to ITU-R 601 luma;
    anything else hits the deterministic stub fallback."""
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        from gdal_ray.codecs.riff import decode_avi

        rgb, _fps = decode_avi(data)
        luma = (
            0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        )
        return np.clip(np.round(luma), 0, 255).astype(np.uint8)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        # animated WebP (round 4c): composed canvases via our VP8/VP8L
        from gdal_ray.codecs.webp_anim import compose_webp_anim

        canvases = compose_webp_anim(data)
        rgb = np.stack([c[:, :, :3] for c in canvases])
        luma = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                + 0.114 * rgb[..., 2])
        return np.clip(np.round(luma), 0, 255).astype(np.uint8)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from gdal_ray.codecs.gif import compose_gif

        canvases = compose_gif(data)
        rgb = np.stack([c[:, :, :3] for c in canvases])
        luma = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                + 0.114 * rgb[..., 2])
        return np.clip(np.round(luma), 0, 255).astype(np.uint8)
    if len(data) >= 12 and data[4:8] == b"ftyp":
        # ISO BMFF (round 4h): real container demux; MJPEG samples decode
        # for real via codecs/jpeg, compressed AV codecs raise loudly
        from gdal_ray.codecs.mp4 import decode_mjpeg_mp4

        frames, _fps = decode_mjpeg_mp4(data)
        if frames.ndim == 4:
            luma = (0.299 * frames[..., 0] + 0.587 * frames[..., 1]
                    + 0.114 * frames[..., 2])
            return np.clip(np.round(luma), 0, 255).astype(np.uint8)
        return frames
    return _stub_decode_video(data, w, h, n_frames)


def _stub_decode_audio(data: bytes, sample_rate: int, n_channels: int) -> np.ndarray:
    """STUB (no libsndfile in sandbox): deterministic int16 samples derived
    from the byte content.  Replace with a real decoder; the contract is
    (n_samples, n_channels) int16."""
    raw = np.frombuffer(data, dtype=np.uint8)
    n = max(len(raw) // (2 * n_channels), 1)
    base = raw[: n * 2 * n_channels]
    if len(base) < n * 2 * n_channels:
        base = np.pad(base, (0, n * 2 * n_channels - len(base)))
    return base.view("<i2").reshape(n, n_channels)


def _stub_decode_video(data: bytes, w: int, h: int, n_frames: int) -> np.ndarray:
    """STUB (no ffmpeg in sandbox): deterministic uint8 frames derived from
    the byte content.  Contract: (n_frames, h, w) grayscale uint8."""
    raw = np.frombuffer(data, dtype=np.uint8)
    need = n_frames * h * w
    reps = -(-need // max(len(raw), 1))
    return np.tile(raw, reps)[:need].reshape(n_frames, h, w)


class AudioFeatures:
    """Actor-pool stage: decode + per-clip features in one fused pass
    (payloads never leave the task undecoded+decoded twice)."""

    def __init__(self, frame: int = 1000):
        self.frame = frame

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = batch.column("media_id")
        blobs = batch.column("bytes").to_pylist()
        srs = batch.column("sample_rate").to_numpy()
        chs = batch.column("n_channels").to_numpy()
        n_samples = np.empty(n, np.int64)
        rms = np.empty(n, np.float64)
        zc = np.empty(n, np.int64)
        peak = np.empty(n, np.int64)
        for i in range(n):
            s = decode_audio(blobs[i], int(srs[i]), int(chs[i]))
            mono = s.astype(np.float64).mean(axis=1)
            n_samples[i] = len(mono)
            head = mono[: self.frame]
            rms[i] = float(np.sqrt(np.mean(head * head))) if len(head) else 0.0
            zc[i] = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
            peak[i] = int(np.abs(s).max()) if s.size else 0
        return pa.table(
            {
                "media_id": ids,
                "n_samples": pa.array(n_samples),
                "rms1000": pa.array(rms),
                "zero_crossings": pa.array(zc),
                "peak": pa.array(peak),
            }
        )


class VideoFrameSample:
    """Actor-pool stage: uniform-stride frame sampling → one output row per
    sampled frame with its phash — frames never shuffle, only the
    64-bit hashes do (the render-contribution idiom)."""

    def __init__(self, every: int = 10):
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        from gdal_ray.synth import phash64

        out_id, out_f, out_h = [], [], []
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        nf = batch.column("n_frames").to_numpy()
        for i in range(len(ids)):
            frames = decode_video(blobs[i], int(ws[i]), int(hs[i]), int(nf[i]))
            for f in range(0, len(frames), self.every):
                out_id.append(ids[i])
                out_f.append(f)
                out_h.append(phash64(frames[f]))
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.string()),
                "frame": pa.array(out_f, pa.int64()),
                "phash": pa.array(out_h, pa.int64()),
            }
        )


def synth_media_tables(n_audio: int = 64, n_video: int = 16, seed: int = 7):
    """Deterministic fixture tables conforming to AUDIO_SCHEMA/VIDEO_SCHEMA.

    Payloads are REAL containers — PCM16 WAVE, FLAC (every 3rd clip;
    lossless, so features are container-invariant), G.711 µ-law WAVE
    (every 6th clip — telephony crawls; lossy companding, decoded by the
    ITU-T formula LUT) and MJPEG/DIB AVI clips (codecs/riff.py,
    codecs/flac.py) — so the decode path exercised in tests and queries
    is the production one, not the stub fallback."""
    from gdal_ray.codecs.flac import encode_flac
    from gdal_ray.codecs.riff import encode_avi, encode_wav, encode_wav_g711

    rng = np.random.Generator(np.random.PCG64(seed))
    a_rows = {k: [] for k in ("media_id", "bytes", "sample_rate", "n_channels")}
    for i in range(n_audio):
        ch = 1 + i % 2
        n = int(rng.integers(1000, 3000))
        t = np.arange(n)[:, None]
        tone = 8000.0 * np.sin(2 * np.pi * (110.0 + 13.0 * i) * t / 16000.0)
        noise = rng.normal(0.0, 600.0, size=(n, ch))
        samples = np.clip(tone + noise, -32768, 32767).astype(np.int16)
        a_rows["media_id"].append(f"aud-{i:06d}")
        if i % 6 == 3:
            payload = encode_wav_g711(samples, 16000, "mulaw")
        elif i % 3 == 2:
            payload = encode_flac(samples, 16000)
        else:
            payload = encode_wav(samples, 16000)
        a_rows["bytes"].append(payload)
        a_rows["sample_rate"].append(16000)
        a_rows["n_channels"].append(ch)
    v_rows = {k: [] for k in ("media_id", "bytes", "w", "h", "n_frames", "fps")}
    for i in range(n_video):
        w, h, nf = 32, 24, 25 + i % 10
        yy, xx = np.mgrid[0:h, 0:w]
        f = np.arange(nf)[:, None, None]
        frames = ((xx + yy + 7 * f + 31 * i) % 256).astype(np.uint8)
        codec = "MJPG" if i % 4 else "DIB "  # mix both stream types
        v_rows["media_id"].append(f"vid-{i:06d}")
        v_rows["bytes"].append(encode_avi(frames, 25.0, codec=codec))
        v_rows["w"].append(w)
        v_rows["h"].append(h)
        v_rows["n_frames"].append(nf)
        v_rows["fps"].append(25.0)
    audio = pa.table(
        {f.name: pa.array(a_rows[f.name], f.type) for f in AUDIO_SCHEMA}
    )
    video = pa.table(
        {f.name: pa.array(v_rows[f.name], f.type) for f in VIDEO_SCHEMA}
    )
    return audio, video


class AudioSpectrogram:
    """Actor-pool stage: STFT magnitude spectrogram features per clip —
    the speech-pipeline front end (public DSP: Hann-windowed frames,
    rfft).  Emits compact per-clip summaries (frames never shuffle):
    n_stft frames, spectral centroid mean, band energies (4 octave-ish
    bands), dominant-bin index of the middle frame.

    numpy rfft over a strided frame view — one vectorized FFT per clip,
    no per-frame Python."""

    def __init__(self, n_fft: int = 256, hop: int = 128):
        self.n_fft = n_fft
        self.hop = hop
        self.window = np.hanning(n_fft)

    def _stft_mag(self, mono: np.ndarray) -> np.ndarray:
        n = len(mono)
        if n < self.n_fft:
            mono = np.pad(mono, (0, self.n_fft - n))
            n = len(mono)
        nfr = 1 + (n - self.n_fft) // self.hop
        sv = np.lib.stride_tricks.as_strided(
            mono, shape=(nfr, self.n_fft),
            strides=(mono.strides[0] * self.hop, mono.strides[0]),
            writeable=False)
        return np.abs(np.fft.rfft(sv * self.window, axis=1))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        srs = batch.column("sample_rate").to_numpy()
        chs = batch.column("n_channels").to_numpy()
        rows = {k: [] for k in ("media_id", "n_stft", "centroid_hz",
                                "e_low", "e_midlow", "e_midhigh", "e_high",
                                "dom_bin_mid")}
        nb = self.n_fft // 2 + 1
        edges = [0, nb // 8, nb // 4, nb // 2, nb]
        for i in range(len(ids)):
            s = decode_audio(blobs[i], int(srs[i]), int(chs[i]))
            mono = s.astype(np.float64).mean(axis=1)
            mag = self._stft_mag(mono)
            power = mag * mag
            tot = power.sum()
            freqs = np.arange(nb) * (float(srs[i]) / self.n_fft)
            cent = float((power.sum(axis=0) * freqs).sum() / tot) \
                if tot > 0 else 0.0
            bands = [float(power[:, a:b].sum() / tot) if tot > 0 else 0.0
                     for a, b in zip(edges[:-1], edges[1:])]
            rows["media_id"].append(ids[i])
            rows["n_stft"].append(mag.shape[0])
            rows["centroid_hz"].append(cent)
            rows["e_low"].append(bands[0])
            rows["e_midlow"].append(bands[1])
            rows["e_midhigh"].append(bands[2])
            rows["e_high"].append(bands[3])
            rows["dom_bin_mid"].append(
                int(np.argmax(mag[mag.shape[0] // 2])))
        return pa.table({
            "media_id": pa.array(rows["media_id"], pa.string()),
            "n_stft": pa.array(rows["n_stft"], pa.int64()),
            "centroid_hz": pa.array(rows["centroid_hz"], pa.float64()),
            "e_low": pa.array(rows["e_low"], pa.float64()),
            "e_midlow": pa.array(rows["e_midlow"], pa.float64()),
            "e_midhigh": pa.array(rows["e_midhigh"], pa.float64()),
            "e_high": pa.array(rows["e_high"], pa.float64()),
            "dom_bin_mid": pa.array(rows["dom_bin_mid"], pa.int64()),
        })


class VideoSceneChanges:
    """Actor-pool stage: scene-change detection by mean-absolute frame
    difference over a luma downsample (the classic shot-boundary
    baseline).  Emits one row per detected cut (frame index + score);
    frames never leave the task."""

    def __init__(self, threshold: float = 12.0, pool: int = 8):
        self.threshold = threshold
        self.pool = pool

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame": [], "score": []}
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        nf = batch.column("n_frames").to_numpy()
        p = self.pool
        for i in range(len(ids)):
            frames = decode_video(blobs[i], int(ws[i]), int(hs[i]),
                                  int(nf[i])).astype(np.float64)
            if frames.ndim == 4:  # RGB → luma
                frames = (0.299 * frames[..., 0] + 0.587 * frames[..., 1]
                          + 0.114 * frames[..., 2])
            nfr, h, w = frames.shape
            hp, wp = (h // p) * p, (w // p) * p
            small = frames[:, :hp, :wp] \
                .reshape(nfr, hp // p, p, wp // p, p).mean(axis=(2, 4))
            if nfr < 2:
                continue
            diffs = np.abs(np.diff(small, axis=0)).mean(axis=(1, 2))
            for f in np.flatnonzero(diffs > self.threshold):
                out["media_id"].append(ids[i])
                out["frame"].append(int(f + 1))
                out["score"].append(float(diffs[f]))
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.string()),
            "frame": pa.array(out["frame"], pa.int64()),
            "score": pa.array(out["score"], pa.float64()),
        })


class AudioResample:
    """Actor-pool stage: sample-rate conversion by linear interpolation
    (the public baseline resampler; swap a polyphase/sinc kernel where
    quality demands) — one vectorized np.interp per clip+channel, re-
    encoded as 16-bit WAV at the target rate.  A linear ramp resamples
    EXACTLY (linear interp of a linear signal) — the pytest pins that."""

    def __init__(self, sr_out: int = 16000):
        self.sr_out = sr_out

    def __call__(self, batch: pa.Table) -> pa.Table:
        from gdal_ray.codecs.riff import encode_wav

        out = {"media_id": [], "bytes": [], "sample_rate": [],
               "n_samples": [], "n_channels": []}
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        srs = batch.column("sample_rate").to_numpy()
        chs = batch.column("n_channels").to_numpy()
        for i in range(len(ids)):
            sr_in = int(srs[i])
            s = decode_audio(blobs[i], sr_in, int(chs[i])).astype(np.float64)
            n_in, nch = s.shape
            n_out = int(round(n_in * self.sr_out / sr_in))
            t_out = np.arange(n_out) * (sr_in / self.sr_out)
            t_in = np.arange(n_in, dtype=np.float64)
            res = np.empty((n_out, nch))
            for c in range(nch):
                res[:, c] = np.interp(t_out, t_in, s[:, c])
            clipped = np.clip(np.round(res), -32768, 32767).astype(np.int16)
            out["media_id"].append(ids[i])
            out["bytes"].append(encode_wav(clipped, self.sr_out))
            out["sample_rate"].append(self.sr_out)
            out["n_samples"].append(n_out)
            out["n_channels"].append(nch)
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.string()),
            "bytes": pa.array(out["bytes"], pa.binary()),
            "sample_rate": pa.array(out["sample_rate"], pa.int32()),
            "n_samples": pa.array(out["n_samples"], pa.int64()),
            "n_channels": pa.array(out["n_channels"], pa.int32()),
        })
