"""Audio/video multimodal plumbing: actor-pool stages over binary media
columns (decode stubbed deterministically; schema/batch/actor plumbing
real and exercised through Ray)."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages import multimodal as mm


def test_schemas_and_fixtures():
    audio, video = mm.synth_media_tables()
    assert audio.schema.equals(mm.AUDIO_SCHEMA)
    assert video.schema.equals(mm.VIDEO_SCHEMA)
    assert len(audio) == 64 and len(video) == 16


def test_audio_features_deterministic():
    audio, _ = mm.synth_media_tables()
    a = mm.AudioFeatures()(audio)
    b = mm.AudioFeatures()(audio)
    assert a.equals(b)
    assert a.column_names == ["media_id", "n_samples", "rms1000", "zero_crossings", "peak"]
    ns = a.column("n_samples").to_numpy()
    assert (ns >= 1).all()
    # stereo rows decode half the mono sample count for the same bytes
    chs = audio.column("n_channels").to_numpy()
    blob_len = np.array([len(x) for x in audio.column("bytes").to_pylist()])
    assert (ns == np.maximum(blob_len // (2 * chs), 1)).all()


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
