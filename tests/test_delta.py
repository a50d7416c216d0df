"""Incremental file-delta ingest (state/delta.py): add/change/remove
detection, atomic commit, crash-replay semantics."""

import os
import time

from gdal_ray.state import delta


def _touch(p, content=b"x"):
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "wb") as f:
        f.write(content)


def test_delta_lifecycle(tmp_path):
    root = str(tmp_path / "data")
    state = str(tmp_path / "state.json")
    _touch(f"{root}/a/x.parquet", b"one")
    _touch(f"{root}/b/y.parquet", b"two")

    added, changed, removed, fps = delta.file_delta(root, state,
                                                    suffix=".parquet")
    assert added == ["a/x.parquet", "b/y.parquet"]
    assert changed == [] and removed == []

    # crash BEFORE commit: the same delta comes back (no lost work)
    a2, c2, r2, fps2 = delta.file_delta(root, state, suffix=".parquet")
    assert a2 == added and fps2 == fps

    delta.commit_state(state, fps)
    a3, c3, r3, _ = delta.file_delta(root, state, suffix=".parquet")
    assert a3 == [] and c3 == [] and r3 == []

    # change one file (content size), add one, remove one
    time.sleep(0.01)
    _touch(f"{root}/a/x.parquet", b"one-modified")
    _touch(f"{root}/c/z.parquet", b"three")
    os.remove(f"{root}/b/y.parquet")
    a4, c4, r4, fps4 = delta.file_delta(root, state, suffix=".parquet")
    assert a4 == ["c/z.parquet"]
    assert c4 == ["a/x.parquet"]
    assert r4 == ["b/y.parquet"]
    delta.commit_state(state, fps4)
    assert delta.file_delta(root, state, suffix=".parquet")[:3] == ([], [], [])


def test_suffix_filter_and_mtime_only_change(tmp_path):
    root = str(tmp_path / "d")
    state = str(tmp_path / "s.json")
    _touch(f"{root}/keep.parquet")
    _touch(f"{root}/skip.txt")
    added, _, _, fps = delta.file_delta(root, state, suffix=".parquet")
    assert added == ["keep.parquet"]
    delta.commit_state(state, fps)
    # same size, newer mtime → counts as changed (conservative replay)
    time.sleep(0.01)
    os.utime(f"{root}/keep.parquet")
    _, changed, _, _ = delta.file_delta(root, state, suffix=".parquet")
    assert changed == ["keep.parquet"]
