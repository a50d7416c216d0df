"""WebDataset tar shard sink (state/tarsink.py): stdlib-tarfile interop
both ways, byte determinism, shard resume."""

import io
import os
import tarfile
import tempfile

import pyarrow as pa
import pytest

from gdal_ray.state import tarsink


MEMBERS = [
    ("000000000000.txt", b""),                      # zero-size member
    ("000000000001.txt", b"x" * 511),               # one block minus 1
    ("000000000002.txt", b"y" * 512),               # exactly one block
    ("000000000003.txt", b"z" * 513),               # spills into block 2
    ("000000000003.cls", "café".encode()),     # non-ASCII utf-8
]


def test_stdlib_tarfile_reads_our_archive():
    data = tarsink.tar_bytes(MEMBERS)
    # predicted size: per member 512*(1+ceil(sz/512)) + 1024 trailer
    predicted = sum(512 * (1 + (len(d) + 511) // 512) for _, d in MEMBERS) + 1024
    assert len(data) == predicted
    with tarfile.open(fileobj=io.BytesIO(data)) as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == MEMBERS


def test_we_read_stdlib_ustar_archive():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in MEMBERS:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    assert tarsink.read_tar(buf.getvalue()) == MEMBERS


def test_tar_bytes_deterministic():
    assert tarsink.tar_bytes(MEMBERS) == tarsink.tar_bytes(MEMBERS)


def test_write_wds_shards_roundtrip_and_resume(ray_session):
    import ray.data as rd

    n = 37
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"doc {i} body" * (i % 4) for i in range(n)]),
        "lang": pa.array(["en", "fr", "de"][i % 3] for i in range(n)),
    })
    out = tempfile.mkdtemp(prefix="wds_test_")
    ds = rd.from_arrow(tbl).repartition(4)
    stats = tarsink.write_wds_shards(
        ds, out, n_shards=4, fields=[("text", "txt"), ("lang", "cls")],
        lineage="v1").sort("shard").take_all()
    assert [r["shard"] for r in stats] == [0, 1, 2, 3]
    assert sum(r["n_members"] for r in stats) == 2 * n

    # every shard parses back; members grouped by basename; sizes match stat
    seen = {}
    for r in stats:
        path = os.path.join(out, f"shard-{r['shard']:05d}.tar")
        assert os.path.getsize(path) == r["tar_bytes"]
        for name, data in tarsink.read_tar(path):
            base, ext = name.split(".")
            assert int(base) % 4 == r["shard"]
            seen[(int(base), ext)] = data
    for i in range(n):
        assert seen[(i, "txt")] == (f"doc {i} body" * (i % 4)).encode()
        assert seen[(i, "cls")] == ["en", "fr", "de"][i % 3].encode()

    # resume: same lineage → files untouched, stats identical
    mtimes = {f: os.path.getmtime(os.path.join(out, f))
              for f in os.listdir(out) if f.endswith(".tar")}
    stats2 = tarsink.write_wds_shards(
        rd.from_arrow(tbl), out, n_shards=4,
        fields=[("text", "txt"), ("lang", "cls")],
        lineage="v1").sort("shard").take_all()
    assert stats2 == stats
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, f)) == m
    # new lineage → rewritten
    stats3 = tarsink.write_wds_shards(
        rd.from_arrow(tbl), out, n_shards=4,
        fields=[("text", "txt"), ("lang", "cls")],
        lineage="v2").sort("shard").take_all()
    assert stats3 == stats


def test_binary_field_members(ray_session):
    import ray.data as rd

    tbl = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "img": pa.array([b"\x89PNG\0\1", b""], pa.binary()),
    })
    out = tempfile.mkdtemp(prefix="wds_bin_")
    tarsink.write_wds_shards(
        rd.from_arrow(tbl), out, n_shards=1,
        fields=[("img", "png")], lineage="b1").take_all()
    got = dict(tarsink.read_tar(os.path.join(out, "shard-00000.tar")))
    assert got["000000000000.png"] == b"\x89PNG\0\1"
    assert got["000000000001.png"] == b""


def test_name_too_long_raises():
    with pytest.raises(ValueError):
        tarsink.ustar_header("x" * 101, 0)


def test_peek_wds_extensions(tmp_path):
    path = str(tmp_path / "s.tar")
    tarsink.write_tar(path, MEMBERS + [("000000000004.png", b"\x01\x02")])
    assert tarsink.peek_wds_extensions(path) == ["txt", "cls", "png"]


def test_read_webdataset_roundtrip(ray_session):
    import ray.data as rd

    n = 41
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"body {i} " * (i % 5) for i in range(n)]),
        "lang": pa.array(["en", "fr", "de"][i % 3] for i in range(n)),
    })
    out = tempfile.mkdtemp(prefix="wds_rt_")
    tarsink.write_wds_shards(
        rd.from_arrow(tbl).repartition(3), out, n_shards=4,
        fields=[("text", "txt"), ("lang", "cls")], lineage="rt1").take_all()

    got = (tarsink.read_webdataset(out).to_pandas()
           .assign(doc_id=lambda d: d["key"].astype("int64"))
           .sort_values("doc_id").reset_index(drop=True))
    src = tbl.to_pandas()
    assert list(got["doc_id"]) == list(src["doc_id"])
    assert list(got["txt"]) == list(src["text"])
    assert list(got["cls"]) == list(src["lang"])


def test_read_webdataset_binary_and_missing(ray_session, tmp_path):
    # sample 0 has txt+png, sample 1 only txt -> png null; png stays bytes
    path = str(tmp_path / "m.tar")
    tarsink.write_tar(path, [
        ("000000000000.txt", b"a"),
        ("000000000000.png", b"\x89PNG"),
        ("000000000001.txt", b"b"),
    ])
    df = (tarsink.read_webdataset(path, extensions=["txt", "png"],
                                  include_shard_path=True)
          .to_pandas().sort_values("key").reset_index(drop=True))
    assert list(df["txt"]) == ["a", "b"]
    assert df["png"][0] == b"\x89PNG" and df["png"][1] is None
    assert df["shard_path"][0].endswith("m.tar")
