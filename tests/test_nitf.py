"""NITF 2.1 driver (gdal_ray/sources/nitf.py) — MIL-STD-2500C layout,
IC=NC, IMODE B/P/S, blocked, multi-segment, ICORDS=D georeferencing."""

import numpy as np
import pytest

from gdal_ray.sources.nitf import (
    encode_nitf,
    nitf_meta,
    read_nitf_array,
    write_nitf,
)


def _img(dtype, h, w, bands=1, seed=5):
    rng = np.random.default_rng(seed)
    if np.dtype(dtype).kind == "f":
        a = rng.normal(size=(h, w, bands)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        a = rng.integers(info.min, info.max, size=(h, w, bands),
                         endpoint=True).astype(dtype)
    return a[:, :, 0] if bands == 1 else a


@pytest.mark.parametrize("dtype,bands,imode", [
    (np.uint8, 1, "B"), (np.uint8, 3, "B"), (np.uint8, 3, "P"),
    (np.uint8, 3, "S"), (np.uint16, 1, "B"), (np.int16, 2, "S"),
    (np.float32, 1, "B"), (np.int32, 1, "P"), (np.float64, 1, "B"),
])
def test_roundtrip(tmp_path, dtype, bands, imode):
    a = _img(dtype, 45, 62, bands)
    p = str(tmp_path / "t.ntf")
    write_nitf(p, a, imode=imode)
    out = read_nitf_array(p)
    exp = a[:, :, None] if a.ndim == 2 else a
    assert out.shape == exp.shape and np.array_equal(out, exp)


def test_blocked_padded_edges(tmp_path):
    # 3 x 2 block grid with ragged edges on both axes
    a = _img(np.uint8, 70, 50, 3)
    p = str(tmp_path / "b.ntf")
    write_nitf(p, a, block_size=32, imode="P")
    m = nitf_meta(p)["images"][0]
    assert (m["nbpc"], m["nbpr"]) == (3, 2)
    assert (m["nppbv"], m["nppbh"]) == (32, 32)
    assert np.array_equal(read_nitf_array(p), a)


def test_header_lengths_and_fields(tmp_path):
    a = _img(np.uint8, 20, 30)
    p = str(tmp_path / "h.ntf")
    write_nitf(p, a, ostaid="TESTSTN")
    raw = open(p, "rb").read()
    m = nitf_meta(p)
    assert raw[:9] == b"NITF02.10"
    assert int(raw[342:354]) == len(raw)       # FL matches the file
    assert int(raw[354:360]) == m["header_len"]
    assert m["ostaid"] == "TESTSTN"
    im = m["images"][0]
    assert (im["width"], im["height"], im["bands"]) == (30, 20, 1)
    # LISH in the file header equals the actual subheader span
    lish = int(raw[363:369])
    assert raw[m["header_len"]:m["header_len"] + 2] == b"IM"
    assert im["data_offset"] == m["header_len"] + lish


def test_multi_segment(tmp_path):
    a0 = _img(np.uint8, 16, 16, 1, seed=1)
    a1 = _img(np.uint16, 9, 33, 2, seed=2)
    p = str(tmp_path / "m.ntf")
    write_nitf(p, [a0, a1])
    m = nitf_meta(p)
    assert len(m["images"]) == 2
    assert np.array_equal(read_nitf_array(p, 0)[:, :, 0], a0)
    assert np.array_equal(read_nitf_array(p, 1), a1)


def test_igeolo_geotransform(tmp_path):
    # corners exactly representable at the field's 3-decimal width
    gt = (10.000, 0.010, 0.0, 52.000, 0.0, -0.005)
    a = _img(np.uint8, 40, 80)
    p = str(tmp_path / "g.ntf")
    write_nitf(p, a, geotransform=gt)
    got = nitf_meta(p)["images"][0]["geotransform"]
    assert got is not None
    assert np.allclose(got, gt, atol=1e-9)


def test_ray_block_reader(tmp_path, ray_session):
    from gdal_ray.sources import open_raster

    a = _img(np.uint8, 70, 50, 3, seed=9)
    p = str(tmp_path / "r.ntf")
    write_nitf(p, a, block_size=32, imode="B")
    rows = open_raster(p).take_all()
    assert len(rows) == 6
    out = np.zeros_like(a)
    for r in rows:
        blk = np.frombuffer(r["data"], np.uint8).reshape(r["h"], r["w"], 3)
        out[r["y0"]:r["y0"] + r["h"], r["x0"]:r["x0"] + r["w"]] = blk
    assert np.array_equal(out, a)


def test_info_door(tmp_path):
    from gdal_ray.info import describe

    p = str(tmp_path / "i.ntf")
    write_nitf(p, _img(np.int16, 12, 34))
    d = describe(p)
    assert d["driver"] == "NITF" and (d["width"], d["height"]) == (34, 12)
    assert d["dtype"] == "int16"


def test_gates(tmp_path):
    with pytest.raises(NotImplementedError):
        encode_nitf(_img(np.uint8, 4, 4), imode="R")
    with pytest.raises(NotImplementedError):
        encode_nitf(_img(np.uint8, 4, 4, 3).repeat(4, axis=2))  # 12 bands
    p = str(tmp_path / "v20.ntf")
    data = bytearray(encode_nitf(_img(np.uint8, 4, 4)))
    data[:9] = b"NITF02.00"
    open(p, "wb").write(bytes(data))
    with pytest.raises(NotImplementedError, match="2.0"):
        nitf_meta(p)
    data[:9] = b"GARBAGE!!"
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="not a NITF"):
        nitf_meta(p)


def test_nitf_c8_jpeg2000_segment():
    """IC=C8 (JPEG 2000 in NITF) via the from-spec EBCOT codec — the
    autotest's published checksums for test_jp2_ecw33.ntf
    (autotest/gdrivers/nitf.py:901 nitf_check_created_file 32398/42502/
    38882) decode bit-exact."""
    import numpy as np

    from gdal_ray.sources.nitf import nitf_meta, read_nitf_array
    from gdal_ray.stages.stats import checksum_plane

    p = "/root/reference/autotest/gdrivers/data/nitf/test_jp2_ecw33.ntf"
    m = nitf_meta(p)
    assert m["images"][0]["ic"] == "C8"
    a = read_nitf_array(p)
    assert a.shape == (100, 200, 3)
    assert [checksum_plane(a[:, :, i]) for i in range(3)] == \
        [32398, 42502, 38882]

    # mixed-IC file: segment 0 uncompressed, segment 1 JPEG 2000
    p2 = "/root/reference/autotest/gdrivers/data/nitf/two_images_jp2.ntf"
    m2 = nitf_meta(p2)
    assert [im["ic"] for im in m2["images"]] == ["NC", "C8"]
    assert read_nitf_array(p2, segment=1).shape == (20, 20, 1)
