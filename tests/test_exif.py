"""EXIF APP1 (codecs/exif.py): build/parse round trip, exact decimal
degrees, container safety, marker-walk robustness."""

import struct

import numpy as np

from gdal_ray.codecs import decode, encode
from gdal_ray.codecs.exif import (build_exif_app1, inject_app1,
                                  parse_exif)


def _jpeg():
    return encode((np.arange(256).reshape(16, 16) % 256).astype(np.uint8),
                  "jpeg-real")


def test_round_trip_all_fields():
    app1 = build_exif_app1(orientation=6, datetime="2021:06:05 04:03:02",
                           lat_dms=(48, 51, 291234, 10000),
                           lon_dms=(2, 21, 31234, 10000),
                           lat_ref="N", lon_ref="E")
    meta = parse_exif(inject_app1(_jpeg(), app1))
    assert meta["orientation"] == 6
    assert meta["datetime"] == "2021:06:05 04:03:02"
    assert meta["lat"] == (48 + 51 / 60.0) + (291234 / 10000.0) / 3600.0
    assert meta["lon"] == (2 + 21 / 60.0) + (31234 / 10000.0) / 3600.0
    assert meta["gps"][0x0002] == [(48, 1), (51, 1), (291234, 10000)]


def test_hemisphere_signs():
    app1 = build_exif_app1(orientation=1,
                           lat_dms=(10, 0, 0, 1), lon_dms=(20, 30, 0, 1),
                           lat_ref="S", lon_ref="W")
    meta = parse_exif(inject_app1(_jpeg(), app1))
    assert meta["lat"] == -10.0
    assert meta["lon"] == -(20 + 30 / 60.0)


def test_decode_unaffected_and_no_exif_empty():
    j = _jpeg()
    app1 = build_exif_app1(orientation=3)
    j2 = inject_app1(j, app1)
    assert np.array_equal(decode(j2, "jpeg"), decode(j, "jpeg"))
    assert parse_exif(j) == {}


def test_marker_walk_skips_other_segments():
    # APP0 (JFIF) before APP1 must be skipped, not mistaken for EXIF
    j = _jpeg()
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02" + b"\0" * 7
    app1 = build_exif_app1(orientation=5)
    j2 = b"\xff\xd8" + app0 + app1 + j[2:]
    assert parse_exif(j2)["orientation"] == 5


def test_orientation_only_minimal_segment():
    app1 = build_exif_app1(orientation=8)
    meta = parse_exif(inject_app1(_jpeg(), app1))
    assert meta == {"orientation": 8}


def test_apply_orientation_table():
    from gdal_ray.codecs.exif import apply_orientation

    img = np.arange(12).reshape(3, 4)
    # camera stored the pixels transformed; applying the SAME tag must
    # invert back for the self-inverse ops (1,2,3,4,5,7) and compose to
    # identity via the paired rotations (6 then 8)
    for o in (1, 2, 3, 4, 5, 7):
        assert np.array_equal(apply_orientation(apply_orientation(img, o), o),
                              img)
    assert np.array_equal(
        apply_orientation(apply_orientation(img, 6), 8), img)
    # rotate 90 CW: first row becomes last column
    r = apply_orientation(img, 6)
    assert r.shape == (4, 3)
    assert np.array_equal(r[:, -1], img[0])
    # rotate 90 CCW: first row becomes first column reversed
    r8 = apply_orientation(img, 8)
    assert np.array_equal(r8[:, 0], img[0][::-1])
    # multiband passthrough
    rgb = np.dstack([img, img, img])
    assert apply_orientation(rgb, 6).shape == (4, 3, 3)


def test_quarantine_split(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages.quarantine import split_quarantine

    png = encode((np.arange(64).reshape(8, 8) % 256).astype(np.uint8), "png")
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "bytes": pa.array([png, b"junkjunkjunk", png[:20], png],
                          pa.binary()),
    })
    good, bad = split_quarantine(rd.from_arrow(tbl))
    g = good.sort("doc_id").take_all()
    b = bad.sort("doc_id").take_all()
    assert [r["doc_id"] for r in g] == [0, 3]
    assert all(r["w_dec"] == 8 and r["h_dec"] == 8 for r in g)
    assert [(r["doc_id"], r["reason"]) for r in b] == [
        (1, "unknown_container"), (2, "corrupt_stream")]
    assert len(g) + len(b) == 4  # nothing lost, nothing duplicated
