"""World files + PAM .aux.xml sidecars (sources/pam.py) — GDAL's
out-of-band georeferencing and cached statistics."""

import json
import os

import numpy as np
import pytest

from gdal_ray.codecs.tiff import encode_geotiff
from gdal_ray.sources.pam import (
    read_pam_stats,
    read_world_file,
    write_pam_stats,
    write_world_file,
)

GT = (500000.0, 10.0, 0.0, 4650000.0, 0.0, -10.0)


def test_world_file_roundtrip(tmp_path):
    p = str(tmp_path / "x.tif")
    open(p, "wb").write(b"stub")
    wf = write_world_file(p, GT)
    assert wf.endswith(".tfw")
    # world file stores the CENTER of the top-left pixel
    lines = [float(v) for v in open(wf).read().split()]
    assert lines[4] == pytest.approx(GT[0] + GT[1] / 2)
    assert lines[5] == pytest.approx(GT[3] + GT[5] / 2)
    got = read_world_file(p)
    assert got == pytest.approx(GT)


def test_world_file_wld_fallback(tmp_path):
    p = str(tmp_path / "y.png")
    open(p, "wb").write(b"stub")
    wf = write_world_file(p, GT, generic=True)
    assert wf.endswith(".wld")
    assert read_world_file(p) == pytest.approx(GT)


def test_worldfile_feeds_tiff_reader(tmp_path):
    from gdal_ray.sources.gtiff_reader import tiff_levels

    a = (np.arange(40 * 60) % 251).astype(np.uint8).reshape(40, 60)
    p = str(tmp_path / "nogeo.tif")
    open(p, "wb").write(encode_geotiff(a))        # no embedded georef
    assert tiff_levels(p)[0]["geotransform"] is None
    write_world_file(p, GT)
    assert tiff_levels(p)[0]["geotransform"] == pytest.approx(GT)


def test_pam_stats_roundtrip(tmp_path):
    p = str(tmp_path / "s.tif")
    open(p, "wb").write(b"stub")
    stats = {1: {"min": 0.0, "max": 250.0, "mean": 124.5,
                 "stddev": 72.2},
             2: {"min": 1.0, "max": 2.0, "mean": 1.5, "stddev": 0.5}}
    ap = write_pam_stats(p, stats)
    assert ap == p + ".aux.xml"
    got = read_pam_stats(p)
    assert got == stats


def test_info_writes_then_reads_pam(tmp_path):
    from gdal_ray.info import describe

    a = (np.arange(32 * 48) % 200).astype(np.uint8).reshape(32, 48)
    p = str(tmp_path / "d.tif")
    open(p, "wb").write(encode_geotiff(a, geotransform=GT, epsg=32633))
    first = describe(p, stats=True)
    assert first["stats_source"] == "computed+pam-written"
    assert os.path.exists(p + ".aux.xml")
    second = describe(p, stats=True)
    assert second["stats_source"] == "pam"
    assert second["stats"][0]["min"] == first["stats"][0]["min"]
    assert second["stats"][0]["max"] == first["stats"][0]["max"]
    json.dumps(second)  # info output stays JSON-serializable
