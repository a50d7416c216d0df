"""PDS3 driver (sources/pds3.py): label round-trips, detached labels,
sample types, parallel slab reads."""

import numpy as np
import pytest

from gdal_ray.sources.pds3 import (read_pds3, read_pds3_array,
                                   read_pds3_meta, write_pds3)


def test_roundtrip_dtypes(tmp_path):
    rng = np.random.default_rng(3)
    for arr in (
        rng.integers(0, 255, (40, 55)).astype(np.uint8),
        rng.integers(-30000, 30000, (33, 21)).astype(">i2"),
        rng.integers(0, 60000, (20, 30)).astype("<u2"),
        rng.normal(size=(17, 19)).astype(">f4"),
        rng.normal(size=(12, 18)).astype("<f8"),
    ):
        p = str(tmp_path / "a.img")
        write_pds3(p, arr)
        out = read_pds3_array(p)
        np.testing.assert_array_equal(out.astype(arr.dtype), arr)


def test_multiband_and_meta(tmp_path):
    rng = np.random.default_rng(5)
    a = rng.integers(0, 4000, (3, 25, 40)).astype(">i2")
    p = str(tmp_path / "cube.img")
    write_pds3(p, a, target_name="MARS")
    m = read_pds3_meta(p)
    assert (m["bands"], m["lines"], m["samples"]) == (3, 25, 40)
    assert m["label"]["TARGET_NAME"] == "MARS"
    assert m["label"]["IMAGE"]["SAMPLE_TYPE"] == "MSB_INTEGER"
    np.testing.assert_array_equal(read_pds3_array(p), a)


def test_detached_label(tmp_path):
    a = np.arange(12, dtype=">u2").reshape(3, 4)
    img = tmp_path / "raw.img"
    img.write_bytes(a.tobytes())
    lbl = tmp_path / "raw.lbl"
    lbl.write_text(
        "PDS_VERSION_ID = PDS3\r\n"
        "RECORD_TYPE = FIXED_LENGTH\r\n"
        "RECORD_BYTES = 8\r\n"
        '^IMAGE = ("raw.img", 1)\r\n'
        "OBJECT = IMAGE\r\n"
        "  LINES = 3\r\n"
        "  LINE_SAMPLES = 4\r\n"
        "  SAMPLE_BITS = 16\r\n"
        "  SAMPLE_TYPE = MSB_UNSIGNED_INTEGER\r\n"
        "END_OBJECT = IMAGE\r\n"
        "END\r\n")
    np.testing.assert_array_equal(read_pds3_array(str(lbl)), a)


def test_parallel_slab_read(tmp_path, ray_session):
    rng = np.random.default_rng(7)
    a = rng.integers(0, 255, (2, 100, 64)).astype(np.uint8)
    p = str(tmp_path / "par.img")
    write_pds3(p, a)
    out = np.zeros_like(a)
    for r in read_pds3(p, rows_per_block=16).take_all():
        blk = np.frombuffer(r["data"], dtype=np.uint8) \
            .reshape(r["n_rows"], 64)
        out[r["band"], r["row0"]:r["row0"] + r["n_rows"]] = blk
    np.testing.assert_array_equal(out, a)


def test_gates(tmp_path):
    with pytest.raises(ValueError):
        p = tmp_path / "x.img"
        p.write_bytes(b"not a label at all\nEND\n")
        read_pds3_meta(str(p))
