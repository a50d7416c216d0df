"""Raw raster drivers (SRTM HGT, ENVI, ESRI EHdr — sources/rawgrid.py)
and the BMP codec, vs frmts/srtmhgt, frmts/raw/envidataset.cpp,
frmts/raw/ehdrdataset.cpp, frmts/bmp."""
import os
import struct

import numpy as np
import pytest

from gdal_ray.codecs.bmp import _BI_RLE8, decode_bmp, encode_bmp
from gdal_ray.sources.rawgrid import (
    ehdr_meta, envi_meta, hgt_meta, read_envi_array, read_hgt_array,
    read_rawgrid, write_envi, write_hgt,
)

RNG = np.random.default_rng(9)


# ------------------------------------------------------------------ HGT

def test_hgt_roundtrip_and_georef(tmp_path):
    p = str(tmp_path / "S04W071.hgt")
    dem = RNG.integers(-200, 6000, (1201, 1201)).astype(np.int16)
    write_hgt(p, dem)
    assert np.array_equal(read_hgt_array(p), dem)
    m = hgt_meta(p)
    step = 1.0 / 1200.0
    # SW corner S04 W071 → west edge -71, north edge -3 (+half-cell out)
    assert m["geotransform"] == pytest.approx(
        [-71 - step / 2, step, 0.0, -3 + step / 2, 0.0, -step])
    assert m["nodata"] == -32768
    # payload really is big-endian (first value survives byte-level check)
    raw = open(p, "rb").read(2)
    assert struct.unpack(">h", raw)[0] == dem[0, 0]


def test_hgt_bad_name_and_size(tmp_path):
    with pytest.raises(ValueError, match="SRTM"):
        write_hgt(str(tmp_path / "tile.hgt"), np.zeros((3, 3), np.int16))
    p = str(tmp_path / "N00E000.hgt")
    open(p, "wb").write(b"\x00" * 10)  # 5 samples: not 2*n^2
    with pytest.raises(ValueError, match="2\\*n"):
        hgt_meta(p)


# ----------------------------------------------------------------- ENVI

@pytest.mark.parametrize("il", ["bsq", "bil", "bip"])
def test_envi_roundtrip_all_interleaves(tmp_path, il):
    p = str(tmp_path / f"cube_{il}.img")
    cube = RNG.normal(size=(4, 33, 57)).astype(np.float32)
    gt = [500000.0, 30.0, 0.0, 4600000.0, 0.0, -30.0]
    write_envi(p, cube, interleave=il, geotransform=gt)
    m = envi_meta(p)
    assert (m["bands"], m["height"], m["width"]) == (4, 33, 57)
    assert m["interleave"] == il
    assert m["geotransform"] == gt
    assert np.array_equal(read_envi_array(p), cube)


def test_envi_dtypes(tmp_path):
    for dt in (np.uint8, np.int16, np.int32, np.float64, np.uint16):
        p = str(tmp_path / f"d_{np.dtype(dt).name}.img")
        a = RNG.integers(0, 100, (5, 7)).astype(dt)
        write_envi(p, a)
        assert np.array_equal(read_envi_array(p)[0], a)


# ----------------------------------------------------------------- EHdr

def test_ehdr_meta(tmp_path):
    p = str(tmp_path / "t.bil")
    a = RNG.integers(-500, 500, (10, 8)).astype(">i2")
    open(p, "wb").write(a.tobytes())
    open(str(tmp_path / "t.hdr"), "w").write(
        "NROWS 10\nNCOLS 8\nNBANDS 1\nNBITS 16\nPIXELTYPE SIGNEDINT\n"
        "BYTEORDER M\nLAYOUT BIL\nULXMAP 100.5\nULYMAP 50.5\n"
        "XDIM 1\nYDIM 1\nNODATA -9999\n")
    m = ehdr_meta(p)
    assert m["dtype"] == ">i2"
    # ULXMAP/ULYMAP are pixel centers → GT corners shift half a cell
    assert m["geotransform"] == [100.0, 1.0, 0.0, 51.0, 0.0, -1.0]
    assert m["nodata"] == -9999.0


# ------------------------------------------------------- Ray slab fan-out

def test_rawgrid_ray_read(tmp_path, ray_session):
    p = str(tmp_path / "N10E020.hgt")
    dem = RNG.integers(-10, 100, (1201, 1201)).astype(np.int16)
    write_hgt(p, dem)
    rows = sorted(read_rawgrid(p, rows_per_block=500).take_all(),
                  key=lambda r: r["row0"])
    got = np.concatenate(
        [np.frombuffer(r["data"], ">i2").reshape(-1, 1201) for r in rows])
    assert np.array_equal(got, dem)
    assert [r["n_rows"] for r in rows] == [500, 500, 201]

    # interleaved ENVI through the open registry
    from gdal_ray.sources import open_raster

    pe = str(tmp_path / "cube.img")
    cube = RNG.normal(size=(2, 40, 9)).astype(np.float32)
    write_envi(pe, cube, interleave="bip")
    rows = sorted(open_raster(pe, rows_per_block=16).take_all(),
                  key=lambda r: r["row0"])
    got = np.concatenate(
        [np.frombuffer(r["data"], "<f4").reshape(-1, 9, 2) for r in rows])
    assert np.array_equal(got.transpose(2, 0, 1), cube)


# ------------------------------------------------------------------ BMP

def test_bmp_roundtrips():
    rgb = RNG.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(rgb)), rgb)
    g = RNG.integers(0, 256, (21, 19), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(g)), np.dstack([g] * 3))


def test_bmp_rle8_worked_example():
    # width 7, 2 rows: run(4,7) abs(1,2,3)+pad EOL | run(7,9) EOB
    rle = bytes([4, 7, 0, 3, 1, 2, 3, 0, 0, 0, 7, 9, 0, 1])
    pal = np.zeros((256, 4), np.uint8)
    pal[:, 0] = pal[:, 1] = pal[:, 2] = np.arange(256)
    pix_off = 14 + 40 + 1024
    hdr = b"BM" + struct.pack("<IHHI", pix_off + len(rle), 0, 0, pix_off)
    info = struct.pack("<IiihhIIiiII", 40, 7, 2, 1, 8, _BI_RLE8,
                       len(rle), 0, 0, 256, 0)
    img = decode_bmp(hdr + info + pal.tobytes() + rle)
    assert list(img[1, :, 0]) == [7, 7, 7, 7, 1, 2, 3]  # bottom-up
    assert list(img[0, :, 0]) == [9] * 7


def test_bmp_dispatch_and_info(tmp_path):
    from gdal_ray.codecs import decode, encode
    from gdal_ray.info import describe

    rgb = RNG.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    assert np.array_equal(decode(encode(rgb, "bmp")), rgb)
    p = tmp_path / "i.bmp"
    p.write_bytes(encode_bmp(rgb))
    d = describe(str(p))
    assert d["driver"] == "BMP" and (d["width"], d["height"]) == (6, 5)


def test_info_doors_raw(tmp_path):
    from gdal_ray.info import describe

    p = str(tmp_path / "N51E003.hgt")
    write_hgt(p, np.zeros((121, 121), np.int16))
    assert describe(p)["format"] == "SRTMHGT"
    pe = str(tmp_path / "c.img")
    write_envi(pe, np.zeros((3, 4), np.float32))
    assert describe(pe)["format"] == "ENVI"
