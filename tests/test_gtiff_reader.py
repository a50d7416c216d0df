"""Parallel GeoTIFF/COG reader (sources/gtiff_reader.py): header-region
parse + per-task tile range reads.  Reference idiom: COG range reads
(frmts/gtiff/cogdriver.cpp layout)."""

import numpy as np
import pytest

from gdal_ray.codecs.tiff import encode_cog, encode_geotiff
from gdal_ray.sources.gtiff_reader import (
    assemble,
    read_geotiff_tiles,
    tiff_levels,
)


def _src(h, w, bands=3, dtype=np.uint8, seed=3):
    rng = np.random.default_rng(seed)
    if np.issubdtype(dtype, np.integer):
        a = rng.integers(0, 255, size=(h, w, bands)).astype(dtype)
    else:
        a = rng.normal(size=(h, w, bands)).astype(dtype)
    return a


def test_levels_metadata_without_data_read(tmp_path):
    p = str(tmp_path / "c.tif")
    open(p, "wb").write(encode_cog(_src(600, 900), tile_size=256))
    lv = tiff_levels(p)
    assert [l["width"] for l in lv] == [900, 450, 225]
    assert lv[0]["tiled"] and lv[0]["tile_w"] == 256
    assert len(lv[0]["offsets"]) == 4 * 3


@pytest.mark.parametrize("compression", ["deflate", "lzw", "packbits", "none"])
def test_parallel_tiled_read(ray_session, tmp_path, compression):
    arr = _src(300, 500)
    p = str(tmp_path / f"t_{compression}.tif")
    open(p, "wb").write(encode_geotiff(arr, tile_size=128,
                                       compression=compression))
    meta = tiff_levels(p)[0]
    rows = read_geotiff_tiles(p).to_pandas()
    assert len(rows) == 3 * 4  # ceil(300/128) x ceil(500/128)
    assert np.array_equal(assemble(rows, meta), arr)


def test_parallel_striped_read_with_predictor(ray_session, tmp_path):
    arr = _src(200, 77, bands=1, dtype=np.uint16)
    p = str(tmp_path / "s.tif")
    open(p, "wb").write(encode_geotiff(arr, rows_per_strip=37,
                                       compression="deflate", predictor=True))
    meta = tiff_levels(p)[0]
    rows = read_geotiff_tiles(p).to_pandas()
    assert len(rows) == (200 + 36) // 37
    assert np.array_equal(assemble(rows, meta).squeeze(), arr.squeeze())


def test_overview_level_read(ray_session, tmp_path):
    from gdal_ray.codecs.tiff import _2x_reduce

    arr = _src(600, 600)
    p = str(tmp_path / "c2.tif")
    open(p, "wb").write(encode_cog(arr, tile_size=256))
    meta1 = tiff_levels(p)[1]
    rows = read_geotiff_tiles(p, level=1).to_pandas()
    got = assemble(rows, meta1)
    assert np.array_equal(got, _2x_reduce(arr, "average"))


def test_float_dtype(ray_session, tmp_path):
    arr = _src(100, 90, bands=1, dtype=np.float32)
    p = str(tmp_path / "f.tif")
    open(p, "wb").write(encode_geotiff(arr, tile_size=64))
    meta = tiff_levels(p)[0]
    rows = read_geotiff_tiles(p).to_pandas()
    assert np.array_equal(assemble(rows, meta), arr)


def test_float_predictor3_parallel_read(tmp_path, ray_session):
    from gdal_ray.codecs.tiff import encode_geotiff
    from gdal_ray.sources.gtiff_reader import read_geotiff_tiles

    rng = np.random.default_rng(6)
    a = np.cumsum(rng.normal(size=(70, 90)), axis=1).astype(np.float32)
    p = str(tmp_path / "fp3.tif")
    open(p, "wb").write(encode_geotiff(a, compression="deflate",
                                       predictor=True, tile_size=32))
    out = np.zeros_like(a)
    for r in read_geotiff_tiles(p).take_all():
        blk = np.frombuffer(r["data"], dtype=np.float32) \
            .reshape(r["h"], r["w"])
        out[r["row0"]:r["row0"] + r["h"],
            r["col0"]:r["col0"] + r["w"]] = blk
    np.testing.assert_array_equal(out, a)


@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("compression", ["deflate", "none"])
def test_planar_config2_roundtrip(ray_session, tmp_path, tiled, compression):
    """PlanarConfiguration=2 (INTERLEAVE=BAND): encode plane-major chunks,
    read back exactly through BOTH the in-memory codec and the parallel
    tile reader (TIFF 6.0 PlanarConfiguration; frmts/gtiff interleave)."""
    from gdal_ray.codecs.tiff import read_geotiff

    arr = _src(150, 220, bands=3, dtype=np.uint16)
    p = str(tmp_path / "planar.tif")
    open(p, "wb").write(encode_geotiff(
        arr, compression=compression, planar=True,
        tile_size=64 if tiled else None, rows_per_strip=None if tiled else 37,
        geotransform=(10.0, 2.0, 0, 90.0, 0, -2.0), epsg=32633))

    out, info = read_geotiff(open(p, "rb").read())
    np.testing.assert_array_equal(out, arr)
    assert info["epsg"] == 32633

    meta = tiff_levels(p)[0]
    assert meta["planar"] == 2
    rows = read_geotiff_tiles(p).to_pandas()
    np.testing.assert_array_equal(assemble(rows, meta), arr)


def test_planar_predictor_roundtrip(ray_session, tmp_path):
    arr = _src(90, 130, bands=2, dtype=np.int16)
    p = str(tmp_path / "planar_pred.tif")
    open(p, "wb").write(encode_geotiff(arr, compression="deflate",
                                       planar=True, predictor=True))
    meta = tiff_levels(p)[0]
    rows = read_geotiff_tiles(p).to_pandas()
    np.testing.assert_array_equal(assemble(rows, meta), arr)
