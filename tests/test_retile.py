"""gdal_retile analogue (state/retile.py): tile grid, pyramid levels,
resume, and the shapefile tile index."""

import os

import numpy as np
import pytest

from gdal_ray.codecs.tiff import encode_geotiff, read_geotiff
from gdal_ray.state.retile import retile
from gdal_ray.stages.resample import downsample_2x2_average

GT = (500000.0, 10.0, 0.0, 4649776.0, 0.0, -10.0)


def _src(tmp_path, w=300, h=200, spp=3, tiled=False, name="src.tif"):
    rng = np.random.default_rng(42)
    arr = (rng.random((h, w, spp)) * 255).astype(np.uint8)
    if spp == 1:
        arr = arr[:, :, 0]
    path = str(tmp_path / name)
    with open(path, "wb") as f:
        f.write(encode_geotiff(arr, geotransform=GT, epsg=32633,
                               compression="deflate",
                               tile_size=64 if tiled else None))
    return path, (arr if arr.ndim == 3 else arr[:, :, None])


def _assemble(out_dir, level, shape, tile=64):
    out = np.zeros(shape, dtype=np.uint8)
    for fn in os.listdir(os.path.join(out_dir, str(level))):
        r, c = (int(v) for v in fn[:-4].split("_"))
        a, info = read_geotiff(
            open(os.path.join(out_dir, str(level), fn), "rb").read())
        if a.ndim == 2:
            a = a[:, :, None]
        out[r * tile:r * tile + a.shape[0],
            c * tile:c * tile + a.shape[1]] = a
        # every tile's geotransform is the shifted original
        gt = info["geotransform"]
        s = 1 << level
        assert gt[0] == pytest.approx(GT[0] + c * tile * s * GT[1])
        assert gt[3] == pytest.approx(GT[3] + r * tile * s * GT[5])
        assert gt[1] == pytest.approx(GT[1] * s)
        assert info["epsg"] == 32633
    return out


@pytest.mark.parametrize("tiled", [False, True])
def test_level0_exact(tmp_path, ray_session, tiled):
    src, arr = _src(tmp_path, tiled=tiled)
    out = str(tmp_path / "tiles")
    res = retile(src, out, tile_w=64, tile_h=64, levels=1)
    assert res["grid"] == [(4, 5)]
    assert res["tiles"] == 20
    got = _assemble(out, 0, arr.shape)
    np.testing.assert_array_equal(got, arr)


def test_pyramid_even_dims_exact(tmp_path, ray_session):
    # 256×192: every level divides evenly, so per-tile 2×2 average must
    # equal the global downsample exactly
    src, arr = _src(tmp_path, w=256, h=192, spp=1)
    out = str(tmp_path / "tiles")
    res = retile(src, out, tile_w=64, tile_h=64, levels=3)
    assert res["grid"] == [(3, 4), (2, 2), (1, 1)]
    lvl1 = downsample_2x2_average(arr)
    np.testing.assert_array_equal(_assemble(out, 1, lvl1.shape), lvl1)
    lvl2 = downsample_2x2_average(lvl1)
    np.testing.assert_array_equal(_assemble(out, 2, lvl2.shape), lvl2)


def test_odd_dims_pyramid_covers(tmp_path, ray_session):
    src, arr = _src(tmp_path, w=301, h=201, spp=1)
    out = str(tmp_path / "tiles")
    res = retile(src, out, tile_w=64, tile_h=64, levels=2)
    # level 1 is ceil(301/2)=151 × ceil(201/2)=101 -> 2×3 tile grid
    assert res["grid"][1] == (2, 3)
    got = _assemble(out, 1, (101, 151, 1))
    assert got.shape == (101, 151, 1)
    # interior pixels are plain 2×2 means of the source
    exp = downsample_2x2_average(arr[:200, :300])
    np.testing.assert_array_equal(got[:64, :64], exp[:64, :64])


def test_resume_skips_existing(tmp_path, ray_session):
    src, arr = _src(tmp_path)
    out = str(tmp_path / "tiles")
    retile(src, out, tile_w=64, tile_h=64, levels=1, tile_index=False)
    victim = os.path.join(out, "0", "1_2.tif")
    keeper = os.path.join(out, "0", "0_0.tif")
    os.remove(victim)
    mt = os.path.getmtime(keeper)
    retile(src, out, tile_w=64, tile_h=64, levels=1, tile_index=False)
    assert os.path.exists(victim)
    assert os.path.getmtime(keeper) == mt  # untouched = resumed
    got = _assemble(out, 0, arr.shape)
    np.testing.assert_array_equal(got, arr)


def test_tile_index_shapefile(tmp_path, ray_session):
    from gdal_ray.sources.shapefile import read_shapefile

    src, _ = _src(tmp_path, w=256, h=192, spp=1)
    out = str(tmp_path / "tiles")
    res = retile(src, out, tile_w=64, tile_h=64, levels=2)
    t = read_shapefile(res["index"]).to_pandas()
    t = __import__("pyarrow").Table.from_pandas(t)
    assert len(t) == res["tiles"] == 12 + 4
    locs = set(t.column("location").to_pylist())
    assert "0/0_0.tif" in locs and "1/0_0.tif" in locs
    # a level-0 tile footprint is 640 m square at 10 m pixels
    from gdal_ray.geometry.wkb import polygon_rings

    ring = polygon_rings(t.column("wkb")[0].as_py())[0]
    assert ring[:, 0].max() - ring[:, 0].min() == pytest.approx(640.0)
