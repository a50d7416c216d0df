"""Distributed COG writer (state/cogsink.py): cluster-side pyramid +
compression, bit-identical to the single-process encode_cog."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.codecs.tiff import encode_cog, read_cog
from gdal_ray.state.cogsink import write_cog_distributed


def _chunks_ds(arr, tile):
    import ray.data as rd

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, spp = arr.shape
    items = []
    for r0 in range(0, h, tile):
        for c0 in range(0, w, tile):
            blk = arr[r0:r0 + min(tile, h - r0), c0:c0 + min(tile, w - c0)]
            items.append({"row0": r0, "col0": c0,
                          "h": blk.shape[0], "w": blk.shape[1],
                          "data": np.ascontiguousarray(blk).tobytes()})
    return rd.from_items(items, override_num_blocks=max(1, len(items) // 4))


@pytest.mark.parametrize("shape,spp", [((300, 500), 1), ((260, 300), 3)])
def test_distributed_equals_single_process(ray_session, tmp_path, shape, spp):
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 255, shape + (spp,)).astype(np.uint8)
    p = str(tmp_path / "d.tif")
    info = write_cog_distributed(
        _chunks_ds(arr, 128), p, width=shape[1], height=shape[0], spp=spp,
        dtype="u1", tile_size=128,
        geotransform=(10.0, 2.0, 0.0, 50.0, 0.0, -2.0), epsg=3857, nodata=0)
    single = encode_cog(arr.squeeze() if spp == 1 else arr, tile_size=128,
                        geotransform=(10.0, 2.0, 0.0, 50.0, 0.0, -2.0),
                        epsg=3857, nodata=0)
    got = open(p, "rb").read()
    assert got == single  # byte-identical layout + pyramid + compression
    assert info["levels"] == len(read_cog(single))


def test_jpeg_cog_distributed(ray_session, tmp_path):
    """JPEG-compressed COG (compression 7, self-contained tile streams —
    no shared JPEGTables, so distributed tile compression stays
    coordination-free): decodes through the plain reader and the parallel
    range-read path with PSNR > 30."""
    from gdal_ray.codecs.tiff import read_geotiff

    y, x = np.mgrid[0:260, 0:300].astype(np.float64)
    arr = np.clip(np.stack([128 + 90 * np.sin(x / 21) * np.cos(y / 17),
                            128 + 80 * np.cos(x / 13),
                            128 + 70 * np.sin((x + y) / 29)], axis=-1),
                  0, 255).astype(np.uint8)
    p = str(tmp_path / "j.tif")
    write_cog_distributed(_chunks_ds(arr, 128), p, width=300, height=260,
                          spp=3, dtype="u1", tile_size=128,
                          compression="jpeg")
    out, meta = read_geotiff(open(p, "rb").read())
    mse = np.mean((out.astype(float) - arr.astype(float)) ** 2)
    assert 10 * np.log10(255.0 ** 2 / mse) > 30
    with pytest.raises(NotImplementedError):
        write_cog_distributed(_chunks_ds(arr, 128), p, width=300, height=260,
                              spp=3, dtype="u2", tile_size=128,
                              compression="jpeg")


def test_incomplete_level_raises(ray_session, tmp_path):
    import ray.data as rd

    items = [{"row0": 0, "col0": 0, "h": 64, "w": 64,
              "data": np.zeros((64, 64, 1), np.uint8).tobytes()}]
    with pytest.raises((ValueError, Exception)):
        write_cog_distributed(rd.from_items(items),
                              str(tmp_path / "x.tif"),
                              width=200, height=200, tile_size=64)


def test_vrt_to_cog_end_to_end(ray_session, tmp_path):
    """gdalbuildvrt -> distributed COG: mosaic two overlapping sources and
    verify the written COG's full-res level equals the composed mosaic."""
    from gdal_ray.codecs.tiff import encode_geotiff
    from gdal_ray.sources.vrt import read_vrt, save_vrt
    from gdal_ray.state.cogsink import write_cog_distributed
    from gdal_ray.sources.vrt import parse_vrt

    rng = np.random.default_rng(3)
    a = rng.integers(1, 255, (100, 150, 3)).astype(np.uint8)
    b = rng.integers(1, 255, (80, 120, 3)).astype(np.uint8)
    p1 = str(tmp_path / "a.tif")
    p2 = str(tmp_path / "b.tif")
    open(p1, "wb").write(encode_geotiff(
        a, geotransform=(0.0, 1.0, 0.0, 200.0, 0.0, -1.0), tile_size=64))
    open(p2, "wb").write(encode_geotiff(
        b, geotransform=(100.0, 1.0, 0.0, 160.0, 0.0, -1.0),
        rows_per_strip=32))
    vp = str(tmp_path / "m.vrt")
    save_vrt([p1, p2], vp)
    doc = parse_vrt(open(vp).read())

    out = str(tmp_path / "m.tif")
    write_cog_distributed(read_vrt(vp, tile=64), out,
                          width=doc["width"], height=doc["height"],
                          spp=3, dtype="u1", tile_size=64)
    lv0, info0 = read_cog(open(out, "rb").read())[0]

    # union extent: x 0..220, y 80..200 -> 220 x 120
    assert (doc["width"], doc["height"]) == (220, 120)
    exp = np.zeros((120, 220, 3), np.uint8)
    exp[0:100, 0:150] = a        # y 200..100 -> rows 0..100
    exp[40:120, 100:220] = b     # y 160..80  -> rows 40..120, last on top
    assert np.array_equal(lv0, exp)
