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


def test_incomplete_level_raises(ray_session, tmp_path):
    import ray.data as rd

    items = [{"row0": 0, "col0": 0, "h": 64, "w": 64,
              "data": np.zeros((64, 64, 1), np.uint8).tobytes()}]
    with pytest.raises((ValueError, Exception)):
        write_cog_distributed(rd.from_items(items),
                              str(tmp_path / "x.tif"),
                              width=200, height=200, tile_size=64)
