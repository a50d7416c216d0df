"""gdaladdo -ro analogue: external .ovr sidecar write + reader fallback."""

import json
import os

import numpy as np

from gdal_ray.codecs.tiff import encode_geotiff


def test_addo_tiled_source_and_reader_fallback(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main
    from gdal_ray.sources.gtiff_reader import (assemble, read_geotiff_tiles,
                                               tiff_levels)
    from gdal_ray.stages.resample import downsample_2x2_average

    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, (200, 300), dtype=np.uint8).astype(np.uint8)
    src = tmp_path / "t.tif"
    src.write_bytes(encode_geotiff(img, tile_size=64))

    rc = main(["addo", str(src), "--tile-size", "64"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(str(src) + ".ovr")
    assert rep["levels"] >= 1

    ovr_levels = tiff_levels(str(src) + ".ovr")
    assert (ovr_levels[0]["width"], ovr_levels[0]["height"]) == (150, 100)

    # reader fallback: level 1 of the BASE path resolves to the sidecar
    rows = read_geotiff_tiles(str(src), level=1).to_pandas()
    got = assemble(rows, ovr_levels[0])[:, :, 0]
    want = downsample_2x2_average(img)
    assert got.shape == want.shape
    assert np.array_equal(got, want)


def test_addo_striped_source_via_vrt_regrid(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main
    from gdal_ray.sources.gtiff_reader import tiff_levels

    rng = np.random.RandomState(6)
    img = rng.randint(0, 255, (130, 140), dtype=np.uint8).astype(np.uint8)
    src = tmp_path / "s.tif"
    src.write_bytes(encode_geotiff(img, rows_per_strip=16,
                               geotransform=(0, 1, 0, 130, 0, -1),
                               epsg=3857))

    rc = main(["addo", str(src), "--tile-size", "64"])
    assert rc == 0
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    ovr = tiff_levels(str(src) + ".ovr")
    assert (ovr[0]["width"], ovr[0]["height"]) == (70, 65)
