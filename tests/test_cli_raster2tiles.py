"""raster2tiles CLI door: georeferenced GeoTIFF -> XYZ PNG pyramid in
MBTiles (gdal2tiles semantics: 3857 tile grid, alpha outside source,
4->1 average overviews)."""

import json
import sqlite3

import numpy as np

from gdal_ray.codecs.png import decode_png
from gdal_ray.codecs.tiff import encode_geotiff


def test_cli_raster2tiles(ray_session, tmp_path, capsys):
    from gdal_ray.cli import main

    # a 4326 raster covering lon [0, 90], lat [0, 66.5]: the NE quadrant
    # of the z1 tile grid (tile z1 x1 y0)
    H, W = 128, 128
    img = np.zeros((H, W, 3), dtype=np.uint8)
    img[:, :, 0] = 200          # red-dominant so sampling is visible
    img[:, :, 1] = np.linspace(0, 255, W, dtype=np.uint8)[None, :]
    gt = (0.0, 90.0 / W, 0.0, 66.5, 0.0, -66.5 / H)
    src = tmp_path / "q.tif"
    src.write_bytes(encode_geotiff(img, geotransform=gt, epsg=4326))
    out = tmp_path / "q.mbtiles"
    rc = main(["raster2tiles", str(src), str(out), "--zoom", "0-2"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["zooms"] == [0, 2]

    con = sqlite3.connect(str(out))
    rows = con.execute(
        "select zoom_level, tile_column, tile_row, tile_data from tiles"
    ).fetchall()
    con.close()
    by_zoom = {}
    for z, xc, yr, blob in rows:
        by_zoom.setdefault(z, []).append((xc, yr, blob))
    assert set(by_zoom) == {0, 1, 2}
    assert len(by_zoom[0]) == 1

    # z1: source sits entirely in XYZ tile (1, 0) = TMS row 1
    assert [(x, y) for x, y, _ in by_zoom[1]] == [(1, 1)]
    px = decode_png(by_zoom[1][0][2])
    assert px.shape[2] == 4                       # has alpha (partial tile)
    a = px[:, :, 3]
    assert (a > 0).any() and (a == 0).any()
    filled = px[:, :, 0][a > 0]
    assert (filled == 200).all()                  # red channel sampled

    # z0 world tile: the covered region must land in the NE quadrant only
    z0 = decode_png(by_zoom[0][0][2])
    a0 = z0[:, :, 3] if z0.shape[2] == 4 else np.full(z0.shape[:2], 255)
    assert (a0[:128, 128:] > 0).any()             # NE quadrant has data
    assert (a0[128:, :] == 0).all()               # southern half empty
    assert (a0[:, :128] == 0).all()               # western half empty
