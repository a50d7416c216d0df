"""Physical z/x/y tile-tree sink — the file layout of `gdal raster tile`
(apps/gdalalg_raster_tile.cpp) and gdal2tiles:

    out_dir/<z>/<x>/<y>.png

Semantics mirrored from the reference:
- atomic publish: write `<y>.png.tmp.<pid>` then os.replace
  (gdalalg_raster_tile.cpp:476-493);
- resume: a tile whose final file exists is skipped
  (gdalalg_raster_tile.cpp:377-382, gdal2tiles --resume);
- alpha dropped when fully opaque (gdalalg_raster_tile.cpp:412-421).

The write runs inside map_batches, so tiles stream from the mosaic
groupby straight to disk on whatever node rendered them — only the tiny
(z, x, y, written) summary returns to the driver.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from gdal_ray.codecs.png import encode_png


def write_tile_tree(tiles_ds, out_dir: str, *, tile_size: int, resume: bool = True):
    """Write a rendered-tiles Dataset (z, x, y, rgb, alpha raw bytes) as a
    z/x/y PNG tree.  Returns the summary Dataset (z, x, y, written) —
    consume it (e.g. .to_pandas()) to drive the write."""
    ts = tile_size

    def write_batch(b: pa.Table) -> pa.Table:
        zs = b.column("z").to_numpy()
        xs = b.column("x").to_numpy()
        ys = b.column("y").to_numpy()
        rgbs = b.column("rgb").to_pylist()
        alphas = b.column("alpha").to_pylist()
        written = np.zeros(len(zs), dtype=bool)
        for i in range(len(zs)):
            d = os.path.join(out_dir, str(int(zs[i])), str(int(xs[i])))
            final = os.path.join(d, f"{int(ys[i])}.png")
            if resume and os.path.exists(final):
                continue
            os.makedirs(d, exist_ok=True)
            rgb = np.frombuffer(rgbs[i], dtype=np.uint8).reshape(ts, ts, 3)
            a = np.frombuffer(alphas[i], dtype=np.uint8).reshape(ts, ts)
            img = rgb if (a == 255).all() else np.dstack([rgb, a])
            data = encode_png(img)
            tmp = f"{final}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, final)
            written[i] = True
        return pa.table(
            {
                "z": b.column("z"),
                "x": b.column("x"),
                "y": b.column("y"),
                "written": pa.array(written),
            }
        )

    return tiles_ds.map_batches(write_batch, batch_format="pyarrow")


def write_tile_sidecars(out_dir: str, *, min_zoom: int, max_zoom: int,
                        bounds_lonlat: tuple[float, float, float, float],
                        tile_size: int = 256, title: str = "tiles",
                        tms: bool = False) -> list[str]:
    """gdal2tiles' viewer sidecars: tilemapresource.xml (OSGeo TMS 1.0
    resource document — gdal2tiles.py generate_tilemapresource) and a
    self-contained leaflet.html viewer (generate_leaflet).  Bounds in
    lon/lat; the tile tree itself is XYZ (web) order unless ``tms``.
    Returns the written paths (atomic tmp+rename, like the tiles)."""
    from gdal_ray.tilemath import lonlat_to_meters

    minx, miny = lonlat_to_meters(bounds_lonlat[0], bounds_lonlat[1])
    maxx, maxy = lonlat_to_meters(bounds_lonlat[2], bounds_lonlat[3])
    units_per_px0 = 2 * 20037508.342789244 / tile_size
    sets = "\n".join(
        f'      <TileSet href="{z}" units-per-pixel="{units_per_px0 / (1 << z):.14f}" order="{z}"/>'
        for z in range(min_zoom, max_zoom + 1))
    xml = f"""<?xml version="1.0" encoding="utf-8"?>
<TileMap version="1.0.0" tilemapservice="http://tms.osgeo.org/1.0.0">
  <Title>{title}</Title>
  <Abstract></Abstract>
  <SRS>EPSG:3857</SRS>
  <BoundingBox minx="{minx:.14f}" miny="{miny:.14f}" maxx="{maxx:.14f}" maxy="{maxy:.14f}"/>
  <Origin x="{minx:.14f}" y="{miny:.14f}"/>
  <TileFormat width="{tile_size}" height="{tile_size}" mime-type="image/png" extension="png"/>
  <TileSets profile="mercator">
{sets}
  </TileSets>
</TileMap>
"""
    cx = (bounds_lonlat[0] + bounds_lonlat[2]) / 2
    cy = (bounds_lonlat[1] + bounds_lonlat[3]) / 2
    html = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"/><title>{title}</title>
<link rel="stylesheet" href="https://unpkg.com/leaflet/dist/leaflet.css"/>
<script src="https://unpkg.com/leaflet/dist/leaflet.js"></script>
<style>html,body,#map{{height:100%;margin:0}}</style></head>
<body><div id="map"></div><script>
var map = L.map('map').setView([{cy:.6f}, {cx:.6f}], {min_zoom});
L.tileLayer('./{{z}}/{{x}}/{{y}}.png', {{
  minZoom: {min_zoom}, maxZoom: {max_zoom}, tileSize: {tile_size},
  tms: {str(bool(tms)).lower()}, noWrap: true
}}).addTo(map);
map.fitBounds([[{bounds_lonlat[1]:.6f}, {bounds_lonlat[0]:.6f}],
               [{bounds_lonlat[3]:.6f}, {bounds_lonlat[2]:.6f}]]);
</script></body></html>
"""
    out = []
    os.makedirs(out_dir, exist_ok=True)
    for name, data in (("tilemapresource.xml", xml), ("leaflet.html", html)):
        p = os.path.join(out_dir, name)
        tmp = f"{p}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, p)
        out.append(p)
    return out
