"""GTI — GDAL Raster Tile Index driver (frmts/gti/gdaltileindexdataset
.cpp): a vector layer (GPKG/SHP/FGB/GeoJSON…) whose features carry a
``location`` attribute pointing at rasters plus their footprint
geometry; the dataset is the mosaic.  Composes the engine's existing
vector doors with the GeoTIFF reader.

Scale shape: the index is metadata-sized (one row per tile) and reads
driver-side; each Ray task decodes only its own tiles and emits
mosaic-positioned chunks — the tile sink / retile pattern in reverse.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _tiles(index_path: str, location_col: str):
    from gdal_ray.sources import open_vector

    rows = open_vector(index_path).take_all()
    base = os.path.dirname(os.path.abspath(index_path))
    out = []
    for r in rows:
        loc = r.get(location_col)
        if not loc:
            continue
        p = loc if os.path.isabs(loc) else os.path.normpath(
            os.path.join(base, loc))
        out.append(p)
    return out


def gti_meta(index_path: str, *, location_col: str = "location") -> dict:
    from gdal_ray.sources.gtiff_reader import tiff_levels

    tiles = _tiles(index_path, location_col)
    if not tiles:
        raise ValueError(f"GTI index {index_path} has no tiles")
    metas = [tiff_levels(p)[0] for p in tiles]
    gts = [m["geotransform"] for m in metas]
    if any(g is None for g in gts):
        raise ValueError("GTI: tiles without geotransforms")
    px = gts[0][1]
    py = gts[0][5]
    x0 = min(g[0] for g in gts)
    y1 = max(g[3] for g in gts)
    x1 = max(g[0] + m["width"] * g[1] for g, m in zip(gts, metas))
    y0 = min(g[3] + m["height"] * g[5] for g, m in zip(gts, metas))
    width = int(round((x1 - x0) / px))
    height = int(round((y0 - y1) / py))
    return {"driver": "GTI", "width": width, "height": height,
            "bands": metas[0]["spp"], "dtype": metas[0]["dtype"],
            "n_tiles": len(tiles), "tiles": tiles,
            "geotransform": (x0, px, 0.0, y1, 0.0, py),
            "epsg": metas[0].get("epsg")}


def read_gti_array(index_path: str, *,
                   location_col: str = "location") -> np.ndarray:
    """Assemble the full mosaic -> (h, w, bands); later index features
    win on overlap (the reference's last-on-top order)."""
    from gdal_ray.codecs.tiff import read_geotiff
    from gdal_ray.sources.gtiff_reader import tiff_levels

    m = gti_meta(index_path, location_col=location_col)
    gt = m["geotransform"]
    out = np.zeros((m["height"], m["width"], m["bands"]),
                   dtype=np.dtype(m["dtype"]))
    for p in m["tiles"]:
        tm = tiff_levels(p)[0]
        a, _ = read_geotiff(open(p, "rb").read())
        if a.ndim == 2:
            a = a[:, :, None]
        tg = tm["geotransform"]
        cx = int(round((tg[0] - gt[0]) / gt[1]))
        cy = int(round((tg[3] - gt[3]) / gt[5]))
        out[cy:cy + a.shape[0], cx:cx + a.shape[1]] = a
    return out


def read_gti(index_path: str, *, location_col: str = "location",
             **_kw):
    """-> Ray Dataset (location, x0, y0, h, w, band, data): one task
    per index tile decodes it and emits its mosaic-positioned chunk."""
    import ray.data as rd

    m = gti_meta(index_path, location_col=location_col)
    gt = m["geotransform"]
    items = [{"path": p} for p in m["tiles"]]

    def load(b: pa.Table) -> pa.Table:
        from gdal_ray.codecs.tiff import read_geotiff
        from gdal_ray.sources.gtiff_reader import tiff_levels

        rows = {k: [] for k in ("location", "x0", "y0", "h", "w",
                                "band", "data")}
        for p in b.column("path").to_pylist():
            tm = tiff_levels(p)[0]
            a, _ = read_geotiff(open(p, "rb").read())
            if a.ndim == 2:
                a = a[:, :, None]
            tg = tm["geotransform"]
            cx = int(round((tg[0] - gt[0]) / gt[1]))
            cy = int(round((tg[3] - gt[3]) / gt[5]))
            for band in range(a.shape[2]):
                rows["location"].append(p)
                rows["x0"].append(cx)
                rows["y0"].append(cy)
                rows["h"].append(a.shape[0])
                rows["w"].append(a.shape[1])
                rows["band"].append(band)
                rows["data"].append(
                    np.ascontiguousarray(a[:, :, band]).tobytes())
        return pa.table({
            "location": pa.array(rows["location"], pa.string()),
            "x0": pa.array(rows["x0"], pa.int64()),
            "y0": pa.array(rows["y0"], pa.int64()),
            "h": pa.array(rows["h"], pa.int64()),
            "w": pa.array(rows["w"], pa.int64()),
            "band": pa.array(rows["band"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary())})

    return rd.from_items(items).map_batches(load, batch_format="pyarrow")
