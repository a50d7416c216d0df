"""STAC Tiled Assets reader (frmts/stacta/stactadataset.cpp): a STAC
item JSON with the `tiled-assets` extension — per-TileMatrixSet tile
limits plus an asset href template
(./{TileMatrixSet}/{TileMatrix}/{TileRow}/{TileCol}.tif); the raster is
the mosaic of the finest tile matrix, coarser matrices are overviews.
Tiles decode through the engine's GeoTIFF reader.
"""

from __future__ import annotations

import json
import os

import numpy as np


def _tms(meta: dict) -> tuple[str, dict, dict]:
    props = meta["properties"]
    links = props["tiles:tile_matrix_links"]
    name = sorted(links)[0]
    tms = props["tiles:tile_matrix_sets"][name]
    return name, tms, links[name].get("limits", {})


def stacta_meta(path: str) -> dict:
    meta = json.load(open(path))
    name, tms, limits = _tms(meta)
    matrices = {str(m["identifier"]): m for m in tms["tileMatrix"]}
    best = str(max(int(k) for k in limits))
    m = matrices[best]
    lim = limits[best]
    tw, th = int(m["tileWidth"]), int(m["tileHeight"])
    cols = lim["max_tile_col"] - lim["min_tile_col"] + 1
    rows = lim["max_tile_row"] - lim["min_tile_row"] + 1
    # tile matrix: scaleDenominator + topLeftCorner (axis order lat,lon
    # for CRS84 quad per the TMS doc: corner is [lon, lat]? the
    # reference uses pointOfOrigin/topLeftCorner as (x, y))
    origin = m.get("topLeftCorner") or m.get("pointOfOrigin")
    # 0.28 mm/px convention: pixel size in CRS units
    px = float(m["scaleDenominator"]) * 0.28e-3 / 111319.49079327358 \
        if tms.get("supportedCRS", "").endswith(("4326", "CRS84")) \
        else float(m["scaleDenominator"]) * 0.28e-3
    x0 = float(origin[0]) + lim["min_tile_col"] * tw * px
    y0 = float(origin[1]) - lim["min_tile_row"] * th * px
    template = next(iter(meta["asset_templates"].values()))["href"]
    n_bands = len(next(iter(meta["asset_templates"].values())).get(
        "eo:bands", [])) or 3
    return {"driver": "STACTA", "width": cols * tw, "height": rows * th,
            "bands": n_bands, "tile_w": tw, "tile_h": th,
            "tms": name, "levels": sorted(int(k) for k in limits),
            "limits": limits, "template": template,
            "geotransform": (x0, px, 0.0, y0, 0.0, -px)}


def read_stacta_array(path: str, level: int | None = None) -> np.ndarray:
    """Mosaic one tile-matrix level -> (h, w, bands) array."""
    from gdal_ray.codecs.tiff import decode_tiff

    meta = json.load(open(path))
    name, tms, limits = _tms(meta)
    lvl = str(max(int(k) for k in limits) if level is None else level)
    lim = limits[lvl]
    template = next(iter(meta["asset_templates"].values()))["href"]
    base = os.path.dirname(path)
    tiles = {}
    tw = th = nb = None
    for row in range(lim["min_tile_row"], lim["max_tile_row"] + 1):
        for col in range(lim["min_tile_col"], lim["max_tile_col"] + 1):
            rel = (template.replace("{TileMatrixSet}", name)
                   .replace("{TileMatrix}", lvl)
                   .replace("{TileRow}", str(row))
                   .replace("{TileCol}", str(col)))
            p = os.path.normpath(os.path.join(base, rel))
            if not os.path.exists(p):
                continue
            a = decode_tiff(open(p, "rb").read())
            if a.ndim == 2:
                a = a[:, :, None]
            tiles[(row, col)] = a
            th, tw, nb = a.shape
    if not tiles:
        raise ValueError(f"no tiles found for level {lvl} of {path}")
    rows = lim["max_tile_row"] - lim["min_tile_row"] + 1
    cols = lim["max_tile_col"] - lim["min_tile_col"] + 1
    out = np.zeros((rows * th, cols * tw, nb), dtype=a.dtype)
    for (row, col), tile in tiles.items():
        r = row - lim["min_tile_row"]
        c = col - lim["min_tile_col"]
        out[r * th:(r + 1) * th, c * tw:(c + 1) * tw] = tile
    return out
