"""gdal_retile analogue: split one (Geo)TIFF into a directory tree of
fixed-size georeferenced GeoTIFF tiles plus optional pyramid levels and
a shapefile tile index.

Reference semantics: swig/python/gdal-utils/osgeo_utils/gdal_retile.py
(tile grid from the upper-left corner, ``-levels`` pyramid where each
level halves resolution and re-tiles, ``-tileIndex`` polygon index with
a ``location`` attribute).

Ray-first shape (no shuffle anywhere):

- The driver parses ONLY the source header (``tiff_levels`` — the COG
  range-read idiom) and enumerates output tiles; each item carries the
  byte ranges of exactly the source chunks that intersect it.
- Level 0 is one ``map_batches`` pass: every task range-reads and
  decodes only its own chunks, assembles its tile, encodes a GeoTIFF
  with the shifted geotransform, and publishes atomically (tmp+rename;
  an existing file is a completed partition — rerun = resume).
- Level ``l`` is a parallel map over the level-``l`` tile grid: each
  task reads at most 4 tiles of level ``l-1`` from the output tree by
  deterministic path (no exchange), composes the quad, and reduces it
  with :func:`gdal_ray.stages.resample.resize` (average by default,
  matching gdal_retile's pyramid resampler choices).
- The tile index (one tiny row per tile) is the only data that reaches
  the driver; it is written as a real .shp/.dbf/.prj via the engine's
  shapefile driver, like -tileIndex.

At 100 TB: tasks touch O(tile) bytes, the driver holds O(n_tiles)
manifest rows, and a failed run skips every already-published tile.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from gdal_ray.codecs.tiff import encode_geotiff
from gdal_ray.sources.gtiff_reader import _decode_chunk, tiff_levels
from gdal_ray.stages.resample import resize


def _tile_path(out_dir: str, level: int, row: int, col: int) -> str:
    return os.path.join(out_dir, str(level), f"{row}_{col}.tif")


def _publish(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _shift_gt(gt, col0: int, row0: int, scale: int = 1):
    """Geotransform of a sub-window starting at pixel (col0, row0) of
    the level-0 grid, with pixels ``scale``× the level-0 size."""
    gx0 = gt[0] + col0 * gt[1] + row0 * gt[2]
    gy0 = gt[3] + col0 * gt[4] + row0 * gt[5]
    return (gx0, gt[1] * scale, gt[2] * scale,
            gy0, gt[4] * scale, gt[5] * scale)


def _tile_bounds(gt, col0: int, row0: int, w: int, h: int):
    """Axis-aligned model-space bbox of a pixel rect (handles rotation)."""
    xs, ys = [], []
    for i, j in ((col0, row0), (col0 + w, row0), (col0, row0 + h),
                 (col0 + w, row0 + h)):
        xs.append(gt[0] + i * gt[1] + j * gt[2])
        ys.append(gt[3] + i * gt[4] + j * gt[5])
    return min(xs), min(ys), max(xs), max(ys)


def retile(src_path: str, out_dir: str, *, tile_w: int = 256,
           tile_h: int = 256, levels: int = 1, resample: str = "average",
           compression: str = "deflate", tile_index: bool = True,
           resume: bool = True, tiles_per_task: int = 16) -> dict:
    """Split ``src_path`` into ``out_dir/<level>/<row>_<col>.tif`` tiles.

    ``levels`` counts pyramid levels INCLUDING the base (level 0 =
    native resolution, level l = 2^l× coarser), like gdal_retile's
    ``-levels``.  Returns ``{"tiles": n, "bytes": n, "index": path,
    "grid": [(n_rows, n_cols), ...]}``.
    """
    import ray.data as rd

    meta = tiff_levels(src_path)[0]
    if meta.get("planar", 1) != 1:
        raise NotImplementedError(
            "retile of PlanarConfiguration=2 sources: read via "
            "sources.gtiff_reader.read_geotiff_tiles (planar-aware) and "
            "re-tile from the chunk dataset")
    W, H, spp = meta["width"], meta["height"], meta["spp"]
    gt = meta["geotransform"] or (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    epsg, nodata = meta.get("epsg"), meta.get("nodata")
    dt = np.dtype(meta["dtype"])
    if levels < 1:
        raise ValueError("levels must be >= 1 (level 0 is the base)")

    # ---- source chunk grid (driver-side arithmetic only) ----
    if meta["tiled"]:
        cw, ch = meta["tile_w"], meta["tile_h"]
        chunks_x = (W + cw - 1) // cw
    else:
        ch, cw = meta["rows_per_strip"], W
        chunks_x = 1

    def chunk_rect(i: int):
        r0 = (i // chunks_x) * ch
        c0 = (i % chunks_x) * cw
        return r0, c0

    n_ty = (H + tile_h - 1) // tile_h
    n_tx = (W + tile_w - 1) // tile_w
    os.makedirs(os.path.join(out_dir, "0"), exist_ok=True)

    items = []
    for tr in range(n_ty):
        for tc in range(n_tx):
            y0, x0 = tr * tile_h, tc * tile_w
            h = min(tile_h, H - y0)
            w = min(tile_w, W - x0)
            # chunk range intersecting [y0, y0+h) × [x0, x0+w)
            ci0, ci1 = y0 // ch, (y0 + h - 1) // ch
            cj0, cj1 = x0 // cw, (x0 + w - 1) // cw
            idxs = [ci * chunks_x + cj
                    for ci in range(ci0, ci1 + 1)
                    for cj in range(cj0, cj1 + 1)]
            items.append({
                "row": tr, "col": tc, "y0": y0, "x0": x0, "h": h, "w": w,
                "offs": [meta["offsets"][i] for i in idxs],
                "cnts": [meta["counts"][i] for i in idxs],
                "r0s": [chunk_rect(i)[0] for i in idxs],
                "c0s": [chunk_rect(i)[1] for i in idxs],
            })

    def encode_level0(b: pa.Table) -> pa.Table:
        out = {"level": [], "row": [], "col": [], "w": [], "h": [],
               "location": [], "nbytes": []}
        with open(src_path, "rb") as f:
            for it in b.to_pylist():
                path = _tile_path(out_dir, 0, it["row"], it["col"])
                if not (resume and os.path.exists(path)):
                    tile = np.zeros((it["h"], it["w"], spp), dtype=dt)
                    for off, cnt, r0, c0 in zip(it["offs"], it["cnts"],
                                                it["r0s"], it["c0s"]):
                        f.seek(off)
                        # tiled chunks are full-size (edges padded);
                        # the last strip of a striped file is short
                        eff_ch = ch if meta["tiled"] else min(ch, H - r0)
                        blk = _decode_chunk(f.read(cnt), meta, eff_ch, cw)
                        sy0 = max(it["y0"], r0)
                        sx0 = max(it["x0"], c0)
                        sy1 = min(it["y0"] + it["h"], r0 + ch, H)
                        sx1 = min(it["x0"] + it["w"], c0 + cw, W)
                        tile[sy0 - it["y0"]:sy1 - it["y0"],
                             sx0 - it["x0"]:sx1 - it["x0"]] = \
                            blk[sy0 - r0:sy1 - r0, sx0 - c0:sx1 - c0]
                    arr = tile[:, :, 0] if spp == 1 else tile
                    _publish(path, encode_geotiff(
                        np.ascontiguousarray(arr), compression=compression,
                        geotransform=_shift_gt(gt, it["x0"], it["y0"]),
                        epsg=epsg, nodata=nodata))
                out["level"].append(0)
                out["row"].append(it["row"])
                out["col"].append(it["col"])
                out["w"].append(it["w"])
                out["h"].append(it["h"])
                out["location"].append(path)
                out["nbytes"].append(os.path.getsize(path))
        return pa.table(out)

    nb = max(1, (len(items) + tiles_per_task - 1) // tiles_per_task)
    index_rows = [rd.from_items(items, override_num_blocks=nb)
                    .map_batches(encode_level0, batch_format="pyarrow")
                    .to_pandas()]

    # ---- pyramid levels: parallel map over the level-l grid ----
    prev_W, prev_H = W, H
    prev_ty, prev_tx = n_ty, n_tx
    grid = [(n_ty, n_tx)]
    for lev in range(1, levels):
        from gdal_ray.codecs.tiff import read_geotiff

        Wl, Hl = (prev_W + 1) // 2, (prev_H + 1) // 2
        lty = (Hl + tile_h - 1) // tile_h
        ltx = (Wl + tile_w - 1) // tile_w
        os.makedirs(os.path.join(out_dir, str(lev)), exist_ok=True)
        scale = 1 << lev
        litems = [{"row": r, "col": c,
                   "h": min(tile_h, Hl - r * tile_h),
                   "w": min(tile_w, Wl - c * tile_w)}
                  for r in range(lty) for c in range(ltx)]
        p_ty, p_tx, pW, pH, plev = prev_ty, prev_tx, prev_W, prev_H, lev - 1

        def encode_level(b: pa.Table, lev=lev, scale=scale, p_ty=p_ty,
                         p_tx=p_tx, pW=pW, pH=pH, plev=plev) -> pa.Table:
            out = {"level": [], "row": [], "col": [], "w": [], "h": [],
                   "location": [], "nbytes": []}
            for it in b.to_pylist():
                path = _tile_path(out_dir, lev, it["row"], it["col"])
                if not (resume and os.path.exists(path)):
                    # source rect in level-(lev-1) pixels
                    sy0, sx0 = it["row"] * tile_h * 2, it["col"] * tile_w * 2
                    sh = min(it["h"] * 2, pH - sy0)
                    sw = min(it["w"] * 2, pW - sx0)
                    canvas = np.zeros((sh, sw, spp), dtype=dt)
                    for pr in range(sy0 // tile_h,
                                    min((sy0 + sh - 1) // tile_h + 1, p_ty)):
                        for pc in range(sx0 // tile_w,
                                        min((sx0 + sw - 1) // tile_w + 1,
                                            p_tx)):
                            with open(_tile_path(out_dir, plev, pr, pc),
                                      "rb") as f:
                                sub, _ = read_geotiff(f.read())
                            if sub.ndim == 2:
                                sub = sub[:, :, None]
                            oy, ox = pr * tile_h - sy0, pc * tile_w - sx0
                            ys, xs = max(0, -oy), max(0, -ox)
                            ye = min(sub.shape[0], sh - oy)
                            xe = min(sub.shape[1], sw - ox)
                            if ye > ys and xe > xs:
                                canvas[oy + ys:oy + ye, ox + xs:ox + xe] = \
                                    sub[ys:ye, xs:xe]
                    red = resize(canvas, it["w"], it["h"], resample)
                    red = red.astype(dt, copy=False)
                    arr = red[:, :, 0] if spp == 1 else red
                    _publish(path, encode_geotiff(
                        np.ascontiguousarray(arr), compression=compression,
                        geotransform=_shift_gt(gt, sx0 * (scale // 2),
                                               sy0 * (scale // 2), scale),
                        epsg=epsg, nodata=nodata))
                out["level"].append(lev)
                out["row"].append(it["row"])
                out["col"].append(it["col"])
                out["w"].append(it["w"])
                out["h"].append(it["h"])
                out["location"].append(path)
                out["nbytes"].append(os.path.getsize(path))
            return pa.table(out)

        lnb = max(1, (len(litems) + tiles_per_task - 1) // tiles_per_task)
        index_rows.append(rd.from_items(litems, override_num_blocks=lnb)
                            .map_batches(encode_level, batch_format="pyarrow")
                            .to_pandas())
        prev_W, prev_H, prev_ty, prev_tx = Wl, Hl, lty, ltx
        grid.append((lty, ltx))

    import pandas as pd

    idx = pd.concat(index_rows, ignore_index=True)
    index_path = None
    if tile_index:
        from gdal_ray.geometry.wkb import encode_polygon
        from gdal_ray.sources.shapefile import write_shapefile

        wkbs, attrs = [], {"level": [], "row": [], "col": [],
                           "location": []}
        for r in idx.itertuples():
            s = 1 << int(r.level)
            gt_l = _shift_gt(gt, r.col * tile_w * s, r.row * tile_h * s, s)
            minx, miny, maxx, maxy = _tile_bounds(gt_l, 0, 0, r.w, r.h)
            ring = np.array([[minx, miny], [maxx, miny], [maxx, maxy],
                             [minx, maxy], [minx, miny]])
            wkbs.append(encode_polygon([ring]))
            attrs["level"].append(int(r.level))
            attrs["row"].append(int(r.row))
            attrs["col"].append(int(r.col))
            attrs["location"].append(os.path.relpath(r.location, out_dir))
        t = pa.table({"wkb": pa.array(wkbs, pa.binary()), **attrs})
        index_path = os.path.join(out_dir, "index.shp")
        write_shapefile(t, index_path, epsg=epsg)

    return {"tiles": int(len(idx)), "bytes": int(idx["nbytes"].sum()),
            "levels": levels, "grid": grid, "index": index_path}
