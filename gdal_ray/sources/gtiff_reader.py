"""Parallel (Geo)TIFF / COG reader: the driver parses only the header
region (IFD chain + tag values — the cloud range-read idiom COG exists
for, frmts/gtiff/cogdriver.cpp), then Ray tasks range-read and decode
only their own tiles/strips.  A terabyte COG reads as parallel as its
tile count without any task touching the whole file.

Chunk decode reuses the from-spec codec internals of
:mod:`gdal_ray.codecs.tiff` (LZW/Deflate/PackBits, predictors 2 and 3)."""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

from gdal_ray.codecs.tiff import (
    GK_GEOGRAPHIC_TYPE,
    GK_PROJECTED_CS,
    T_BITS,
    T_COMPRESSION,
    T_GDAL_NODATA,
    T_GEO_KEYS,
    T_JPEG_TABLES,
    T_LENGTH,
    T_MODEL_PIXEL_SCALE,
    T_MODEL_TIEPOINT,
    T_MODEL_TRANSFORM,
    T_PHOTOMETRIC,
    T_PLANAR,
    T_PREDICTOR,
    T_ROWS_PER_STRIP,
    T_SAMPLE_FORMAT,
    T_SAMPLES,
    T_STRIP_COUNTS,
    T_STRIP_OFFSETS,
    T_TILE_COUNTS,
    T_TILE_H,
    T_TILE_OFFSETS,
    T_TILE_W,
    T_WIDTH,
    _DTYPES,
    _Reader,
    _decompress,
    _ifd_chain,
    _undo_predictor2,
)


def _header_region(path: str) -> bytes:
    """Smallest prefix of the file whose IFD chain + tag values parse —
    start at 64 KiB, double on short reads (the COG layout keeps all
    metadata up front, so this is one or two range requests)."""
    size = os.path.getsize(path)
    n = 1 << 16
    while True:
        n = min(n, size)
        with open(path, "rb") as f:
            buf = f.read(n)
        try:
            r = _Reader(buf)
            offs = _ifd_chain(r)
            for off in offs:
                r.ifd_tags(off)
            return buf
        except Exception:
            if n >= size:
                raise
            n *= 4


def tiff_levels(path: str) -> list[dict]:
    """-> per-IFD layout metadata (no pixel data read)."""
    buf = _header_region(path)
    r = _Reader(buf)
    out = []
    for off in _ifd_chain(r):
        tags = r.ifd_tags(off)
        w = int(tags[T_WIDTH][0])
        h = int(tags[T_LENGTH][0])
        spp = int(tags.get(T_SAMPLES, [1])[0])
        bits = int(tags.get(T_BITS, [8])[0])
        sf = int(tags.get(T_SAMPLE_FORMAT, [1])[0])
        if (bits, sf) not in _DTYPES:
            raise NotImplementedError(f"sample type bits={bits} format={sf}")
        planar = int(tags.get(T_PLANAR, [1])[0])
        meta = {
            "width": w, "height": h, "spp": spp, "planar": planar,
            "dtype": _DTYPES[(bits, sf)], "endian": r.e,
            "compression": int(tags.get(T_COMPRESSION, [1])[0]),
            "predictor": int(tags.get(T_PREDICTOR, [1])[0]),
            "photometric": int(tags.get(T_PHOTOMETRIC, [1])[0]),
            "jpegtables": (bytes(tags[T_JPEG_TABLES])
                           if T_JPEG_TABLES in tags else None),
            "geotransform": None, "nodata": None, "epsg": None,
        }
        if 320 in tags:  # TIFF 6.0 §ColorMap: R..G..B planes of 2^bits SHORTs
            cm = np.asarray(tags[320], dtype=np.uint16)
            n = 1 << bits
            meta["palette"] = np.stack(
                [cm[:n], cm[n:2 * n], cm[2 * n:3 * n]], axis=1)
        if T_GEO_KEYS in tags:
            gk = tags[T_GEO_KEYS]
            for ki in range(int(gk[3])):
                key, loc, _cnt, val = gk[4 + 4 * ki: 8 + 4 * ki]
                if key in (GK_GEOGRAPHIC_TYPE, GK_PROJECTED_CS) and loc == 0 \
                        and 1024 <= int(val) < 32767:
                    meta["epsg"] = int(val)
        if T_MODEL_TRANSFORM in tags:
            m = tags[T_MODEL_TRANSFORM]
            meta["geotransform"] = (m[3], m[0], m[1], m[7], m[4], m[5])
        elif T_MODEL_PIXEL_SCALE in tags and T_MODEL_TIEPOINT in tags:
            sx, sy = tags[T_MODEL_PIXEL_SCALE][0], tags[T_MODEL_PIXEL_SCALE][1]
            tp = tags[T_MODEL_TIEPOINT]
            i0, j0, gx, gy = tp[0], tp[1], tp[3], tp[4]
            meta["geotransform"] = (gx - i0 * sx, sx, 0.0,
                                    gy + j0 * sy, 0.0, -sy)
        if T_GDAL_NODATA in tags:
            try:
                meta["nodata"] = float(tags[T_GDAL_NODATA][0].strip())
            except ValueError:
                pass
        if meta["geotransform"] is None:
            # world-file fallback (GDALReadWorldFile) — header-side only
            from gdal_ray.sources.pam import read_world_file

            meta["geotransform"] = read_world_file(path)
        if T_TILE_OFFSETS in tags:
            meta.update(tiled=True,
                        tile_w=int(tags[T_TILE_W][0]),
                        tile_h=int(tags[T_TILE_H][0]),
                        offsets=[int(v) for v in tags[T_TILE_OFFSETS]],
                        counts=[int(v) for v in tags[T_TILE_COUNTS]])
        else:
            meta.update(tiled=False,
                        rows_per_strip=int(tags.get(T_ROWS_PER_STRIP, [h])[0]),
                        offsets=[int(v) for v in tags[T_STRIP_OFFSETS]],
                        counts=[int(v) for v in tags[T_STRIP_COUNTS]])
        out.append(meta)
    return out


def _decode_chunk(raw: bytes, meta: dict, ch: int, cw: int,
                  cpp: int | None = None) -> np.ndarray:
    """``cpp`` = channels stored in this chunk: spp for chunky files,
    1 for a PlanarConfiguration=2 band plane."""
    dt = np.dtype(meta["dtype"]).newbyteorder(meta["endian"])
    if cpp is None:
        cpp = meta["spp"] if meta.get("planar", 1) == 1 else 1
    if meta["compression"] == 7:
        from gdal_ray.codecs.tiff import _decode_jpeg_chunk

        return _decode_jpeg_chunk(raw, meta.get("jpegtables"),
                                  meta.get("photometric", 1),
                                  ch, cw, cpp, dt.newbyteorder("="))
    expected = ch * cw * cpp * dt.itemsize
    data = _decompress(raw, meta["compression"], expected)
    if meta["predictor"] == 3:
        from gdal_ray.codecs.tiff import _undo_predictor3

        return _undo_predictor3(data, ch, cw, cpp, dt)
    blk = np.frombuffer(data[:expected], dtype=dt).reshape(ch, cw, cpp)
    if meta["predictor"] == 2:
        blk = _undo_predictor2(blk)
    return blk


def read_geotiff_tiles(path: str, *, level: int = 0,
                       chunks_per_block: int = 32):
    """-> ray.data.Dataset of decoded chunk rows
    (row0, col0, h, w, data: native-order C bytes).  Tiled files yield
    tiles (edge tiles cropped); striped files yield strips."""
    import ray.data as rd

    levels = tiff_levels(path)
    if level >= len(levels) and os.path.exists(path + ".ovr"):
        # external overviews (gdaladdo -ro sidecar): the .ovr TIFF holds
        # the overview IFDs, first sidecar IFD = first missing level
        return read_geotiff_tiles(path + ".ovr",
                                  level=level - len(levels),
                                  chunks_per_block=chunks_per_block)
    meta = levels[level]
    W, H = meta["width"], meta["height"]
    # PlanarConfiguration=2 stores one chunk per (band, spatial) pair,
    # plane-major (TIFF 6.0 §PlanarConfiguration); an item bundles the
    # spp per-plane chunks of one spatial window so the output schema is
    # the same (h, w, spp) block either way.
    nplanes = meta["spp"] if meta.get("planar", 1) == 2 else 1
    per_plane = len(meta["offsets"]) // nplanes
    items = []
    if meta["tiled"]:
        tw, th = meta["tile_w"], meta["tile_h"]
        tx = (W + tw - 1) // tw
        for i in range(per_plane):
            items.append({
                "row0": (i // tx) * th, "col0": (i % tx) * tw,
                "offs": [meta["offsets"][p * per_plane + i]
                         for p in range(nplanes)],
                "cnts": [meta["counts"][p * per_plane + i]
                         for p in range(nplanes)],
            })
    else:
        rps = meta["rows_per_strip"]
        for i in range(per_plane):
            items.append({
                "row0": i * rps, "col0": 0,
                "offs": [meta["offsets"][p * per_plane + i]
                         for p in range(nplanes)],
                "cnts": [meta["counts"][p * per_plane + i]
                         for p in range(nplanes)],
            })

    def load(b: pa.Table) -> pa.Table:
        rows = {"row0": [], "col0": [], "h": [], "w": [], "data": []}
        with open(path, "rb") as f:
            for it in b.to_pylist():
                if meta["tiled"]:
                    ch, cw = meta["tile_h"], meta["tile_w"]
                else:
                    ch = min(meta["rows_per_strip"], H - it["row0"])
                    cw = W
                planes = []
                for off, cnt in zip(it["offs"], it["cnts"]):
                    f.seek(off)
                    planes.append(_decode_chunk(f.read(cnt), meta, ch, cw))
                blk = planes[0] if len(planes) == 1 \
                    else np.concatenate(planes, axis=2)
                h = min(ch, H - it["row0"])
                w = min(cw, W - it["col0"])
                blk = np.ascontiguousarray(
                    blk[:h, :w].astype(blk.dtype.newbyteorder("="), copy=False)
                )
                rows["row0"].append(it["row0"])
                rows["col0"].append(it["col0"])
                rows["h"].append(h)
                rows["w"].append(w)
                rows["data"].append(blk.tobytes())
        return pa.table({
            "row0": pa.array(rows["row0"], pa.int64()),
            "col0": pa.array(rows["col0"], pa.int64()),
            "h": pa.array(rows["h"], pa.int64()),
            "w": pa.array(rows["w"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    return rd.from_items(items, override_num_blocks=max(
        1, (len(items) + chunks_per_block - 1) // chunks_per_block
    )).map_batches(load, batch_format="pyarrow")


def read_window(f, meta: dict, r0: int, r1: int, c0: int, c1: int
                ) -> np.ndarray:
    """Range-read + decode exactly the chunks intersecting the pixel
    window [r0:r1, c0:c1] from an open file object; returns the window
    as (r1-r0, c1-c0, spp).  The per-strip warp/regrid tasks use this so
    a task touches only its own source bytes (the /vsicurl range-read
    shape of gcore/gdalrasterband.cpp RasterIO).  Chunky files only
    (PlanarConfiguration=2 callers go through read_geotiff_tiles)."""
    if meta.get("planar", 1) == 2:
        raise NotImplementedError("read_window: planar=2 — use "
                                  "read_geotiff_tiles")
    W, H, spp = meta["width"], meta["height"], meta["spp"]
    dt = np.dtype(meta["dtype"]).newbyteorder("=")
    out = np.zeros((r1 - r0, c1 - c0, spp), dtype=dt)
    if meta["tiled"]:
        tw, th = meta["tile_w"], meta["tile_h"]
        tx = (W + tw - 1) // tw
        for ty in range(r0 // th, (r1 - 1) // th + 1):
            for txi in range(c0 // tw, (c1 - 1) // tw + 1):
                i = ty * tx + txi
                f.seek(meta["offsets"][i])
                blk = _decode_chunk(f.read(meta["counts"][i]), meta, th, tw)
                br0, bc0 = ty * th, txi * tw
                sr0, sr1 = max(r0, br0), min(r1, br0 + th, H)
                sc0, sc1 = max(c0, bc0), min(c1, bc0 + tw, W)
                out[sr0 - r0:sr1 - r0, sc0 - c0:sc1 - c0] = \
                    blk[sr0 - br0:sr1 - br0, sc0 - bc0:sc1 - bc0]
    else:
        rps = meta["rows_per_strip"]
        for i in range(r0 // rps, (r1 - 1) // rps + 1):
            ch = min(rps, H - i * rps)
            f.seek(meta["offsets"][i])
            blk = _decode_chunk(f.read(meta["counts"][i]), meta, ch, W)
            br0 = i * rps
            sr0, sr1 = max(r0, br0), min(r1, br0 + ch)
            out[sr0 - r0:sr1 - r0, :] = blk[sr0 - br0:sr1 - br0, c0:c1]
    return out


def assemble(rows, meta: dict) -> np.ndarray:
    """Driver-side assembly of read_geotiff_tiles output (tests/small)."""
    dt = np.dtype(meta["dtype"])
    out = np.zeros((meta["height"], meta["width"], meta["spp"]), dtype=dt)
    for r in rows.itertuples():
        blk = np.frombuffer(r.data, dtype=dt).reshape(r.h, r.w, meta["spp"])
        out[r.row0:r.row0 + r.h, r.col0:r.col0 + r.w] = blk
    return out
