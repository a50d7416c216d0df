"""USGS ISIS3 cube driver (frmts/pds/isis3dataset.cpp) — PVL label +
BandSequential or Tile core layout.

Wire facts: the PVL label (``Object = IsisCube / Object = Core``)
carries StartByte (1-based), an optional detached-core filename
(``^Core``), Format (BandSequential | Tile) with TileSamples/TileLines,
Dimensions (Samples/Lines/Bands) and Pixels (Type UnsignedByte |
SignedWord | UnsignedWord | Real; ByteOrder Lsb | Msb; Base,
Multiplier).  Tile layout: the raster is carved into a row-major grid
of TileSamples x TileLines tiles, stored band-major; edge tiles are
full-size with padding.  Raster values are RAW (Base/Multiplier exposed
as scale/offset metadata, matching the reference's band checksums).
Mapping group -> geotransform via UpperLeftCornerX/Y + PixelResolution.

Scale shape: label parses driver-side; ``read_isis3`` fans tiles (or
row slabs for BandSequential) out per Ray task with exact byte ranges.
"""

from __future__ import annotations

import os
import re

import numpy as np

_PIXEL_TYPES = {
    "unsignedbyte": "u1", "signedbyte": "i1",
    "signedword": "i2", "unsignedword": "u2",
    "signedinteger": "i4", "unsignedinteger": "u4",
    "real": "f4", "double": "f8",
}


def _parse_pvl(text: str) -> dict:
    """Minimal PVL: nested Object/Group blocks -> dicts (keys lowered);
    '#'/'//' comments stripped; values keep only the part before any
    '<unit>' annotation."""
    root: dict = {}
    stack = [root]
    for raw in text.split("\n"):
        ln = raw.split("#")[0].strip()
        if not ln or ln.lower() == "end":
            continue
        m = re.match(r"(Object|Group)\s*=\s*(\S+)", ln, re.I)
        if m:
            d: dict = {}
            stack[-1].setdefault(m.group(2).lower(), d)
            stack.append(d)
            continue
        if re.match(r"End_(Object|Group)", ln, re.I):
            if len(stack) > 1:
                stack.pop()
            continue
        m = re.match(r"(\^?[\w]+)\s*=\s*(.*)$", ln)
        if m:
            val = m.group(2).strip()
            val = re.sub(r"<[^>]*>", "", val).strip().strip('"').strip("'")
            stack[-1][m.group(1).lower()] = val
    return root


def isis3_meta(path: str) -> dict:
    with open(path, "rb") as f:
        head = f.read(1 << 20)
    text = head.decode("latin-1", "replace")
    if "IsisCube" not in text[:4096] and not text.lstrip().startswith(
            "Object"):
        raise ValueError("not an ISIS3 label")
    pvl = _parse_pvl(text)
    cube = pvl.get("isiscube", {})
    core = cube.get("core", {})
    dims = core.get("dimensions", {})
    pix = core.get("pixels", {})
    ptype = pix.get("type", "UnsignedByte").lower()
    if ptype not in _PIXEL_TYPES:
        raise NotImplementedError(f"ISIS3 pixel type {pix.get('type')}")
    dt = _PIXEL_TYPES[ptype]
    order = "<" if pix.get("byteorder", "Lsb").lower() == "lsb" else ">"
    data_path = path
    if "^core" in core:
        data_path = os.path.join(os.path.dirname(path), core["^core"])
    fmt = core.get("format", "BandSequential")
    m = {
        "driver": "ISIS3",
        "width": int(dims["samples"]), "height": int(dims["lines"]),
        "bands": int(dims.get("bands", 1)),
        "wire_dtype": order + dt,
        "dtype": np.dtype(dt).name,
        "format": fmt,
        "tile_w": int(core.get("tilesamples", 0) or 0),
        "tile_h": int(core.get("tilelines", 0) or 0),
        "base": float(pix.get("base", 0.0)),
        "multiplier": float(pix.get("multiplier", 1.0)),
        "data_offset": int(core.get("startbyte", 1)) - 1,
        "data_path": data_path,
        "target": cube.get("mapping", {}).get("targetname"),
        "projection": cube.get("mapping", {}).get("projectionname"),
    }
    mapping = cube.get("mapping", {})
    try:
        res = float(mapping["pixelresolution"])
        ulx = float(mapping["upperleftcornerx"])
        uly = float(mapping["upperleftcornery"])
        m["geotransform"] = (ulx, res, 0.0, uly, 0.0, -res)
    except (KeyError, ValueError):
        m["geotransform"] = None
    return m


def read_isis3_array(path: str) -> np.ndarray:
    """Full decode -> (h, w) or (h, w, bands), raw values."""
    m = isis3_meta(path)
    dt = np.dtype(m["wire_dtype"])
    w, h, nb = m["width"], m["height"], m["bands"]
    out = np.zeros((nb, h, w), dtype=dt.newbyteorder("="))

    def _fill(raw: bytes, n: int) -> np.ndarray:
        # zero-pad truncated cores (matches the reference's tolerant
        # read of short files) and drop stray trailing bytes
        want = n * dt.itemsize
        if len(raw) < want:
            raw = raw + b"\x00" * (want - len(raw))
        return np.frombuffer(raw[:want], dtype=dt)

    with open(m["data_path"], "rb") as f:
        if m["format"] == "Tile":
            tw, th = m["tile_w"], m["tile_h"]
            ntx, nty = -(-w // tw), -(-h // th)
            tile_bytes = tw * th * dt.itemsize
            f.seek(m["data_offset"])
            for b in range(nb):
                for ty in range(nty):
                    for tx in range(ntx):
                        tile = _fill(f.read(tile_bytes),
                                     tw * th).reshape(th, tw)
                        y0, x0 = ty * th, tx * tw
                        hh = min(th, h - y0)
                        ww = min(tw, w - x0)
                        out[b, y0:y0 + hh, x0:x0 + ww] = tile[:hh, :ww]
        else:
            f.seek(m["data_offset"])
            flat = _fill(f.read(w * h * nb * dt.itemsize), w * h * nb)
            out[:] = flat.reshape(nb, h, w)
    return out[0] if nb == 1 else out.transpose(1, 2, 0)


def read_isis3(path: str, *, rows_per_block: int = 1024):
    """-> Dataset of chunks (row0, col0, h, w, band, data:binary) — one
    Ray task per tile-row (Tile format) or row slab (BandSequential),
    exact byte ranges per task."""
    import pyarrow as pa
    import ray.data as rd

    m = isis3_meta(path)
    dt = np.dtype(m["wire_dtype"])
    w, h, nb = m["width"], m["height"], m["bands"]
    items = []
    if m["format"] == "Tile":
        tw, th = m["tile_w"], m["tile_h"]
        ntx, nty = -(-w // tw), -(-h // th)
        for b in range(nb):
            for ty in range(nty):
                items.append({"band": b, "ty": ty})
    else:
        for b in range(nb):
            for lo in range(0, h, rows_per_block):
                items.append({"band": b, "row0": lo})

    def load(t: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("row0", "col0", "h", "w", "band", "data")}
        with open(m["data_path"], "rb") as f:
            for it in t.to_pylist():
                b = it["band"]
                if m["format"] == "Tile":
                    tw, th = m["tile_w"], m["tile_h"]
                    ntx, nty = -(-w // tw), -(-h // th)
                    tile_bytes = tw * th * dt.itemsize
                    ty = it["ty"]
                    base = m["data_offset"] + \
                        ((b * nty + ty) * ntx) * tile_bytes
                    f.seek(base)
                    row = np.frombuffer(f.read(ntx * tile_bytes),
                                        dtype=dt).reshape(ntx, th, tw)
                    y0 = ty * th
                    hh = min(th, h - y0)
                    strip = row.transpose(1, 0, 2).reshape(th, ntx * tw)
                    strip = strip[:hh, :w]
                    rows["row0"].append(y0)
                    rows["col0"].append(0)
                    rows["h"].append(hh)
                    rows["w"].append(w)
                    rows["band"].append(b)
                    rows["data"].append(np.ascontiguousarray(
                        strip.astype(dt.newbyteorder("="))).tobytes())
                else:
                    lo = it["row0"]
                    n = min(rows_per_block, h - lo)
                    f.seek(m["data_offset"]
                           + (b * h + lo) * w * dt.itemsize)
                    blk = np.frombuffer(f.read(n * w * dt.itemsize),
                                        dtype=dt).reshape(n, w)
                    rows["row0"].append(lo)
                    rows["col0"].append(0)
                    rows["h"].append(n)
                    rows["w"].append(w)
                    rows["band"].append(b)
                    rows["data"].append(np.ascontiguousarray(
                        blk.astype(dt.newbyteorder("="))).tobytes())
        return pa.table({
            "row0": pa.array(rows["row0"], pa.int64()),
            "col0": pa.array(rows["col0"], pa.int64()),
            "h": pa.array(rows["h"], pa.int64()),
            "w": pa.array(rows["w"], pa.int64()),
            "band": pa.array(rows["band"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    nbk = max(1, min(len(items), 32))
    return rd.from_items(items, override_num_blocks=nbk).map_batches(
        load, batch_format="pyarrow")
