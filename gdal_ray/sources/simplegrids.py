"""Small header+raw grid drivers: SAGA GIS (.sgrd/.sdat), Erdas 7.x
LAN/GIS (.lan/.gis), ILWIS (.mpr/.mp#).

Wire facts (frmts/saga/sagadataset.cpp, frmts/raw/landataset.cpp,
frmts/ilwis/):
- SAGA: tab-separated KEY = VALUE ASCII .sgrd (DATAFORMAT,
  BYTEORDER_BIG, CELLCOUNT_X/Y, POSITION_XMIN/YMIN = CENTER of the
  lower-left cell, CELLSIZE, NODATA_VALUE, TOPTOBOTTOM) + raw .sdat;
  rows bottom-up when TOPTOBOTTOM=FALSE.  .sg-grd-z = the same pair
  zipped.
- LAN: 128-byte header: magic 'HEADER' (old, float dims) or 'HEAD74'
  (int dims at +16/+20), pixel type i2 at +6 (0=byte, 1=4-bit,
  2=int16), band count i2 at +8, BIL interleave, georef floats at
  +112/+116 (UL center) and +120/+124 (pixel sizes); 4-bit data packs
  two pixels per byte, high nibble first.
- ILWIS: .mpr INI (Map/MapStore sections: Size=rows cols, Type
  Byte/Int/Long/Real/float, Data=...mp#) + raw top-down data file;
  georef from BaseMap CoordBounds.
"""

from __future__ import annotations

import os
import re

import numpy as np

# ------------------------------------------------------------------- SAGA

_SAGA_FMT = {
    "BIT": "u1", "BYTE_UNSIGNED": "u1", "BYTE": "i1",
    "SHORTINT_UNSIGNED": "u2", "SHORTINT": "i2",
    "INTEGER_UNSIGNED": "u4", "INTEGER": "i4",
    "FLOAT": "f4", "DOUBLE": "f8",
}


def saga_meta(path: str) -> dict:
    """`path` = .sgrd, .sdat or .sg-grd-z."""
    low = path.lower()
    zipped = low.endswith((".sg-grd-z", ".sg-grd.z"))
    if zipped:
        import io
        import zipfile

        zf = zipfile.ZipFile(path)
        sgrd_name = next(n for n in zf.namelist() if
                         n.lower().endswith(".sgrd"))
        text = zf.read(sgrd_name).decode("latin-1")
        data_name = next(n for n in zf.namelist() if
                         n.lower().endswith(".sdat"))
    else:
        hdr = path[:-5] + ".sgrd" if low.endswith(".sdat") else path
        with open(hdr, "r", errors="replace") as f:
            text = f.read()
        data_name = hdr[:-5] + ".sdat"
    kv = {}
    for ln in text.split("\n"):
        m = re.match(r"(\w+)\s*=\s*(.*)$", ln.strip())
        if m:
            kv[m.group(1).upper()] = m.group(2).strip()
    fmt = kv.get("DATAFORMAT", "FLOAT").upper()
    if fmt not in _SAGA_FMT:
        raise NotImplementedError(f"SAGA DATAFORMAT {fmt}")
    dt = ("<" if kv.get("BYTEORDER_BIG", "FALSE").upper() == "FALSE"
          else ">") + _SAGA_FMT[fmt]
    w = int(kv["CELLCOUNT_X"])
    h = int(kv["CELLCOUNT_Y"])
    cell = float(kv.get("CELLSIZE", 1.0))
    xmin = float(kv.get("POSITION_XMIN", 0.0))
    ymin = float(kv.get("POSITION_YMIN", 0.0))
    return {
        "driver": "SAGA", "width": w, "height": h, "bands": 1,
        "wire_dtype": dt, "dtype": np.dtype(dt).newbyteorder("=").name,
        "offset": int(kv.get("DATAFILE_OFFSET", 0)),
        "bottom_up": kv.get("TOPTOBOTTOM", "FALSE").upper() == "FALSE",
        "nodata": float(kv["NODATA_VALUE"].split(";")[0])
        if "NODATA_VALUE" in kv else None,
        "z_factor": float(kv.get("Z_FACTOR", 1.0)),
        # POSITION is the center of the lower-left cell
        "geotransform": (xmin - cell / 2.0, cell, 0.0,
                         ymin + (h - 0.5) * cell, 0.0, -cell),
        "zipped": zipped, "data_name": data_name, "path": path,
    }


def read_saga_array(path: str) -> np.ndarray:
    m = saga_meta(path)
    dt = np.dtype(m["wire_dtype"])
    n = m["width"] * m["height"]
    if m["zipped"]:
        import zipfile

        with zipfile.ZipFile(m["path"]) as zf:
            raw = zf.read(m["data_name"])[m["offset"]:]
    else:
        with open(m["data_name"], "rb") as f:
            f.seek(m["offset"])
            raw = f.read(n * dt.itemsize)
    arr = np.frombuffer(raw[:n * dt.itemsize], dtype=dt).reshape(
        m["height"], m["width"])
    if m["bottom_up"]:
        arr = arr[::-1]
    return np.ascontiguousarray(arr.astype(dt.newbyteorder("=")))


# -------------------------------------------------------------------- LAN

def lan_meta(path: str) -> dict:
    with open(path, "rb") as f:
        hdr = f.read(128)
    magic = hdr[:6]
    if magic not in (b"HEADER", b"HEAD74"):
        raise ValueError("not an Erdas 7.x LAN/GIS file")
    import struct

    ptype, nbands = struct.unpack_from("<hh", hdr, 6)
    if magic == b"HEADER":
        w = int(struct.unpack_from("<f", hdr, 16)[0])
        h = int(struct.unpack_from("<f", hdr, 20)[0])
    else:
        w, h = struct.unpack_from("<ii", hdr, 16)
    if ptype == 0:
        dt, four_bit = "u1", False
    elif ptype == 1:
        dt, four_bit = "u1", True
    elif ptype == 2:
        dt, four_bit = "<i2", False
    else:
        raise NotImplementedError(f"LAN pixel type {ptype}")
    gx, gy, psx, psy = struct.unpack_from("<ffff", hdr, 112)
    return {
        "driver": "LAN", "width": w, "height": h, "bands": nbands,
        "wire_dtype": dt, "dtype": np.dtype(dt.lstrip("<")).name,
        "four_bit": four_bit,
        "geotransform": (gx - psx / 2.0, psx, 0.0, gy + psy / 2.0, 0.0,
                         -psy) if psx and psy else None,
    }


def read_lan_array(path: str) -> np.ndarray:
    m = lan_meta(path)
    w, h, nb = m["width"], m["height"], m["bands"]
    with open(path, "rb") as f:
        f.seek(128)
        data = f.read()
    if m["four_bit"]:
        # two pixels per byte, high nibble first; BIL per band line
        lpb = (w + 1) // 2
        out = np.empty((h, w, nb), np.uint8)
        for y in range(h):
            for b in range(nb):
                off = (y * nb + b) * lpb
                row = np.frombuffer(data[off:off + lpb], np.uint8)
                pair = np.empty(lpb * 2, np.uint8)
                pair[0::2] = row >> 4
                pair[1::2] = row & 0xF
                out[y, :, b] = pair[:w]
    else:
        dt = np.dtype(m["wire_dtype"])
        arr = np.frombuffer(data[:h * nb * w * dt.itemsize],
                            dtype=dt).reshape(h, nb, w)
        out = np.ascontiguousarray(
            arr.transpose(0, 2, 1).astype(dt.newbyteorder("=")))
    return out[:, :, 0] if nb == 1 else out


# ------------------------------------------------------------------ ILWIS

_ILWIS_TYPES = {
    "byte": "u1", "int": "<i2", "long": "<i4",
    "float": "<f4", "real": "<f8",
}


def ilwis_meta(path: str) -> dict:
    with open(path, "r", errors="replace") as f:
        text = f.read()
    sections: dict = {}
    cur = None
    for ln in text.split("\n"):
        ln = ln.strip()
        if ln.startswith("[") and ln.endswith("]"):
            cur = ln[1:-1].lower()
            sections[cur] = {}
        elif "=" in ln and cur:
            k, v = ln.split("=", 1)
            sections[cur][k.strip().lower()] = v.strip()
    mp = sections.get("map", {})
    st = sections.get("mapstore", {})
    size = (mp.get("size") or "").split()
    if len(size) != 2:
        raise ValueError("not an ILWIS .mpr (no Map/Size)")
    h, w = int(size[0]), int(size[1])
    t = st.get("type", "Byte").lower()
    if t not in _ILWIS_TYPES:
        raise NotImplementedError(f"ILWIS store type {st.get('type')}")
    gt = None
    cb = sections.get("basemap", {}).get("coordbounds")
    if cb:
        x0, y0, x1, y1 = (float(v) for v in cb.split()[:4])
        gt = (min(x0, x1), (max(x0, x1) - min(x0, x1)) / w, 0.0,
              max(y0, y1), 0.0, -(max(y0, y1) - min(y0, y1)) / h)
    return {
        "driver": "ILWIS", "width": w, "height": h, "bands": 1,
        "wire_dtype": _ILWIS_TYPES[t],
        "dtype": np.dtype(_ILWIS_TYPES[t]).newbyteorder("=").name,
        "data_path": os.path.join(os.path.dirname(path),
                                  st.get("data", "")),
        "offset": int(st.get("startoffset", 0)),
        "geotransform": gt,
    }


def read_ilwis_array(path: str) -> np.ndarray:
    m = ilwis_meta(path)
    dt = np.dtype(m["wire_dtype"])
    n = m["width"] * m["height"]
    with open(m["data_path"], "rb") as f:
        f.seek(m["offset"])
        raw = f.read(n * dt.itemsize)
    return np.ascontiguousarray(np.frombuffer(raw, dtype=dt).reshape(
        m["height"], m["width"]).astype(dt.newbyteorder("=")))


# ------------------------------------------------- shared Dataset reader

def _slab_dataset(path, reader, meta, rows_per_block=1024):
    import pyarrow as pa
    import ray.data as rd

    m = meta(path)
    h = m["height"]
    items = [{"row0": lo, "n_rows": min(rows_per_block, h - lo)}
             for lo in range(0, h, rows_per_block)]

    def load(t: pa.Table) -> pa.Table:
        arr = reader(path)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        rows = {"row0": [], "n_rows": [], "band": [], "data": []}
        for it in t.to_pylist():
            lo, n = it["row0"], it["n_rows"]
            for b in range(arr.shape[2]):
                rows["row0"].append(lo)
                rows["n_rows"].append(n)
                rows["band"].append(b)
                rows["data"].append(np.ascontiguousarray(
                    arr[lo:lo + n, :, b]).tobytes())
        return pa.table({
            "row0": pa.array(rows["row0"], pa.int64()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "band": pa.array(rows["band"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    return rd.from_items(items, override_num_blocks=max(1, min(
        len(items), 8))).map_batches(load, batch_format="pyarrow")


def read_saga(path: str, **kw):
    return _slab_dataset(path, read_saga_array, saga_meta, **kw)


def read_lan(path: str, **kw):
    return _slab_dataset(path, read_lan_array, lan_meta, **kw)


def read_ilwis(path: str, **kw):
    return _slab_dataset(path, read_ilwis_array, ilwis_meta, **kw)


# --------------------------------------------------------------- Terragen

def terragen_meta(path: str) -> dict:
    """Terragen .ter (frmts/terragen): 'TERRAGENTERRAIN ' magic, 4-char
    chunks: SIZE (n, +2 pad), XPTS/YPTS, SCAL (3 f4, SCAL=y), ALTW
    (heightscale i2, baseheight i2, then xpts*ypts i2 LE bottom-up);
    band exposes the raw Int16 with scale = SCAL/65536*heightscale and
    offset = SCAL*baseheight."""
    import struct as _s

    with open(path, "rb") as f:
        buf = f.read()
    if not buf.startswith(b"TERRAGENTERRAIN "):
        raise ValueError("not a Terragen terrain file")
    p = 16
    if buf[p:p + 4] != b"SIZE":
        raise ValueError("Terragen: missing SIZE")
    nsize = _s.unpack_from("<H", buf, p + 4)[0]
    p += 8
    xpts = ypts = nsize + 1
    scal = 30.0
    hs = bh = 0
    data_off = 0
    while p + 4 <= len(buf):
        tag = buf[p:p + 4]
        p += 4
        if tag == b"XPTS":
            xpts = _s.unpack_from("<H", buf, p)[0]
            p += 4
        elif tag == b"YPTS":
            ypts = _s.unpack_from("<H", buf, p)[0]
            p += 4
        elif tag == b"SCAL":
            scal = _s.unpack_from("<f", buf, p + 4)[0]
            p += 12
        elif tag == b"CRAD":
            p += 4
        elif tag == b"CRVM":
            p += 4
        elif tag == b"ALTW":
            hs, bh = _s.unpack_from("<hh", buf, p)
            p += 4
            data_off = p
            p += xpts * ypts * 2
        elif tag == b"EOF ":
            break
        else:
            break
    if not data_off:
        raise ValueError("Terragen: no ALTW chunk")
    return {
        "driver": "Terragen", "width": xpts, "height": ypts, "bands": 1,
        "dtype": "int16", "data_offset": data_off,
        "scale": scal / 65536.0 * hs, "offset": scal * bh,
        "pixel_size": scal,
        "geotransform": (0.0, scal, 0.0, ypts * scal, 0.0, -scal),
    }


def read_terragen_array(path: str) -> np.ndarray:
    m = terragen_meta(path)
    with open(path, "rb") as f:
        f.seek(m["data_offset"])
        raw = np.frombuffer(f.read(m["width"] * m["height"] * 2), "<i2")
    # bottom-up storage -> top-down raster
    return np.ascontiguousarray(
        raw.reshape(m["height"], m["width"])[::-1].astype("=i2"))


# --------------------------------------------------------------- Leveller

def leveller_meta(path: str) -> dict:
    """Leveller .ter (frmts/leveller): 'trrn' + version, then tags
    [len u8][name][datalen u4 LE][data]: hf_w, hf_b, hf_data (row-major
    top-down f4 LE)."""
    import struct as _s

    with open(path, "rb") as f:
        buf = f.read()
    if not buf.startswith(b"trrn"):
        raise ValueError("not a Leveller terrain file")
    version = buf[4]
    p = 5
    tags = {}
    while p + 1 < len(buf):
        dlen = buf[p]
        if dlen == 0 or dlen > 64 or p + 1 + dlen + 4 > len(buf):
            break
        name = buf[p + 1:p + 1 + dlen].decode("latin-1")
        p += 1 + dlen
        (datalen,) = _s.unpack_from("<I", buf, p)
        p += 4
        tags[name] = (p, datalen)
        p += datalen
    if "hf_w" not in tags or "hf_data" not in tags:
        raise ValueError("Leveller: missing heightfield tags")

    def u4(name):
        off, _ = tags[name]
        return _s.unpack_from("<I", buf, off)[0]

    m = {
        "driver": "Leveller", "version": version,
        "width": u4("hf_w"), "height": u4("hf_b"), "bands": 1,
        "dtype": "float32", "data_offset": tags["hf_data"][0],
        "tags": sorted(tags),
    }
    return m


def read_leveller_array(path: str) -> np.ndarray:
    m = leveller_meta(path)
    with open(path, "rb") as f:
        f.seek(m["data_offset"])
        raw = np.frombuffer(f.read(m["width"] * m["height"] * 4), "<f4")
    return np.ascontiguousarray(
        raw.reshape(m["height"], m["width"]).astype("=f4"))


# ------------------------------------------------------- Surfer 6/7 grids

def surfer_meta(path: str) -> dict:
    """Golden Software Surfer grids (frmts/gsg): DSBB (Surfer 6 binary:
    i2 nx/ny, 4 f8 bounds + zmin/zmax, f4 data bottom-up, blank
    1.701410009187828e38) and DSRB (Surfer 7: tagged sections — GRID
    {i4 ny,nx; f8 xLL,yLL,xSize,ySize,zMin,zMax,rot,blank} then DATA
    f8 bottom-up)."""
    import struct as _s

    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] == b"DSBB":
        nx, ny = _s.unpack_from("<hh", buf, 4)
        xmin, xmax, ymin, ymax, zmin, zmax = _s.unpack_from("<6d", buf, 8)
        return {"driver": "GSBG", "width": nx, "height": ny, "bands": 1,
                "dtype": "float32", "data_offset": 56, "item": "<f4",
                "blank": 1.701410009187828e38,
                "geotransform": (xmin - (xmax - xmin) / (nx - 1) / 2,
                                 (xmax - xmin) / (nx - 1), 0.0,
                                 ymax + (ymax - ymin) / (ny - 1) / 2, 0.0,
                                 -(ymax - ymin) / (ny - 1)),
                "bottom_up": True}
    if buf[:4] == b"DSRB":
        p = 4 + 8  # header tag: size(4) + version(4)
        grid = None
        data_off = None
        while p + 8 <= len(buf):
            tag = buf[p:p + 4]
            (size,) = _s.unpack_from("<i", buf, p + 4)
            p += 8
            if tag == b"GRID":
                ny, nx = _s.unpack_from("<ii", buf, p)
                xll, yll, xs, ys, zmin, zmax, rot, blank = \
                    _s.unpack_from("<8d", buf, p + 8)
                grid = (nx, ny, xll, yll, xs, ys, blank)
                p += size
            elif tag == b"DATA":
                data_off = p
                p += size if size > 0 else 0
                break
            else:
                p += size
        if grid is None or data_off is None:
            raise ValueError("Surfer 7: missing GRID/DATA sections")
        nx, ny, xll, yll, xs, ys, blank = grid
        return {"driver": "GS7BG", "width": nx, "height": ny, "bands": 1,
                "dtype": "float64", "data_offset": data_off, "item": "<f8",
                "blank": blank,
                "geotransform": (xll - xs / 2, xs, 0.0,
                                 yll + (ny - 0.5) * ys, 0.0, -ys),
                "bottom_up": True}
    raise ValueError("not a Surfer binary grid (DSBB/DSRB)")


def read_surfer_array(path: str) -> np.ndarray:
    m = surfer_meta(path)
    dt = np.dtype(m["item"])
    n = m["width"] * m["height"]
    with open(path, "rb") as f:
        f.seek(m["data_offset"])
        arr = np.frombuffer(f.read(n * dt.itemsize), dtype=dt).reshape(
            m["height"], m["width"])
    if m["bottom_up"]:
        arr = arr[::-1]
    return np.ascontiguousarray(arr.astype(dt.newbyteorder("=")))


# ---------------------------------------------------------------- BYN

def byn_meta(path: str) -> dict:
    """NRCan geoid BYN (frmts/raw/byndataset): 80-byte header with
    arcsecond boundaries (i4 S,N,W,E; i2 dlat,dlon; x1000 when
    Scale=1), i2 data size (2/4), Factor double as band scale, LSB
    when ByteOrder==1; rows top-down from byte 80."""
    import struct as _s

    with open(path, "rb") as f:
        hdr = f.read(80)
    south, north, west, east = _s.unpack_from("<iiii", hdr, 0)
    dlat, dlon, glob, typ = _s.unpack_from("<hhhh", hdr, 16)
    (factor,) = _s.unpack_from("<d", hdr, 24)
    sizeof, vdatum = _s.unpack_from("<hh", hdr, 32)
    byteorder, scale = _s.unpack_from("<hh", hdr, 48)
    fs = 1000.0 if scale == 1 else 1.0
    s, n, w, e = south * fs, north * fs, west * fs, east * fs
    dla, dlo = dlat * fs, dlon * fs
    if dlo == 0 or dla == 0:
        raise ValueError("BYN: zero spacing")
    nx = int((e - w + 1.0) / dlo + 1.0)
    ny = int((n - s + 1.0) / dla + 1.0)
    if sizeof == 2:
        dt = "i2"
    elif sizeof == 4:
        dt = "i4"
    else:
        raise NotImplementedError(f"BYN data size {sizeof}")
    order = "<" if byteorder == 1 else ">"
    return {"driver": "BYN", "width": nx, "height": ny, "bands": 1,
            "wire_dtype": order + dt, "dtype": np.dtype(dt).name,
            "scale": factor, "data_offset": 80,
            "geotransform": ((w - dlo / 2.0) / 3600.0, dlo / 3600.0, 0.0,
                             (n + dla / 2.0) / 3600.0, 0.0, -dla / 3600.0)}


def read_byn_array(path: str) -> np.ndarray:
    m = byn_meta(path)
    dt = np.dtype(m["wire_dtype"])
    n = m["width"] * m["height"]
    with open(path, "rb") as f:
        f.seek(m["data_offset"])
        arr = np.frombuffer(f.read(n * dt.itemsize), dtype=dt)
    return np.ascontiguousarray(arr.reshape(
        m["height"], m["width"]).astype(dt.newbyteorder("=")))
