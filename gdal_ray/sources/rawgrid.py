"""Raw-binary raster drivers: SRTM HGT, ENVI, ESRI EHdr (.bil/.hdr).

Reference semantics:
- frmts/srtmhgt/srtmhgtdataset.cpp — tile name N51E000.hgt encodes the
  SW corner; big-endian int16; grid edge = sqrt(filesize/2) (3601 SRTM1,
  1201 SRTM3); pixel centers sit ON the integer graticule, so the
  geotransform is offset half a cell outward; nodata -32768.
- frmts/raw/envidataset.cpp — 'ENVI' .hdr text (samples/lines/bands,
  data type, interleave bsq|bil|bip, byte order, map info) + a raw
  binary alongside.
- frmts/raw/ehdrdataset.cpp — ESRI .hdr (NROWS/NCOLS/NBITS/ULXMAP/...)
  + .bil/.bsq/.bip binary.

Scale shape (the netcdf3/hdf5 pattern): the header is tiny and parses
driver-side; the payload is a contiguous extent, so readers split the
row dimension into slabs and every Ray task seeks straight to its byte
range.  BIP/BIL interleaves keep whole rows per slab so each slab read
is still one contiguous range.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------- SRTM HGT

_HGT_RE = re.compile(r"([NS])(\d{1,2})([EW])(\d{1,3})", re.IGNORECASE)
HGT_NODATA = -32768


def hgt_corner(path: str) -> tuple[float, float]:
    """SW corner (lon, lat) from the tile name (srtmhgtdataset.cpp:79)."""
    m = _HGT_RE.search(os.path.basename(path))
    if not m:
        raise ValueError(f"not an SRTM tile name: {path}")
    lat = int(m.group(2)) * (1 if m.group(1).upper() == "N" else -1)
    lon = int(m.group(4)) * (1 if m.group(3).upper() == "E" else -1)
    return float(lon), float(lat)


def hgt_meta(path: str) -> dict:
    nbytes = os.path.getsize(path)
    n = int(round((nbytes // 2) ** 0.5))
    if 2 * n * n != nbytes:
        raise ValueError(f"HGT size {nbytes} is not 2*n^2")
    lon, lat = hgt_corner(path)
    step = 1.0 / (n - 1)
    # pixel centers on the graticule ⇒ origin shifted half a cell out
    gt = [lon - step / 2.0, step, 0.0, lat + 1.0 + step / 2.0, 0.0, -step]
    return {"format": "SRTMHGT", "width": n, "height": n, "dtype": ">i2",
            "nodata": HGT_NODATA, "geotransform": gt}


def write_hgt(path: str, arr: np.ndarray) -> None:
    """(n, n) int16 -> .hgt (big-endian; name must carry the corner)."""
    arr = np.asarray(arr)
    if arr.ndim != 2 or arr.shape[0] != arr.shape[1]:
        raise ValueError("HGT tiles are square")
    hgt_corner(path)  # validates the name
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(arr.astype(">i2").tobytes())
    os.replace(tmp, path)


def read_hgt_array(path: str) -> np.ndarray:
    m = hgt_meta(path)
    return np.fromfile(path, dtype=">i2").reshape(m["height"], m["width"])


# ------------------------------------------------------------------- ENVI

_ENVI_DTYPES = {1: "u1", 2: "<i2", 3: "<i4", 4: "<f4", 5: "<f8",
                12: "<u2", 13: "<u4", 14: "<i8", 15: "<u8"}
_ENVI_CODES = {np.dtype(v.lstrip("<")): k for k, v in _ENVI_DTYPES.items()}


def _envi_hdr_path(path: str) -> str:
    for cand in (path + ".hdr", os.path.splitext(path)[0] + ".hdr"):
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(f"no ENVI/.hdr header for {path}")


def envi_meta(path: str) -> dict:
    hdr = _envi_hdr_path(path)
    text = open(hdr).read()
    if not text.lstrip().upper().startswith("ENVI"):
        raise ValueError("not an ENVI header")
    kv = {}
    for m in re.finditer(r"^\s*([a-z ]+?)\s*=\s*(\{[^}]*\}|[^\n]*)$",
                         text, re.IGNORECASE | re.MULTILINE):
        kv[m.group(1).strip().lower()] = m.group(2).strip()
    dt_code = int(kv["data type"])
    if dt_code not in _ENVI_DTYPES:
        raise NotImplementedError(f"ENVI data type {dt_code}")
    dt = _ENVI_DTYPES[dt_code]
    if int(kv.get("byte order", "0")) == 1:
        dt = dt.replace("<", ">")
    meta = {
        "format": "ENVI",
        "width": int(kv["samples"]),
        "height": int(kv["lines"]),
        "bands": int(kv.get("bands", "1")),
        "dtype": dt,
        "interleave": kv.get("interleave", "bsq").lower(),
        "offset": int(kv.get("header offset", "0")),
    }
    mi = kv.get("map info")
    if mi:
        parts = [p.strip() for p in mi.strip("{}").split(",")]
        # {proj, ref_x, ref_y, map_x, map_y, xdim, ydim, ...}
        rx, ry = float(parts[1]), float(parts[2])
        mx, my = float(parts[3]), float(parts[4])
        dx, dy = float(parts[5]), float(parts[6])
        x0 = mx - (rx - 1.0) * dx     # ENVI refs are 1-based pixel coords
        y0 = my + (ry - 1.0) * dy
        meta["geotransform"] = [x0, dx, 0.0, y0, 0.0, -dy]
    return meta


def write_envi(path: str, arr: np.ndarray, *, interleave: str = "bsq",
               geotransform=None) -> None:
    """(h, w) or (bands, h, w) -> ENVI raw + .hdr (atomic)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[None]
    b, h, w = arr.shape
    dt = arr.dtype.newbyteorder("=")
    if np.dtype(dt) not in _ENVI_CODES:
        raise NotImplementedError(f"ENVI dtype {arr.dtype}")
    if interleave == "bsq":
        payload = arr
    elif interleave == "bil":
        payload = arr.transpose(1, 0, 2)   # (h, bands, w)
    elif interleave == "bip":
        payload = arr.transpose(1, 2, 0)   # (h, w, bands)
    else:
        raise ValueError("interleave must be bsq|bil|bip")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(np.ascontiguousarray(payload).astype(dt.newbyteorder("<"))
                .tobytes())
    os.replace(tmp, path)
    lines = ["ENVI", f"samples = {w}", f"lines = {h}", f"bands = {b}",
             "header offset = 0", "file type = ENVI Standard",
             f"data type = {_ENVI_CODES[np.dtype(dt)]}",
             f"interleave = {interleave}", "byte order = 0"]
    if geotransform is not None:
        g = geotransform
        lines.append("map info = {Arbitrary, 1, 1, "
                     f"{g[0]}, {g[3]}, {g[1]}, {-g[5]}}}")
    hdr_tmp = path + ".hdr.tmp"
    with open(hdr_tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(hdr_tmp, path + ".hdr")


def read_envi_array(path: str) -> np.ndarray:
    """Full read -> (bands, h, w) (small data / tests)."""
    m = envi_meta(path)
    b, h, w = m["bands"], m["height"], m["width"]
    raw = np.fromfile(path, dtype=np.dtype(m["dtype"]),
                      offset=m["offset"], count=b * h * w)
    il = m["interleave"]
    if il == "bsq":
        return raw.reshape(b, h, w)
    if il == "bil":
        return raw.reshape(h, b, w).transpose(1, 0, 2)
    return raw.reshape(h, w, b).transpose(2, 0, 1)


# ------------------------------------------------------------------ EHdr

def ehdr_meta(path: str) -> dict:
    hdr = _envi_hdr_path(path)   # same sibling-.hdr convention
    kv = {}
    for ln in open(hdr):
        parts = ln.split()
        if len(parts) >= 2:
            kv[parts[0].upper()] = parts[1]
    if "NROWS" not in kv or "NCOLS" not in kv:
        raise ValueError("not an ESRI EHdr header")
    nbits = int(kv.get("NBITS", "8"))
    pixeltype = kv.get("PIXELTYPE", "UNSIGNEDINT").upper()
    dt = {(8, "UNSIGNEDINT"): "u1", (16, "SIGNEDINT"): "i2",
          (16, "UNSIGNEDINT"): "u2", (32, "SIGNEDINT"): "i4",
          (32, "FLOAT"): "f4"}.get((nbits, pixeltype))
    if dt is None:
        raise NotImplementedError(f"EHdr NBITS={nbits} PIXELTYPE={pixeltype}")
    order = ">" if kv.get("BYTEORDER", "I").upper() in ("M", "MSBFIRST") \
        else "<"
    meta = {"format": "EHdr", "width": int(kv["NCOLS"]),
            "height": int(kv["NROWS"]), "bands": int(kv.get("NBANDS", "1")),
            "dtype": order + dt,
            "interleave": kv.get("LAYOUT", "BIL").lower(), "offset": 0}
    if "ULXMAP" in kv:
        dx = float(kv.get("XDIM", "1")); dy = float(kv.get("YDIM", "1"))
        # ULXMAP/ULYMAP are the CENTER of the upper-left pixel
        meta["geotransform"] = [float(kv["ULXMAP"]) - dx / 2, dx, 0.0,
                                float(kv["ULYMAP"]) + dy / 2, 0.0, -dy]
    if "NODATA" in kv:
        meta["nodata"] = float(kv["NODATA"])
    return meta


# -------------------------------------------------- Ray slab fan-out read

def read_rawgrid(path: str, *, rows_per_block: int = 1024):
    """HGT / ENVI / EHdr -> ray.data.Dataset of row-slab chunks
    (row0, n_rows, band, data:binary).  One seek+read per (slab, band)
    for BSQ; one per slab for BIL/BIP (whole rows are contiguous)."""
    import ray.data as rd

    low = path.lower()
    if low.endswith(".hgt"):
        m = hgt_meta(path)
        m.update(bands=1, interleave="bsq", offset=0)
    elif low.endswith((".bil", ".bip", ".bsq")) or "NROWS" in \
            open(_envi_hdr_path(path)).read(256).upper():
        try:
            m = envi_meta(path)
        except ValueError:
            m = ehdr_meta(path)
    else:
        m = envi_meta(path)

    h, w, b = m["height"], m["width"], m["bands"]
    il, off = m["interleave"], m["offset"]
    itemsize = np.dtype(m["dtype"]).itemsize
    items = []
    for lo in range(0, h, rows_per_block):
        hi = min(lo + rows_per_block, h)
        if il == "bsq":
            for band in range(b):
                items.append({"row0": lo, "n_rows": hi - lo, "band": band})
        else:
            items.append({"row0": lo, "n_rows": hi - lo, "band": -1})

    def load(t: pa.Table) -> pa.Table:
        rows = {"row0": [], "n_rows": [], "band": [], "data": []}
        with open(path, "rb") as f:
            for it in t.to_pylist():
                lo, n = it["row0"], it["n_rows"]
                if il == "bsq":
                    band = it["band"]
                    f.seek(off + (band * h + lo) * w * itemsize)
                    raw = f.read(n * w * itemsize)
                    rows["band"].append(band)
                    rows["data"].append(raw)
                else:
                    f.seek(off + lo * w * b * itemsize)
                    raw = f.read(n * w * b * itemsize)
                    rows["band"].append(-1)   # interleaved: all bands
                    rows["data"].append(raw)
                rows["row0"].append(lo)
                rows["n_rows"].append(n)
        return pa.table({
            "row0": pa.array(rows["row0"], pa.int64()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "band": pa.array(rows["band"], pa.int32()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    return rd.from_items(items).map_batches(load, batch_format="pyarrow")
