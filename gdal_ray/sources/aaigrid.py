"""Arc/Info ASCII Grid (.asc) driver — frmts/aaigrid/aaigriddataset.cpp
analogue, from the published ESRI ASCII raster format: a small header
(ncols/nrows/xllcorner/yllcorner/cellsize[/NODATA_value]) followed by one
whitespace-separated row of values per line.

Read path: the driver reads the header and indexes line offsets (a
memchr-speed byte scan, no value parsing), then Ray tasks range-read and
parse only their own row bands — the same header-region/range-read split
every raster driver here uses.  Partitioning assumption: one grid row per
line (what every writer, including this one and the reference, emits).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def write_aaigrid(arr: np.ndarray, path: str, *, xll: float = 0.0,
                  yll: float = 0.0, cellsize: float = 1.0,
                  nodata: float | None = None) -> None:
    """Single-band 2-D array -> .asc (atomic tmp+rename)."""
    if arr.ndim != 2:
        raise ValueError("AAIGrid is single-band 2-D")
    h, w = arr.shape
    is_int = np.issubdtype(arr.dtype, np.integer)
    hdr = [f"ncols {w}", f"nrows {h}", f"xllcorner {xll!r}",
           f"yllcorner {yll!r}", f"cellsize {cellsize!r}"]
    if nodata is not None:
        hdr.append(f"NODATA_value {int(nodata) if is_int else nodata!r}")
    fmt = "%d" if is_int else "%.10g"
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(hdr) + "\n")
        np.savetxt(f, arr, fmt=fmt, delimiter=" ")
    os.replace(tmp, path)


def aaigrid_header(path: str) -> dict:
    """-> {ncols, nrows, xll, yll, cellsize, nodata, line_offsets} without
    parsing any pixel value."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        head = f.read(512)
    meta: dict = {"nodata": None}
    pos = 0
    keys = {"ncols": int, "nrows": int, "xllcorner": float,
            "yllcorner": float, "cellsize": float, "nodata_value": float}
    seen = 0
    for line in head.split(b"\n"):
        toks = line.split()
        if len(toks) == 2 and toks[0].lower().decode() in keys:
            k = toks[0].lower().decode()
            name = {"xllcorner": "xll", "yllcorner": "yll",
                    "nodata_value": "nodata"}.get(k, k)
            meta[name] = keys[k](toks[1])
            pos += len(line) + 1
            seen += 1
        else:
            break
    if seen < 5:
        raise ValueError(f"{path}: not an AAIGrid header")
    # index data-line offsets: one byte scan, no value parse
    with open(path, "rb") as f:
        f.seek(pos)
        buf = f.read()
    nl = np.frombuffer(buf, np.uint8)
    ends = np.flatnonzero(nl == 0x0A) + pos + 1
    offs = np.concatenate([[pos], ends])
    # drop a trailing-EOF entry
    offs = offs[offs < size]
    if len(offs) < meta["nrows"]:
        raise ValueError(f"{path}: {len(offs)} data lines < nrows")
    meta["line_offsets"] = offs[:meta["nrows"] + 1] if len(offs) > meta["nrows"] \
        else np.concatenate([offs, [size]])
    meta["size"] = size
    return meta


def read_aaigrid(path: str, *, rows_per_band: int = 128):
    """-> Dataset of chunk rows (row0, col0, h, w, data: float64 bytes);
    NODATA values surface as NaN (the reference's GetNoDataValue mask)."""
    import ray.data as rd

    meta = aaigrid_header(path)
    H, W = meta["nrows"], meta["ncols"]
    offs = meta["line_offsets"]
    nodata = meta["nodata"]
    size = meta["size"]
    items = []
    for r0 in range(0, H, rows_per_band):
        h = min(rows_per_band, H - r0)
        end = int(offs[r0 + h]) if r0 + h < len(offs) else size
        items.append({"row0": r0, "h": h, "off": int(offs[r0]), "end": end})

    def load(b: pa.Table) -> pa.Table:
        rows = {"row0": [], "col0": [], "h": [], "w": [], "data": []}
        with open(path, "rb") as f:
            for it in b.to_pylist():
                f.seek(it["off"])
                raw = f.read(it["end"] - it["off"])
                vals = np.array(raw.split(), dtype=np.float64)
                blk = vals.reshape(it["h"], W)
                if nodata is not None:
                    blk = np.where(blk == nodata, np.nan, blk)
                rows["row0"].append(it["row0"])
                rows["col0"].append(0)
                rows["h"].append(it["h"])
                rows["w"].append(W)
                rows["data"].append(np.ascontiguousarray(blk).tobytes())
        return pa.table({
            "row0": pa.array(rows["row0"], pa.int64()),
            "col0": pa.array(rows["col0"], pa.int64()),
            "h": pa.array(rows["h"], pa.int64()),
            "w": pa.array(rows["w"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    return rd.from_items(items, override_num_blocks=len(items)) \
        .map_batches(load, batch_format="pyarrow")
