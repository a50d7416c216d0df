"""ERMapper ERS raster driver (frmts/ers/ersdataset.cpp — the .ers
ASCII header grammar with nested ``X Begin``/``X End`` blocks, and the
companion raw data file laid out band-interleaved-by-line).

Wire facts: keys are case-insensitive; ``#`` starts a comment only
outside quoted strings; values may be quoted strings, ``{ }`` lists
(possibly multi-line), or bare tokens.  CellType names map to dtypes;
ByteOrder MSBFirst/LSBFirst; the data file is the header path without
``.ers`` unless ``DataFile`` says otherwise; pixel layout is BIL
(line-major, band-middle): line i of band b lives at
``HeaderOffset + ((i * bands) + b) * width * cellsize``.

Georeferencing: RegistrationCoord Eastings/Northings (or DMS
Latitude/Longitude for CoordinateType=LL) anchor cell
(RegistrationCellX, RegistrationCellY) — GDAL treats the registration
point as the grid origin cell corner.

Scale shape: ``ers_meta`` parses the small text header driver-side;
``read_ers`` delegates to the rawgrid row-slab reader pattern (one
seek per slab×band).
"""

from __future__ import annotations

import os
import re

import numpy as np

_CELLTYPES = {
    "unsigned8bitinteger": "u1", "signed8bitinteger": "i1",
    "unsigned16bitinteger": "<u2", "signed16bitinteger": "<i2",
    "unsigned32bitinteger": "<u4", "signed32bitinteger": "<i4",
    "ieee4bytereal": "<f4", "ieee8bytereal": "<f8",
}


def _strip_comments(text: str) -> str:
    out = []
    in_q = False
    i = 0
    while i < len(text):
        c = text[i]
        if c == '"' and (i == 0 or text[i - 1] != "\\"):
            in_q = not in_q
            out.append(c)
        elif c == "#" and not in_q:
            while i < len(text) and text[i] != "\n":
                i += 1
            continue
        else:
            out.append(c)
        i += 1
    return "".join(out)


def _parse_block(lines, i):
    """Parse lines[i:] until the matching 'X End'; returns (dict, next)."""
    d: dict = {}
    while i < len(lines):
        ln = lines[i].strip()
        i += 1
        if not ln:
            continue
        m = re.match(r"(\w+)\s+Begin$", ln, re.I)
        if m:
            sub, i = _parse_block(lines, i)
            key = m.group(1).lower()
            if key in d:  # repeated blocks (BandId) -> list
                if not isinstance(d[key], list):
                    d[key] = [d[key]]
                d[key].append(sub)
            else:
                d[key] = sub
            continue
        if re.match(r"\w+\s+End$", ln, re.I):
            return d, i
        m = re.match(r"(\w+)\s*=\s*(.*)$", ln, re.S)
        if m:
            key, val = m.group(1).lower(), m.group(2).strip()
            if val.startswith("{") and "}" not in val:
                # multi-line list value: swallow until closing brace
                # outside quotes
                while i < len(lines):
                    val += "\n" + lines[i]
                    i += 1
                    q = val.count('"') - val.replace('\\"', "").count('"')
                    if "}" in re.sub(r'"(?:[^"\\]|\\.)*"', "", val):
                        break
            d[key] = val.strip().strip('"')
    return d, i


def _dms(v: str) -> float:
    parts = v.split(":")
    if len(parts) == 3:
        sign = -1.0 if parts[0].strip().startswith("-") else 1.0
        return sign * (abs(float(parts[0])) + float(parts[1]) / 60.0
                       + float(parts[2]) / 3600.0)
    return float(v)


def ers_meta(path: str) -> dict:
    with open(path, "r", errors="replace") as f:
        text = _strip_comments(f.read())
    lines = text.split("\n")
    # find DatasetHeader Begin
    i = 0
    while i < len(lines) and not re.match(r"\s*DatasetHeader\s+Begin",
                                          lines[i], re.I):
        i += 1
    if i == len(lines):
        raise ValueError("not an ERS header")
    hdr, _ = _parse_block(lines, i + 1)
    ri = hdr.get("rasterinfo", {})
    ct = ri.get("celltype", "").lower()
    if ct not in _CELLTYPES:
        raise NotImplementedError(f"ERS CellType {ri.get('celltype')}")
    dt = _CELLTYPES[ct]
    if hdr.get("byteorder", "LSBFirst").lower() == "msbfirst":
        dt = dt.replace("<", ">")
    h = int(ri["nroflines"])
    w = int(ri["nrofcellsperline"])
    bands = int(ri.get("nrofbands", 1))
    datafile = hdr.get("datafile")
    if datafile:
        data_path = os.path.join(os.path.dirname(path), datafile)
    else:
        data_path = path[:-4] if path.lower().endswith(".ers") else path
    gt = None
    cell = ri.get("cellinfo", {})
    reg = ri.get("registrationcoord", {})
    try:
        xd, yd = float(cell["xdimension"]), float(cell["ydimension"])
        if "eastings" in reg:
            x0, y0 = float(reg["eastings"]), float(reg["northings"])
        else:
            x0 = _dms(reg["longitude"])
            y0 = _dms(reg["latitude"])
        rcx = float(ri.get("registrationcellx", 0))
        rcy = float(ri.get("registrationcelly", 0))
        gt = (x0 - rcx * xd, xd, 0.0, y0 + rcy * yd, 0.0, -yd)
    except (KeyError, ValueError):
        pass
    band_ids = ri.get("bandid", [])
    if isinstance(band_ids, dict):
        band_ids = [band_ids]
    return {
        "driver": "ERS", "width": w, "height": h, "bands": bands,
        "wire_dtype": dt,
        "dtype": np.dtype(dt).newbyteorder("=").name,
        "interleave": "bil",
        "offset": int(hdr.get("headeroffset", 0)),
        "data_path": data_path,
        "geotransform": gt,
        "nodata": float(ri["nullcellvalue"])
        if "nullcellvalue" in ri else None,
        "band_names": [b.get("value", "") for b in band_ids],
        "projection": hdr.get("coordinatespace", {}).get("projection"),
        "datum": hdr.get("coordinatespace", {}).get("datum"),
    }


def read_ers_array(path: str) -> np.ndarray:
    """Full decode -> (h, w) or (h, w, bands)."""
    m = ers_meta(path)
    dt = np.dtype(m["wire_dtype"])
    w, h, bands = m["width"], m["height"], m["bands"]
    with open(m["data_path"], "rb") as f:
        f.seek(m["offset"])
        flat = np.frombuffer(f.read(w * h * bands * dt.itemsize), dtype=dt)
    arr = flat.reshape(h, bands, w).transpose(0, 2, 1)
    arr = np.ascontiguousarray(arr.astype(dt.newbyteorder("=")))
    return arr[:, :, 0] if bands == 1 else arr


def read_ers(path: str, *, rows_per_block: int = 1024):
    """-> Dataset of row-slab chunks (row0, n_rows, band, data:binary),
    the open_raster chunk schema — one seek per (slab, band, line-run)."""
    import pyarrow as pa
    import ray.data as rd

    m = ers_meta(path)
    dt = np.dtype(m["wire_dtype"])
    w, h, bands = m["width"], m["height"], m["bands"]
    line = w * dt.itemsize
    items = [{"row0": lo, "n_rows": min(rows_per_block, h - lo), "band": b}
             for lo in range(0, h, rows_per_block) for b in range(bands)]

    def load(t: pa.Table) -> pa.Table:
        rows = {"row0": [], "n_rows": [], "band": [], "data": []}
        with open(m["data_path"], "rb") as f:
            for it in t.to_pylist():
                lo, n, b = it["row0"], it["n_rows"], it["band"]
                out = np.empty((n, w), dtype=dt.newbyteorder("="))
                for k in range(n):
                    f.seek(m["offset"] + ((lo + k) * bands + b) * line)
                    out[k] = np.frombuffer(f.read(line), dtype=dt)
                rows["row0"].append(lo)
                rows["n_rows"].append(n)
                rows["band"].append(b)
                rows["data"].append(out.tobytes())
        return pa.table({
            "row0": pa.array(rows["row0"], pa.int64()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "band": pa.array(rows["band"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    nb = max(1, min(len(items), 32))
    return rd.from_items(items, override_num_blocks=nb).map_batches(
        load, batch_format="pyarrow")


def write_ers(path: str, arr, *, geotransform=None, datum="RAW",
              projection="RAW"):
    """Minimal spec-valid .ers + raw BIL data file."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, bands = a.shape
    inv = {v: k for k, v in _CELLTYPES.items()}
    key = "<" + a.dtype.str[1:] if a.dtype.str[0] in "<=|" else a.dtype.str
    key = key.replace("|", "<")
    ct = None
    for code, name in [("u1", "Unsigned8BitInteger"),
                       ("i1", "Signed8BitInteger"),
                       ("<u2", "Unsigned16BitInteger"),
                       ("<i2", "Signed16BitInteger"),
                       ("<u4", "Unsigned32BitInteger"),
                       ("<i4", "Signed32BitInteger"),
                       ("<f4", "IEEE4ByteReal"), ("<f8", "IEEE8ByteReal")]:
        if np.dtype(code) == a.dtype.newbyteorder("="):
            ct = name
            break
    if ct is None:
        raise NotImplementedError(f"ERS write for dtype {a.dtype}")
    cell = ""
    if geotransform is not None:
        cell = (f"\t\tCellInfo Begin\n"
                f"\t\t\tXdimension\t= {geotransform[1]!r}\n"
                f"\t\t\tYdimension\t= {abs(geotransform[5])!r}\n"
                f"\t\tCellInfo End\n"
                f"\t\tRegistrationCoord Begin\n"
                f"\t\t\tEastings\t= {geotransform[0]!r}\n"
                f"\t\t\tNorthings\t= {geotransform[3]!r}\n"
                f"\t\tRegistrationCoord End\n")
    hdr = (
        "DatasetHeader Begin\n"
        '\tVersion\t\t= "6.0"\n'
        "\tDataSetType\t= ERStorage\n"
        "\tDataType\t= Raster\n"
        "\tByteOrder\t= LSBFirst\n"
        "\tCoordinateSpace Begin\n"
        f'\t\tDatum\t\t= "{datum}"\n'
        f'\t\tProjection\t= "{projection}"\n'
        "\t\tCoordinateType\t= EN\n"
        "\tCoordinateSpace End\n"
        "\tRasterInfo Begin\n"
        f"\t\tCellType\t= {ct}\n"
        f"{cell}"
        f"\t\tNrOfLines\t= {h}\n"
        f"\t\tNrOfCellsPerLine\t= {w}\n"
        f"\t\tNrOfBands\t= {bands}\n"
        "\tRasterInfo End\n"
        "DatasetHeader End\n")
    data_path = path[:-4] if path.lower().endswith(".ers") else path + ".dat"
    with open(path, "w") as f:
        f.write(hdr)
    le = a.astype(a.dtype.newbyteorder("<"))
    with open(data_path, "wb") as f:
        f.write(np.ascontiguousarray(le.transpose(0, 2, 1)).tobytes())
    return path
