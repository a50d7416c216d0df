"""More small text/label grid drivers: ISG geoid models, GRASS ASCII
grids, USGS CTG (LULC composite theme grid) and NLAPS NDF.

Wire facts (frmts/isg via aaigridataset.cpp ISG path, frmts/grassasciigrid,
frmts/ctg/ctgdataset.cpp, frmts/raw/ndfdataset.cpp):
- ISG: free text, then ``begin_of_head``..``end_of_head`` with
  ``lat/lon min/max``, ``delta lat/lon``, ``nrows/ncols``, ``nodata``;
  whitespace float rows north to south (Float32 band).
- GRASS ASCII: ``north:/south:/east:/west:/rows:/cols:`` header then
  whitespace values.
- CTG: 5 x 80-char header records (rows@0:10, cols@20:30, cell@35:40,
  zone@50:55 of record 1; NW easting/northing @40/@50 of record 4;
  title record 5), then 80-char cell records: zone, cell-center
  easting/northing (re-anchored by half a cell), six int values at
  20+10*i (>= 2e9 -> 0) — six Int32 bands scattered by cell position.
- NDF: ``KEY=VALUE;`` ASCII header (.H* file) + per-band raw files
  (BANDn_FILENAME), BSQ, PIXELS_PER_LINE x LINES_PER_DATA_FILE,
  BYTE pixels.
"""

from __future__ import annotations

import os
import re

import numpy as np


# -------------------------------------------------------------------- ISG

def isg_meta(path: str) -> dict:
    with open(path, "r", errors="replace") as f:
        text = f.read()
    m = re.search(r"begin_of_head.*?\n(.*?)end_of_head[^\n]*\n", text,
                  re.S)
    if not m:
        raise ValueError("not an ISG file (no begin_of_head)")
    head = m.group(1)
    kv = {}
    for ln in head.split("\n"):
        mm = re.match(r"\s*([\w ]+?)\s*[:=]\s*(.*)$", ln)
        if mm:
            kv[mm.group(1).strip().lower()] = mm.group(2).strip()

    def num(k):
        return float(kv[k].split()[0])

    nrows = int(num("nrows"))
    ncols = int(num("ncols"))
    dlat = num("delta lat")
    dlon = num("delta lon")
    return {
        "driver": "ISG", "width": ncols, "height": nrows, "bands": 1,
        "dtype": "float32",
        "nodata": num("nodata") if "nodata" in kv else None,
        "model_name": kv.get("model name"),
        "units": kv.get("units"),
        "geotransform": (num("lon min"), dlon, 0.0,
                         num("lat max"), 0.0, -dlat),
        "_data_start": m.end(),
    }


def read_isg_array(path: str) -> np.ndarray:
    m = isg_meta(path)
    with open(path, "r", errors="replace") as f:
        text = f.read()
    vals = np.array(text[m["_data_start"]:].split(), dtype=np.float64)
    n = m["width"] * m["height"]
    return vals[:n].reshape(m["height"], m["width"]).astype(np.float32)


# ------------------------------------------------------------ GRASS ASCII

def grass_meta(path: str) -> dict:
    with open(path, "r", errors="replace") as f:
        text = f.read(65536)
    kv = {}
    data_start = 0
    for mm in re.finditer(r"^(north|south|east|west|rows|cols)\s*:\s*"
                          r"([-\d.eE+]+)\s*$", text, re.M):
        kv[mm.group(1)] = float(mm.group(2))
        data_start = mm.end()
    if "rows" not in kv or "cols" not in kv:
        raise ValueError("not a GRASS ASCII grid")
    w, h = int(kv["cols"]), int(kv["rows"])
    return {
        "driver": "GRASSASCIIGrid", "width": w, "height": h, "bands": 1,
        "dtype": "float64",
        "geotransform": (kv["west"], (kv["east"] - kv["west"]) / w, 0.0,
                         kv["north"], 0.0,
                         -(kv["north"] - kv["south"]) / h),
        "_data_start": data_start,
    }


def read_grass_array(path: str) -> np.ndarray:
    m = grass_meta(path)
    with open(path, "r", errors="replace") as f:
        text = f.read()
    vals = np.array(text[m["_data_start"]:].split(), dtype=np.float64)
    n = m["width"] * m["height"]
    return vals[:n].reshape(m["height"], m["width"])


# -------------------------------------------------------------------- CTG

def ctg_meta(path: str) -> dict:
    with open(path, "rb") as f:
        hdr = f.read(5 * 80).decode("latin-1", "replace")
    if len(hdr) < 400:
        raise ValueError("CTG: short header")

    def fld(rec, off, width):
        s = hdr[rec * 80 + off:rec * 80 + off + width].strip()
        return int(s) if s else 0

    nrows = fld(0, 0, 10)
    ncols = fld(0, 20, 10)
    cell = fld(0, 35, 5)
    zone = fld(0, 50, 5)
    if nrows <= 0 or ncols <= 0 or not (0 < cell < 10000) or \
            not (0 < zone <= 60):
        raise ValueError("not a CTG grid cell file")
    nwe = fld(3, 40, 10)
    nwn = fld(3, 50, 10)
    return {
        "driver": "CTG", "width": ncols, "height": nrows, "bands": 6,
        "dtype": "int32", "cell_size": cell, "utm_zone": zone,
        "epsg": 32600 + zone,
        "title": hdr[4 * 80:5 * 80].strip(),
        "geotransform": (float(nwe), float(cell), 0.0,
                         float(nwn), 0.0, -float(cell)),
        "_nw": (nwe, nwn),
    }


def read_ctg_array(path: str) -> np.ndarray:
    m = ctg_meta(path)
    w, h, cell = m["width"], m["height"], m["cell_size"]
    nwe, nwn = m["_nw"]
    out = np.zeros((h, w, 6), np.int32)
    with open(path, "rb") as f:
        f.seek(5 * 80)
        while True:
            rec = f.read(80)
            if len(rec) < 80:
                break
            line = rec.decode("latin-1", "replace")
            x = int(line[3:11]) - cell // 2
            y = int(line[11:19]) + cell // 2
            cx = (x - nwe) // cell
            cy = (nwn - y) // cell
            if not (0 <= cx < w and 0 <= cy < h):
                continue
            for i in range(6):
                s = line[20 + 10 * i:30 + 10 * i].strip()
                v = int(s) if s else 0
                if v >= 2000000000:
                    v = 0
                out[cy, cx, i] = v
    return out


# -------------------------------------------------------------------- NDF

def ndf_meta(path: str) -> dict:
    with open(path, "r", errors="replace") as f:
        text = f.read(65536)
    kv = {}
    for mm in re.finditer(r"([A-Z0-9_/]+)=([^;]*);", text):
        kv[mm.group(1)] = mm.group(2).strip()
    if "PIXELS_PER_LINE" not in kv:
        raise ValueError("not an NLAPS NDF header")
    w = int(kv["PIXELS_PER_LINE"])
    h = int(kv["LINES_PER_DATA_FILE"])
    nb = int(kv.get("NUMBER_OF_BANDS_IN_VOLUME", 1))
    fmt = kv.get("PIXEL_FORMAT", "BYTE")
    if fmt != "BYTE":
        raise NotImplementedError(f"NDF pixel format {fmt}")
    bands = []
    for i in range(1, nb + 1):
        fn = kv.get(f"BAND{i}_FILENAME")
        if fn:
            bands.append(os.path.join(os.path.dirname(path), fn))
    return {
        "driver": "NDF", "width": w, "height": h, "bands": len(bands),
        "dtype": "uint8", "band_files": bands,
        "band_names": [kv.get(f"BAND{i}_NAME") for i in
                       range(1, nb + 1)],
        "dataset_type": kv.get("DATA_SET_TYPE"),
    }


def read_ndf_array(path: str) -> np.ndarray:
    """Zero-pads truncated band files (test fixtures carry one line)."""
    m = ndf_meta(path)
    w, h = m["width"], m["height"]
    planes = []
    for bf in m["band_files"]:
        with open(bf, "rb") as f:
            raw = f.read(w * h)
        if len(raw) < w * h:
            raw = raw + b"\x00" * (w * h - len(raw))
        planes.append(np.frombuffer(raw, np.uint8).reshape(h, w))
    return planes[0] if len(planes) == 1 else np.stack(planes, axis=-1)
