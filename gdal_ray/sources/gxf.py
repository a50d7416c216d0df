"""Geosoft GXF grid driver (frmts/gxf/gxfopen.c — the public GXF Rev 3
grid exchange spec).

Wire facts: ``#KEYWORD`` sections with value lines; the ``#GRID``
section holds rows of values either as whitespace floats (GTYPE 0,
``#DUMMY`` string match) or GTYPE-n base-90 compressed tokens of n
chars each: first char ``!`` = dummy, ``"`` = repeat (next token =
base-90 count, next = value token), else value = base90(token) *
scale + offset from ``#TRANSFORM``.  Tokens never span lines.  Rows
run bottom-up by default (#SENSE 1 / absent); ``#POINTS`` = row
length, ``#ROWS`` = row count.  Geotransform from
#XORIGIN/#YORIGIN/#PTSEPARATION/#RWSEPARATION (+#ROTATION gate).
"""

from __future__ import annotations

import numpy as np

DUMMY_OUT = -1e12  # the reference maps dummies to this "SetDummyTo"


def _sections(text: str) -> dict:
    out: dict = {}
    cur = None
    for ln in text.split("\n"):
        if ln.startswith("#"):
            cur = ln.strip().upper()
            out.setdefault(cur, [])
        elif cur is not None:
            out[cur].append(ln)
    return out


def gxf_meta(path: str) -> dict:
    with open(path, "r", errors="replace") as f:
        text = f.read()
    sec = _sections(text)

    def first(name, default=None, cast=float):
        for key in sec:
            if key.startswith(name):
                for ln in sec[key]:
                    if ln.strip():
                        return cast(ln.split()[0])
        return default

    w = int(first("#POIN", 0))
    h = int(first("#ROWS", 0))
    if not w or not h:
        raise ValueError("not a GXF grid (no #POINTS/#ROWS)")
    gtype = int(first("#GTYPE", 0))
    scale, offset = 1.0, 0.0
    for key in sec:
        if key.startswith("#TRANSFORM"):
            for ln in sec[key]:
                parts = ln.split()
                if len(parts) >= 2:
                    scale, offset = float(parts[0]), float(parts[1])
                    break
    ptsep = first("#PTSEPARATION", 1.0)
    rwsep = first("#RWSEPARATION", 1.0)
    xo = first("#XORIGIN", 0.0)
    yo = first("#YORIGIN", 0.0)
    rot = first("#ROTATION", 0.0)
    sense = int(first("#SENSE", 1))
    dummy = None
    for key in sec:
        if key.startswith("#DUMMY"):
            for ln in sec[key]:
                if ln.strip():
                    dummy = ln.split()[0]
                    break
    gt = None
    if rot == 0.0:
        gt = (xo - 0.5 * ptsep, ptsep, 0.0,
              yo + (h - 0.5) * rwsep, 0.0, -rwsep)
    return {
        "driver": "GXF", "width": w, "height": h, "bands": 1,
        "dtype": "float32", "gtype": gtype, "scale": scale,
        "offset": offset, "sense": sense, "dummy": dummy,
        "geotransform": gt, "nodata": DUMMY_OUT,
        "grid_lines": sec.get("#GRID", []),
    }


def _decode_grid(m: dict) -> np.ndarray:
    w, h = m["width"], m["height"]
    vals = np.full(w * h, DUMMY_OUT)
    n_read = 0
    if m["gtype"] == 0:
        for ln in m["grid_lines"]:
            for tok in ln.split():
                if n_read >= w * h:
                    break
                if m["dummy"] is not None and tok.startswith(m["dummy"]):
                    vals[n_read] = DUMMY_OUT
                else:
                    vals[n_read] = float(tok)
                n_read += 1
    else:
        g = m["gtype"]
        scale, offset = m["scale"], m["offset"]

        def b90(tok):
            v = 0
            for c in tok:
                v = v * 90 + (ord(c) - 37)
            return v

        toks = []
        for ln in m["grid_lines"]:
            s = ln.rstrip("\r\n")
            # tokens never span lines; trailing partial chars would be
            # an encoder bug
            for i in range(0, len(s) - g + 1, g):
                toks.append(s[i:i + g])
        ti = 0
        while ti < len(toks) and n_read < w * h:
            tok = toks[ti]
            ti += 1
            if tok[0] == "!":
                vals[n_read] = DUMMY_OUT
                n_read += 1
            elif tok[0] == '"':
                count = b90(toks[ti])
                ti += 1
                vtok = toks[ti]
                ti += 1
                v = DUMMY_OUT if vtok[0] == "!" else \
                    b90(vtok) * scale + offset
                end = min(n_read + count, w * h)
                vals[n_read:end] = v
                n_read = end
            else:
                vals[n_read] = b90(tok) * scale + offset
                n_read += 1
    grid = vals.reshape(h, w)
    if m["sense"] in (1, -2):  # rows stored bottom-up (default LL_UP)
        grid = grid[::-1]
    return grid.astype(np.float32)


def read_gxf_array(path: str) -> np.ndarray:
    return _decode_grid(gxf_meta(path))


def read_gxf(path: str, *, rows_per_block: int = 1024):
    """-> Dataset of row-slab chunks (row0, n_rows, band, data:binary).
    GXF is a small ASCII interchange grid; the decode runs once in the
    producing task and slabs stream out."""
    import pyarrow as pa
    import ray.data as rd

    m = gxf_meta(path)
    h, w = m["height"], m["width"]
    items = [{"row0": lo, "n_rows": min(rows_per_block, h - lo)}
             for lo in range(0, h, rows_per_block)]

    def load(t: pa.Table) -> pa.Table:
        grid = _decode_grid(gxf_meta(path))
        rows = {"row0": [], "n_rows": [], "band": [], "data": []}
        for it in t.to_pylist():
            lo, n = it["row0"], it["n_rows"]
            rows["row0"].append(lo)
            rows["n_rows"].append(n)
            rows["band"].append(0)
            rows["data"].append(
                np.ascontiguousarray(grid[lo:lo + n]).tobytes())
        return pa.table({
            "row0": pa.array(rows["row0"], pa.int64()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "band": pa.array(rows["band"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    return rd.from_items(items, override_num_blocks=max(1, min(
        len(items), 8))).map_batches(load, batch_format="pyarrow")
