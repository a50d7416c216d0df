"""PDS3 planetary image driver (NASA Planetary Data System v3) — the
label format every pre-PDS4 mission archive uses (reference:
frmts/pds/pdsdataset.cpp).

Format (public PDS3 Standards Reference): an ASCII label of
`KEYWORD = VALUE` lines (record-oriented when RECORD_TYPE = FIXED_LENGTH,
ending with `END`), pointing at an IMAGE object via `^IMAGE = n`
(1-based record number; or `^IMAGE = "file.img"` detached, optionally
`("file", n)`).  The IMAGE object gives LINES / LINE_SAMPLES /
SAMPLE_BITS / SAMPLE_TYPE (MSB_INTEGER, LSB_INTEGER, MSB_UNSIGNED_INTEGER,
LSB_UNSIGNED_INTEGER, IEEE_REAL, PC_REAL, UNSIGNED_INTEGER defaults MSB)
and optional BANDS with BAND_STORAGE_TYPE = BAND_SEQUENTIAL.

Scale shape: the label is tiny and parses driver-side; the raster body
range-reads by line band (one Ray task per slab) exactly like the other
raw drivers (rawgrid/dted).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa

_DTYPES = {
    ("MSB_INTEGER", 8): ">i1", ("MSB_INTEGER", 16): ">i2",
    ("MSB_INTEGER", 32): ">i4",
    ("LSB_INTEGER", 8): "<i1", ("LSB_INTEGER", 16): "<i2",
    ("LSB_INTEGER", 32): "<i4",
    ("MSB_UNSIGNED_INTEGER", 8): ">u1", ("MSB_UNSIGNED_INTEGER", 16): ">u2",
    ("MSB_UNSIGNED_INTEGER", 32): ">u4",
    ("LSB_UNSIGNED_INTEGER", 8): "<u1", ("LSB_UNSIGNED_INTEGER", 16): "<u2",
    ("LSB_UNSIGNED_INTEGER", 32): "<u4",
    ("UNSIGNED_INTEGER", 8): ">u1", ("UNSIGNED_INTEGER", 16): ">u2",
    ("IEEE_REAL", 32): ">f4", ("IEEE_REAL", 64): ">f8",
    ("PC_REAL", 32): "<f4", ("PC_REAL", 64): "<f8",
}


def _parse_label(text: str) -> dict:
    """KEYWORD = VALUE lines into nested dicts per OBJECT blocks."""
    root: dict = {}
    stack = [root]
    for line in text.splitlines():
        line = line.split("/*")[0].strip()
        if not line or line == "END":
            continue
        m = re.match(r"([\^\w:]+)\s*=\s*(.+)$", line)
        if not m:
            continue
        key, val = m.group(1), m.group(2).strip()
        if key == "OBJECT":
            node: dict = {}
            stack[-1].setdefault(val, node)
            stack.append(node)
            continue
        if key == "END_OBJECT":
            if len(stack) > 1:
                stack.pop()
            continue
        if val.startswith('"') and val.endswith('"'):
            val = val[1:-1]
        else:
            try:
                val = int(val)
            except ValueError:
                try:
                    val = float(val)
                except ValueError:
                    pass
        stack[-1][key] = val
    return root


def read_pds3_meta(path: str) -> dict:
    with open(path, "rb") as f:
        head = f.read(1 << 20)
    end = head.find(b"\nEND")
    text = head[: end + 4 if end >= 0 else len(head)].decode(
        "latin-1", "replace")
    lab = _parse_label(text)
    if "PDS_VERSION_ID" not in lab and "RECORD_TYPE" not in lab:
        raise ValueError("not a PDS3 label")
    img = lab.get("IMAGE")
    if img is None:
        raise NotImplementedError("PDS3 label without an IMAGE object")
    ptr = lab.get("^IMAGE", 1)
    datafile = path
    if isinstance(ptr, str):
        m = re.match(r'\(?"?([^",]+)"?\s*,?\s*(\d+)?\)?', ptr)
        datafile = os.path.join(os.path.dirname(path), m.group(1))
        ptr = int(m.group(2)) if m.group(2) else 1
    rec_bytes = int(lab.get("RECORD_BYTES", 0))
    offset = (int(ptr) - 1) * rec_bytes if rec_bytes else 0
    stype = str(img.get("SAMPLE_TYPE", "MSB_UNSIGNED_INTEGER"))
    bits = int(img.get("SAMPLE_BITS", 8))
    dt = _DTYPES.get((stype, bits))
    if dt is None:
        raise NotImplementedError(f"PDS3 SAMPLE_TYPE {stype}/{bits}")
    bands = int(img.get("BANDS", 1))
    if bands > 1 and str(img.get("BAND_STORAGE_TYPE",
                                 "BAND_SEQUENTIAL")) != "BAND_SEQUENTIAL":
        raise NotImplementedError("PDS3 BAND_STORAGE_TYPE other than "
                                  "BAND_SEQUENTIAL")
    return {
        "format": "PDS3",
        "file": datafile,
        "offset": offset,
        "lines": int(img["LINES"]),
        "samples": int(img["LINE_SAMPLES"]),
        "bands": bands,
        "dtype": dt,
        "label": lab,
    }


def read_pds3_array(path: str) -> np.ndarray:
    """Driver-side full read (tests / small files): (lines, samples) or
    (bands, lines, samples)."""
    m = read_pds3_meta(path)
    dt = np.dtype(m["dtype"])
    n = m["bands"] * m["lines"] * m["samples"]
    with open(m["file"], "rb") as f:
        f.seek(m["offset"])
        raw = f.read(n * dt.itemsize)
    arr = np.frombuffer(raw, dtype=dt)
    if m["bands"] > 1:
        return arr.reshape(m["bands"], m["lines"], m["samples"])
    return arr.reshape(m["lines"], m["samples"])


def read_pds3(path: str, *, rows_per_block: int = 512):
    """-> ray.data.Dataset of slab rows (band, row0, n_rows, data) — one
    seek+read per task, the raw-driver idiom."""
    import ray.data as rd

    m = read_pds3_meta(path)
    dt = np.dtype(m["dtype"])
    row_bytes = m["samples"] * dt.itemsize
    items = []
    for b in range(m["bands"]):
        for r0 in range(0, m["lines"], rows_per_block):
            items.append({"band": b, "row0": r0,
                          "n_rows": min(rows_per_block, m["lines"] - r0)})

    def load(batch: pa.Table) -> pa.Table:
        rows = {"band": [], "row0": [], "n_rows": [], "data": []}
        with open(m["file"], "rb") as f:
            for it in batch.to_pylist():
                off = m["offset"] + (it["band"] * m["lines"]
                                     + it["row0"]) * row_bytes
                f.seek(off)
                rows["band"].append(it["band"])
                rows["row0"].append(it["row0"])
                rows["n_rows"].append(it["n_rows"])
                rows["data"].append(f.read(it["n_rows"] * row_bytes))
        return pa.table({
            "band": pa.array(rows["band"], pa.int32()),
            "row0": pa.array(rows["row0"], pa.int64()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    return rd.from_items(items).map_batches(load, batch_format="pyarrow")


def write_pds3(path: str, arr: np.ndarray, *,
               sample_type: str | None = None,
               target_name: str = "SYNTHETIC") -> None:
    """Attached-label PDS3 writer (tests / fixtures): fixed-length
    records of one image line; label padded to whole records."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[None]
    bands, lines, samples = arr.shape
    dt = arr.dtype
    if sample_type is None:
        kind = {"i": "INTEGER", "u": "UNSIGNED_INTEGER", "f": "REAL"}[dt.kind]
        if dt.kind == "f":
            sample_type = "IEEE_REAL" if dt.byteorder != "<" else "PC_REAL"
        else:
            sample_type = ("MSB_" if dt.byteorder in (">", "=", "|")
                           else "LSB_") + kind
    be = dt.newbyteorder(">") if sample_type.startswith(
        ("MSB", "IEEE", "UNSIGNED")) else dt.newbyteorder("<")
    data = arr.astype(be).tobytes()
    rec_bytes = samples * dt.itemsize
    label_lines = [
        "PDS_VERSION_ID = PDS3",
        "RECORD_TYPE = FIXED_LENGTH",
        f"RECORD_BYTES = {rec_bytes}",
        f"TARGET_NAME = \"{target_name}\"",
        "^IMAGE = {ptr}",
        "OBJECT = IMAGE",
        f"  LINES = {lines}",
        f"  LINE_SAMPLES = {samples}",
        f"  SAMPLE_BITS = {dt.itemsize * 8}",
        f"  SAMPLE_TYPE = {sample_type}",
        f"  BANDS = {bands}",
        "  BAND_STORAGE_TYPE = BAND_SEQUENTIAL",
        "END_OBJECT = IMAGE",
        "END",
    ]
    # label size depends on ptr which depends on label size: fix-point
    ptr = 2
    while True:
        text = "\r\n".join(label_lines).format(ptr=ptr) + "\r\n"
        label_recs = -(-len(text) // rec_bytes)
        if label_recs + 1 == ptr or ptr > 64:
            break
        ptr = label_recs + 1
    blob = text.encode().ljust(label_recs * rec_bytes, b" ") + data
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
