"""NetCDF-3 classic driver (CDF-1/CDF-2), implemented from the public
NetCDF classic format specification — no libnetcdf.

Reference semantics: frmts/netcdf (netcdfdataset.cpp) reads the same
on-disk layout via libnetcdf; the classic format is fully described by
the spec:

    header  = magic('CDF' 0x01|0x02) numrecs dim_list gatt_list var_list
    dim     = name length             (length 0 ⇒ the record dimension)
    attr    = name nc_type n values   (values padded to 4-byte boundary)
    var     = name ndims dimids vatt_list nc_type vsize begin
    data    = non-record vars contiguous at `begin`;
              record vars interleaved per record (stride = recsize)

All values are BIG-endian; names are 4-byte padded UTF-8; CDF-2 differs
only in 64-bit `begin` offsets.  Types: NC_BYTE/CHAR/SHORT/INT/FLOAT/
DOUBLE.

Scale shape: the header is tiny and parses driver-side; `read_netcdf`
splits a variable's leading dimension into slabs and each Ray task
seeks directly to its byte range (contiguous for fixed vars, strided
per record for record vars) — a terabyte variable reads as parallel as
its slab count.  Writing is driver-side (single self-describing file
with a global header — the format itself is single-writer)."""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
_NP = {NC_BYTE: np.dtype(">i1"), NC_CHAR: np.dtype("S1"),
       NC_SHORT: np.dtype(">i2"), NC_INT: np.dtype(">i4"),
       NC_FLOAT: np.dtype(">f4"), NC_DOUBLE: np.dtype(">f8")}
_NC = {np.dtype(np.int8): NC_BYTE, np.dtype(np.int16): NC_SHORT,
       np.dtype(np.int32): NC_INT, np.dtype(np.float32): NC_FLOAT,
       np.dtype(np.float64): NC_DOUBLE}
_TAG_DIM, _TAG_VAR, _TAG_ATT = 0x0A, 0x0B, 0x0C


def _pad4(n: int) -> int:
    return (n + 3) & ~3


# ---------------------------------------------------------------- writer


class _W:
    def __init__(self):
        self.buf = bytearray()

    def u32(self, v):
        self.buf += struct.pack(">I", v)

    def name(self, s: str):
        b = s.encode()
        self.u32(len(b))
        self.buf += b + b"\x00" * (_pad4(len(b)) - len(b))

    def values(self, nc_type: int, arr: np.ndarray):
        raw = np.ascontiguousarray(arr, dtype=_NP[nc_type]).tobytes()
        self.buf += raw + b"\x00" * (_pad4(len(raw)) - len(raw))


def _att_array(v) -> tuple[int, np.ndarray]:
    if isinstance(v, str):
        return NC_CHAR, np.frombuffer(v.encode(), dtype="S1")
    a = np.atleast_1d(np.asarray(v))
    if a.dtype.kind == "f":
        return NC_DOUBLE, a.astype(">f8")
    if a.dtype == np.int16:
        return NC_SHORT, a
    return NC_INT, a.astype(">i4")


def _write_atts(w: _W, atts: dict):
    if not atts:
        w.u32(0)
        w.u32(0)
        return
    w.u32(_TAG_ATT)
    w.u32(len(atts))
    for k, v in atts.items():
        nc, arr = _att_array(v)
        w.name(k)
        w.u32(nc)
        w.u32(len(arr))
        w.values(nc, arr)


def write_netcdf(path: str, *, dims: dict[str, int | None],
                 variables: dict[str, tuple[tuple[str, ...], np.ndarray, dict]],
                 gatts: dict | None = None, version: int = 1) -> None:
    """dims: name -> length (None = record/unlimited dimension).
    variables: name -> (dim names, array, attrs); a record variable's
    array carries the record count in its first axis.  Atomic write."""
    dim_names = list(dims)
    rec_dim = next((d for d, n in dims.items() if n is None), None)
    numrecs = 0
    for name, (vdims, arr, _) in variables.items():
        want = tuple(dims[d] if dims[d] is not None else arr.shape[0]
                     for d in vdims)
        if tuple(arr.shape) != want:
            raise ValueError(f"variable {name}: shape {arr.shape} != dims {want}")
        if vdims and vdims[0] == rec_dim:
            numrecs = max(numrecs, arr.shape[0])

    w = _W()
    w.buf += b"CDF" + bytes([version])
    w.u32(numrecs)
    if dims:
        w.u32(_TAG_DIM)
        w.u32(len(dims))
        for d, n in dims.items():
            w.name(d)
            w.u32(0 if n is None else n)
    else:
        w.u32(0)
        w.u32(0)
    _write_atts(w, gatts or {})

    # variable metadata needs data offsets — lay out in two passes
    metas = []  # (name, vdims, arr, atts, nc_type, vsize, is_rec)
    for name, (vdims, arr, atts) in variables.items():
        arr = np.asarray(arr)
        nc = NC_CHAR if arr.dtype.kind == "S" else _NC[np.dtype(arr.dtype.base)
                                                       .newbyteorder("=")]
        is_rec = bool(vdims) and vdims[0] == rec_dim
        per_rec_shape = arr.shape[1:] if is_rec else arr.shape
        slab = int(np.prod(per_rec_shape, dtype=np.int64)) * _NP[nc].itemsize
        vsize = _pad4(slab)
        metas.append((name, vdims, arr, atts, nc, vsize, is_rec))

    off_size = 4 if version == 1 else 8
    header_len = len(w.buf) + 8  # + var_list tag/count
    for name, vdims, arr, atts, nc, vsize, is_rec in metas:
        header_len += _pad4(len(name.encode())) + 4  # name
        header_len += 4 + 4 * len(vdims)             # ndims + dimids
        aw = _W()
        _write_atts(aw, atts)
        header_len += len(aw.buf)
        header_len += 4 + 4 + off_size               # nc_type + vsize + begin

    begins = {}
    pos = _pad4(header_len)
    for name, vdims, arr, atts, nc, vsize, is_rec in metas:
        if not is_rec:
            begins[name] = pos
            pos += vsize
    rec_start = pos
    rec_metas = [m for m in metas if m[6]]
    if len(rec_metas) == 1:
        # spec special case: a sole record variable packs its records
        # contiguously WITHOUT the 4-byte padding
        name, vdims, arr, atts, nc, vsize, _ = rec_metas[0]
        per_rec_shape = arr.shape[1:]
        recsize = int(np.prod(per_rec_shape, dtype=np.int64)) * _NP[nc].itemsize
    else:
        recsize = sum(v for _, _, _, _, _, v, r in metas if r)
    rpos = rec_start
    for name, vdims, arr, atts, nc, vsize, is_rec in metas:
        if is_rec:
            begins[name] = rpos
            rpos += vsize

    w.u32(_TAG_VAR if metas else 0)
    w.u32(len(metas))
    for name, vdims, arr, atts, nc, vsize, is_rec in metas:
        w.name(name)
        w.u32(len(vdims))
        for d in vdims:
            w.u32(dim_names.index(d))
        _write_atts(w, atts)
        w.u32(nc)
        w.u32(vsize)
        if version == 1:
            w.u32(begins[name])
        else:
            w.buf += struct.pack(">Q", begins[name])
    w.buf += b"\x00" * (_pad4(header_len) - len(w.buf))

    body = bytearray(b"\x00" * ((rec_start - _pad4(header_len))
                                + numrecs * recsize))
    base = _pad4(header_len)
    for name, vdims, arr, atts, nc, vsize, is_rec in metas:
        raw_dt = _NP[nc]
        if is_rec:
            for r in range(arr.shape[0]):
                o = begins[name] - base + r * recsize
                rec = np.ascontiguousarray(arr[r], dtype=raw_dt).tobytes()
                body[o:o + len(rec)] = rec
        else:
            o = begins[name] - base
            raw = np.ascontiguousarray(arr, dtype=raw_dt).tobytes()
            body[o:o + len(raw)] = raw

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(w.buf))
        f.write(bytes(body))
    os.replace(tmp, path)


# ---------------------------------------------------------------- reader


class _R:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u32(self) -> int:
        v = struct.unpack_from(">I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def u64(self) -> int:
        v = struct.unpack_from(">Q", self.buf, self.pos)[0]
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.u32()
        s = self.buf[self.pos:self.pos + n].decode()
        self.pos += _pad4(n)
        return s

    def values(self, nc_type: int, n: int):
        dt = _NP[nc_type]
        raw = self.buf[self.pos:self.pos + n * dt.itemsize]
        self.pos += _pad4(n * dt.itemsize)
        a = np.frombuffer(raw, dtype=dt)
        if nc_type == NC_CHAR:
            return raw.decode(errors="replace")
        return a.copy()


def _read_atts(r: _R) -> dict:
    tag = r.u32()
    n = r.u32()
    if tag == 0 and n == 0:
        return {}
    if tag != _TAG_ATT:
        raise ValueError("bad attribute list tag")
    out = {}
    for _ in range(n):
        k = r.name()
        nc = r.u32()
        cnt = r.u32()
        out[k] = r.values(nc, cnt)
    return out


def read_netcdf_meta(path: str) -> dict:
    """-> {version, numrecs, dims: [(name, len)], gatts, vars:
    {name: {dims, nc_type, vsize, begin, shape, atts, is_rec}}, recsize}."""
    with open(path, "rb") as f:
        head = f.read(4)
        if head[:3] != b"CDF" or head[3] not in (1, 2):
            raise ValueError("not a NetCDF classic (CDF-1/CDF-2) file")
        version = head[3]
        buf = head + f.read(1 << 20)  # headers are tiny; 1 MB is generous
    r = _R(buf)
    r.pos = 4
    numrecs = r.u32()
    tag = r.u32()
    ndims = r.u32()
    dims = []
    if tag == _TAG_DIM:
        for _ in range(ndims):
            nm = r.name()
            dims.append((nm, r.u32()))
    gatts = _read_atts(r)
    tag = r.u32()
    nvars = r.u32()
    variables = {}
    rec_vars = []
    if tag == _TAG_VAR:
        for _ in range(nvars):
            nm = r.name()
            nd = r.u32()
            dimids = [r.u32() for _ in range(nd)]
            atts = _read_atts(r)
            nc = r.u32()
            vsize = r.u32()
            begin = r.u32() if version == 1 else r.u64()
            vdims = [dims[i][0] for i in dimids]
            is_rec = bool(dimids) and dims[dimids[0]][1] == 0
            shape = tuple(numrecs if (j == 0 and is_rec) else dims[i][1]
                          for j, i in enumerate(dimids))
            variables[nm] = {"dims": vdims, "nc_type": nc, "vsize": vsize,
                             "begin": begin, "shape": shape, "atts": atts,
                             "is_rec": is_rec}
            if is_rec:
                rec_vars.append(nm)
    if len(rec_vars) == 1:
        # sole-record-variable special case: records pack unpadded
        v = variables[rec_vars[0]]
        per_row = int(np.prod(v["shape"][1:], dtype=np.int64)) if v["shape"][1:] else 1
        recsize = per_row * _NP[v["nc_type"]].itemsize
    else:
        recsize = sum(variables[v]["vsize"] for v in rec_vars)
    return {"version": version, "numrecs": numrecs, "dims": dims,
            "gatts": gatts, "vars": variables, "recsize": recsize}


def _read_slab(path: str, meta: dict, var: str, lo: int, hi: int) -> np.ndarray:
    """Rows [lo, hi) along the leading dimension of `var`."""
    v = meta["vars"][var]
    dt = _NP[v["nc_type"]]
    inner = v["shape"][1:] if v["shape"] else ()
    per_row = int(np.prod(inner, dtype=np.int64)) if inner else 1
    with open(path, "rb") as f:
        if v["is_rec"]:
            rows = []
            for rec in range(lo, hi):
                f.seek(v["begin"] + rec * meta["recsize"])
                rows.append(np.frombuffer(f.read(per_row * dt.itemsize), dt))
            # np.stack silently normalizes >f8 to native byte order —
            # force the file's big-endian dtype so the `data` bytes
            # contract is identical for record and fixed variables
            a = (np.stack(rows).astype(dt, copy=False) if rows
                 else np.empty((0, per_row), dt))
        else:
            f.seek(v["begin"] + lo * per_row * dt.itemsize)
            a = np.frombuffer(f.read((hi - lo) * per_row * dt.itemsize), dt)
            a = a.reshape(hi - lo, per_row)
    return a.reshape((hi - lo,) + inner)


def read_netcdf_var(path: str, var: str) -> np.ndarray:
    """Driver-side full read of one variable (small data / tests)."""
    meta = read_netcdf_meta(path)
    n = meta["vars"][var]["shape"][0] if meta["vars"][var]["shape"] else 1
    out = _read_slab(path, meta, var, 0, n)
    return out if meta["vars"][var]["shape"] else out.reshape(())


def read_netcdf(path: str, var: str, *, rows_per_block: int = 4096):
    """-> ray.data.Dataset of slab rows (row0:int64, data:binary raw
    big-endian bytes, shape carried in the driver-known metadata).  The
    leading dimension splits into slabs; each Ray task seeks straight to
    its byte range."""
    import ray.data as rd

    meta = read_netcdf_meta(path)
    if var not in meta["vars"]:
        raise KeyError(var)
    n = meta["vars"][var]["shape"][0]
    items = [{"lo": s, "hi": min(s + rows_per_block, n)}
             for s in range(0, max(n, 1), rows_per_block)]

    def load(b: pa.Table) -> pa.Table:
        rows = {"row0": [], "n_rows": [], "data": []}
        for it in b.to_pylist():
            a = _read_slab(path, meta, var, it["lo"], it["hi"])
            rows["row0"].append(it["lo"])
            rows["n_rows"].append(it["hi"] - it["lo"])
            rows["data"].append(np.ascontiguousarray(a).tobytes())
        return pa.table({
            "row0": pa.array(rows["row0"], pa.int64()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    return rd.from_items(items).map_batches(load, batch_format="pyarrow")
