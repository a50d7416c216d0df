"""HDF5 classic driver, implemented from the public HDF5 File Format
Specification (version 0 superblock) — no libhdf5 / h5py.

Reference semantics: frmts/hdf5 (hdf5dataset.cpp) reads the same wire
format via libhdf5.  The subset here is the classic single-root-group
file with contiguous datasets:

    superblock v0     — '\\x89HDF\\r\\n\\x1a\\n', 8-byte offsets/lengths,
                        root group symbol-table entry (cached B-tree +
                        local-heap addresses in scratch)
    root group        — v1 object header with one Symbol Table message
                        (0x0011: B-tree address + local heap address)
    v1 B-tree 'TREE'  — group node, level 0, leaf children are 'SNOD'
                        symbol-table nodes of 40-byte entries
                        (link-name heap offset, object header address)
    local heap 'HEAP' — null-terminated names, 8-byte aligned
    dataset OHDR v1   — Dataspace (0x0001 v1), Datatype (0x0003 v1,
                        fixed-point class 0 / IEEE float class 1),
                        Data Layout (0x0008 v3 class 1 contiguous:
                        address + byte size)

Scale shape (same as netcdf3/zarr/grib2 here): the header graph is tiny
and parses driver-side; datasets are contiguous extents, so `read_hdf5`
splits a dataset's leading dimension into slabs and each Ray task seeks
straight to its byte range — a terabyte dataset reads as parallel as its
slab count.  Chunked/compressed layouts and nested groups raise with the
feature name (classic scientific archives that need them go through the
Zarr/NetCDF doors).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

MAGIC = b"\x89HDF\r\n\x1a\n"
UNDEF = 0xFFFFFFFFFFFFFFFF

_MSG_DATASPACE = 0x0001
_MSG_DATATYPE = 0x0003
_MSG_FILLVALUE = 0x0005
_MSG_LAYOUT = 0x0008
_MSG_SYMTAB = 0x0011


def _pad8(n: int) -> int:
    return (n + 7) & ~7


# ---------------------------------------------------------------- writer


def _dt_message(dt: np.dtype) -> bytes:
    """Datatype message body (version 1) for fixed-point ints and IEEE
    floats, little-endian."""
    dt = np.dtype(dt)
    size = dt.itemsize
    if dt.kind in ("i", "u"):
        cls = 0
        bits = 0x08 if dt.kind == "i" else 0x00  # bit 3: signed
        props = struct.pack("<HH", 0, size * 8)  # bit offset, precision
    elif dt.kind == "f":
        cls = 1
        # bit field: byte order LE, mantissa normalization 'implied msb'
        # (bits 4-5 = 10b), sign location in byte 1
        bits = 0x20 | ((size * 8 - 1) << 8)
        if size == 8:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        elif size == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        else:
            raise NotImplementedError(f"float{size * 8}")
    else:
        raise NotImplementedError(f"HDF5 datatype for {dt}")
    head = struct.pack("<B", 0x10 | cls) + struct.pack("<I", bits)[:3]
    return head + struct.pack("<I", size) + props


def _parse_dt(body: bytes) -> np.dtype:
    ver_cls = body[0]
    if (ver_cls >> 4) not in (1, 2):
        raise NotImplementedError(f"datatype message version {ver_cls >> 4}")
    cls = ver_cls & 0x0F
    bits = int.from_bytes(body[1:4], "little")
    size = struct.unpack_from("<I", body, 4)[0]
    order = ">" if (bits & 1) else "<"
    if cls == 0:
        kind = "i" if (bits & 0x08) else "u"
        return np.dtype(f"{order}{kind}{size}")
    if cls == 1:
        return np.dtype(f"{order}f{size}")
    raise NotImplementedError(f"HDF5 datatype class {cls}")


def _message(mtype: int, body: bytes) -> bytes:
    body_p = body + b"\x00" * (_pad8(len(body)) - len(body))
    return struct.pack("<HHB3x", mtype, len(body_p), 0) + body_p


def _object_header(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(blob)) + blob


def write_hdf5(path: str, datasets: dict[str, np.ndarray]) -> None:
    """{name: ndarray} -> one classic HDF5 file (atomic tmp+rename):
    v0 superblock, root group, one leaf B-tree/SNOD level (≤8 links —
    a loud gate, not silent truncation), contiguous dataset storage."""
    if not datasets:
        raise ValueError("write_hdf5 needs at least one dataset")
    names = sorted(datasets)
    if len(names) > 8:
        raise NotImplementedError(
            f"{len(names)} datasets > 8 (single SNOD leaf; shard the file)")

    # local heap data: offset 0 is the reserved empty string
    heap_data = bytearray(b"\x00" * 8)
    name_off = {}
    for n in names:
        name_off[n] = len(heap_data)
        b = n.encode() + b"\x00"
        heap_data += b + b"\x00" * (_pad8(len(b)) - len(b))

    # ---- layout pass: assign addresses ---------------------------------
    superblock_size = 24 + 8 * 4 + 40  # through the root symtab entry
    cursor = superblock_size

    def alloc(nbytes: int) -> int:
        nonlocal cursor
        addr = cursor
        cursor += nbytes
        return addr

    root_oh = _object_header(
        [_message(_MSG_SYMTAB, struct.pack("<QQ", 0, 0))])  # patched below
    root_oh_addr = alloc(len(root_oh))
    btree_size = 24 + 8 * 3  # 1 child: key0, child0, key1
    btree_addr = alloc(btree_size)
    snod_size = 8 + 8 * 40  # leaf k=4 → 2k entries
    snod_addr = alloc(snod_size)
    heap_hdr_size = 32
    heap_hdr_addr = alloc(heap_hdr_size)
    heap_data_addr = alloc(len(heap_data))

    ds_headers: dict[str, bytes] = {}
    ds_oh_addr: dict[str, int] = {}
    ds_data_addr: dict[str, int] = {}
    for n in names:
        arr = np.ascontiguousarray(datasets[n])
        space = struct.pack("<BBB5x", 1, arr.ndim, 0) + b"".join(
            struct.pack("<Q", d) for d in arr.shape)
        placeholder_layout = struct.pack("<BBQQ", 3, 1, 0, arr.nbytes)
        oh = _object_header([
            _message(_MSG_DATASPACE, space),
            _message(_MSG_DATATYPE, _dt_message(arr.dtype)),
            _message(_MSG_LAYOUT, placeholder_layout),
        ])
        ds_headers[n] = oh
        ds_oh_addr[n] = alloc(len(oh))
    for n in names:
        arr = np.ascontiguousarray(datasets[n])
        ds_data_addr[n] = alloc(arr.nbytes)
    eof = cursor

    # ---- emit -----------------------------------------------------------
    out = bytearray()
    out += MAGIC
    out += struct.pack("<BBBxB", 0, 0, 0, 0)        # versions
    out += struct.pack("<BBxHHI", 8, 8, 4, 16, 0)   # sizes, group k, flags
    out += struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
    # root symbol table entry: cache type 1 → scratch = btree + heap addrs
    out += struct.pack("<QQI4xQQ", 0, root_oh_addr, 1, btree_addr, heap_hdr_addr)
    assert len(out) == superblock_size

    out += _object_header(
        [_message(_MSG_SYMTAB, struct.pack("<QQ", btree_addr, heap_hdr_addr))])

    btree = struct.pack("<4sBBHQQ", b"TREE", 0, 0, 1, UNDEF, UNDEF)
    btree += struct.pack("<QQQ", 0, snod_addr, name_off[names[-1]])
    out += btree
    assert len(btree) == btree_size

    snod = struct.pack("<4sBxH", b"SNOD", 1, len(names))
    for n in names:
        snod += struct.pack("<QQI4x16x", name_off[n], ds_oh_addr[n], 0)
    snod += b"\x00" * (snod_size - len(snod))
    out += snod

    out += struct.pack("<4sB3xQQQ", b"HEAP", 0, len(heap_data), UNDEF,
                       heap_data_addr)
    out += heap_data

    for n in names:
        arr = np.ascontiguousarray(datasets[n])
        oh = _object_header([
            _message(_MSG_DATASPACE,
                     struct.pack("<BBB5x", 1, arr.ndim, 0) + b"".join(
                         struct.pack("<Q", d) for d in arr.shape)),
            _message(_MSG_DATATYPE, _dt_message(arr.dtype)),
            _message(_MSG_LAYOUT,
                     struct.pack("<BBQQ", 3, 1, ds_data_addr[n], arr.nbytes)),
        ])
        assert len(oh) == len(ds_headers[n])
        out += oh
    for n in names:
        out += np.ascontiguousarray(datasets[n]).tobytes()
    assert len(out) == eof

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out)
    os.replace(tmp, path)


# ---------------------------------------------------------------- reader


def _read_object_header(buf: bytes, addr: int) -> list[tuple[int, bytes]]:
    ver, nmsg, _refs, hsize = struct.unpack_from("<BxHII", buf, addr)
    if ver != 1:
        raise NotImplementedError(f"object header version {ver}")
    msgs = []
    off = addr + 16
    end = off + hsize
    for _ in range(nmsg):
        if off >= end:
            break
        mtype, msize, _flags = struct.unpack_from("<HHB", buf, off)
        msgs.append((mtype, buf[off + 8:off + 8 + msize]))
        off += 8 + msize
    return msgs


def _heap_string(buf: bytes, heap_data_addr: int, offset: int) -> str:
    end = buf.index(b"\x00", heap_data_addr + offset)
    return buf[heap_data_addr + offset:end].decode()


def read_hdf5_meta(path: str) -> dict:
    """Driver-side header-graph parse -> {format, datasets: {name:
    {shape, dtype, data_addr, nbytes}}}.  Reads headers only, never data
    (the data extents are range-read per slab cluster-side)."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        buf = f.read(min(size, 1 << 20))  # header graph lives up front
    if buf[:8] != MAGIC:
        raise ValueError("not an HDF5 file")
    sb_ver = buf[8]
    if sb_ver != 0:
        raise NotImplementedError(f"superblock version {sb_ver}")
    off_size, len_size = buf[13], buf[14]
    if (off_size, len_size) != (8, 8):
        raise NotImplementedError("non-8-byte offsets/lengths")
    # root symbol table entry at fixed offset 24+32 for v0/8-byte files
    root_entry = 24 + 32
    _lnk, _root_oh, cache = struct.unpack_from("<QQI", buf, root_entry)
    if cache != 1:
        raise NotImplementedError("root group without cached symtab scratch")
    btree_addr, heap_addr = struct.unpack_from("<QQ", buf, root_entry + 24)

    sig, hver, heap_len, _free, heap_data_addr = struct.unpack_from(
        "<4sB3xQQQ", buf, heap_addr)
    if sig != b"HEAP":
        raise ValueError("bad local heap signature")

    sig, ntype, level, nused = struct.unpack_from("<4sBBH", buf, btree_addr)
    if sig != b"TREE" or ntype != 0:
        raise ValueError("bad group B-tree node")
    if level != 0:
        raise NotImplementedError("multi-level group B-trees")
    datasets: dict[str, dict] = {}
    child_base = btree_addr + 24
    for ci in range(nused):
        snod_addr = struct.unpack_from("<Q", buf, child_base + 8 + ci * 16)[0]
        sig, _sver, nsym = struct.unpack_from("<4sBxH", buf, snod_addr)
        if sig != b"SNOD":
            raise ValueError("bad symbol table node")
        for si in range(nsym):
            e = snod_addr + 8 + si * 40
            name_ofs, oh_addr = struct.unpack_from("<QQ", buf, e)
            name = _heap_string(buf, heap_data_addr, name_ofs)
            shape = dtype = layout = None
            for mtype, body in _read_object_header(buf, oh_addr):
                if mtype == _MSG_DATASPACE:
                    ver, ndim, flags = struct.unpack_from("<BBB", body, 0)
                    if ver != 1:
                        raise NotImplementedError(f"dataspace version {ver}")
                    shape = tuple(
                        struct.unpack_from("<Q", body, 8 + 8 * i)[0]
                        for i in range(ndim))
                elif mtype == _MSG_DATATYPE:
                    dtype = _parse_dt(body)
                elif mtype == _MSG_LAYOUT:
                    ver, cls = body[0], body[1]
                    if ver != 3:
                        raise NotImplementedError(f"data layout version {ver}")
                    if cls != 1:
                        raise NotImplementedError(
                            "chunked/compact HDF5 layouts (contiguous only)")
                    layout = struct.unpack_from("<QQ", body, 2)
            if shape is None or dtype is None or layout is None:
                raise ValueError(f"dataset {name!r} missing required messages")
            datasets[name] = {"shape": shape, "dtype": dtype.str,
                              "data_addr": layout[0], "nbytes": layout[1]}
    return {"format": "HDF5", "superblock_version": 0, "datasets": datasets}


def read_hdf5_var(path: str, name: str) -> np.ndarray:
    """Driver-side full read of one dataset (small data / tests)."""
    m = read_hdf5_meta(path)
    d = m["datasets"][name]
    with open(path, "rb") as f:
        f.seek(d["data_addr"])
        raw = f.read(d["nbytes"])
    return np.frombuffer(raw, dtype=np.dtype(d["dtype"])).reshape(d["shape"])


def read_hdf5(path: str, var: str | None = None, *, rows_per_block: int = 4096):
    """-> ray.data.Dataset of slab rows (name, row0, n_rows, data:binary).
    Contiguous layout ⇒ each slab is one seek+read of its exact byte
    range; slabs over all (or one) dataset fan out as Ray tasks."""
    import ray.data as rd

    m = read_hdf5_meta(path)
    names = [var] if var is not None else sorted(m["datasets"])
    items = []
    for n in names:
        d = m["datasets"][n]
        lead = d["shape"][0] if d["shape"] else 1
        for s in range(0, max(lead, 1), rows_per_block):
            items.append({"name": n, "lo": s, "hi": min(s + rows_per_block, lead)})

    def load(b: pa.Table) -> pa.Table:
        rows = {"name": [], "row0": [], "n_rows": [], "data": []}
        with open(path, "rb") as f:
            for it in b.to_pylist():
                d = m["datasets"][it["name"]]
                shape = d["shape"]
                row_bytes = (int(np.prod(shape[1:])) if len(shape) > 1 else 1) \
                    * np.dtype(d["dtype"]).itemsize
                f.seek(d["data_addr"] + it["lo"] * row_bytes)
                raw = f.read((it["hi"] - it["lo"]) * row_bytes)
                rows["name"].append(it["name"])
                rows["row0"].append(it["lo"])
                rows["n_rows"].append(it["hi"] - it["lo"])
                rows["data"].append(raw)
        return pa.table({
            "name": pa.array(rows["name"], pa.string()),
            "row0": pa.array(rows["row0"], pa.int64()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    return rd.from_items(items).map_batches(load, batch_format="pyarrow")
