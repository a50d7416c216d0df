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
                        address + byte size — OR class 2 chunked:
                        v1 chunk B-tree address + chunk dims), Filter
                        Pipeline (0x000B v1: deflate id 1 / shuffle id 2)

Chunked datasets (the netCDF-4/h5py storage reality) are supported end
to end: the writer chunks along the leading dimension, optionally
shuffle+deflate filters each chunk, pads edge chunks to full size (the
libhdf5 default for filtered data) and indexes them with a node-type-1
v1 B-tree; the reader walks the chunk B-tree (any level) and range-reads
+ defilters each chunk independently.

Scale shape (same as netcdf3/zarr/grib2 here): the header graph is tiny
and parses driver-side; contiguous datasets split their leading
dimension into slabs and chunked datasets fan out one task per chunk —
each Ray task seeks straight to its byte range, so a terabyte dataset
reads as parallel as its slab/chunk count.  Nested groups and
non-leading-dim chunk grids raise with the feature name (archives that
need them go through the Zarr/NetCDF doors).
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
_MSG_FILTERS = 0x000B
_MSG_SYMTAB = 0x0011
_MSG_ATTRIBUTE = 0x000C
_MSG_SYMTAB = 0x0011


def _pad8(n: int) -> int:
    return (n + 7) & ~7


# ---------------------------------------------------------------- writer


def _dt_message(dt: np.dtype) -> bytes:
    """Datatype message body (version 1) for fixed-point ints and IEEE
    floats, little-endian."""
    dt = np.dtype(dt)
    size = dt.itemsize
    if dt.kind == "S":
        # class 3 fixed string: null-terminated padding, ASCII charset
        head = struct.pack("<B", 0x13) + b"\x00\x00\x00"
        return head + struct.pack("<I", size)
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
    if cls == 3:  # fixed string
        return np.dtype(f"S{size}")
    raise NotImplementedError(f"HDF5 datatype class {cls}")


def _attr_message(name: str, value) -> bytes:
    """Attribute message body (v1, spec IV.A.2.m): name + datatype +
    dataspace (each 8-byte padded) + raw data.  Values: str (fixed ASCII
    string scalar), int/float scalars, 1-D numeric arrays."""
    if isinstance(value, str):
        data = value.encode() + b"\x00"
        arr = np.frombuffer(data, dtype=f"S{len(data)}")
        dims: tuple = ()
    else:
        arr = np.atleast_1d(np.asarray(value))
        if arr.ndim != 1:
            raise NotImplementedError("attribute rank > 1")
        dims = () if np.isscalar(value) or np.asarray(value).ndim == 0 \
            else (len(arr),)
        data = np.ascontiguousarray(arr).tobytes()
    dt = _dt_message(arr.dtype)
    ds = struct.pack("<BBB5x", 1, len(dims), 0) + b"".join(
        struct.pack("<Q", d) for d in dims)
    nm = name.encode() + b"\x00"
    body = struct.pack("<BxHHH", 1, len(nm), len(dt), len(ds))
    for part in (nm, dt, ds):
        body += part + b"\x00" * (_pad8(len(part)) - len(part))
    return body + data


def _parse_attr(body: bytes):
    """-> (name, value) — strings decode, numerics -> scalar / ndarray,
    unsupported classes (vlen, reference — netCDF-4's DIMENSION_LIST /
    REFERENCE_LIST) -> (name, None)."""
    if body[0] != 1:
        return None, None
    nsz, dtsz, dssz = struct.unpack_from("<HHH", body, 2)
    off = 8
    name = body[off:off + nsz].split(b"\x00")[0].decode("latin-1")
    off += _pad8(nsz)
    dtbody = body[off:off + dtsz]
    off += _pad8(dtsz)
    dsbody = body[off:off + dssz]
    off += _pad8(dssz)
    data = body[off:]
    if dsbody[0] != 1:
        return name, None
    ndim = dsbody[1]
    dims = [struct.unpack_from("<Q", dsbody, 8 + 8 * i)[0]
            for i in range(ndim)]
    try:
        dt = _parse_dt(dtbody)
    except NotImplementedError:
        return name, None
    count = int(np.prod(dims)) if dims else 1
    vals = np.frombuffer(data[:count * dt.itemsize], dtype=dt)
    if dt.kind == "S":
        s = vals[0].split(b"\x00")[0].decode("latin-1") if len(vals) else ""
        return name, s
    if not dims:
        return name, vals[0].item()
    return name, vals


def _message(mtype: int, body: bytes) -> bytes:
    body_p = body + b"\x00" * (_pad8(len(body)) - len(body))
    return struct.pack("<HHB3x", mtype, len(body_p), 0) + body_p


def _object_header(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(blob)) + blob


def _filter_pipeline_message(deflate: int | None, shuffle_elsize: int | None
                             ) -> bytes:
    """Filter Pipeline message v1 (spec IV.A.2.l): shuffle (id 2) then
    deflate (id 1), matching write-side application order."""
    filters = []
    if shuffle_elsize is not None:
        filters.append((2, [shuffle_elsize]))
    if deflate is not None:
        filters.append((1, [deflate]))
    body = struct.pack("<BB6x", 1, len(filters))
    for fid, vals in filters:
        body += struct.pack("<HHHH", fid, 0, 0, len(vals))
        body += b"".join(struct.pack("<I", v) for v in vals)
        if len(vals) % 2:
            body += b"\x00" * 4
    return body


def _chunk_payloads(arr: np.ndarray, chunk_rows: int,
                    deflate: int | None, shuffle: bool) -> list[bytes]:
    """Split along dim 0, pad edge chunks to full chunk shape (libhdf5
    pads filtered edge chunks), apply shuffle then deflate."""
    import zlib

    out = []
    lead = arr.shape[0]
    for lo in range(0, lead, chunk_rows):
        c = arr[lo:lo + chunk_rows]
        if c.shape[0] < chunk_rows:
            pad = np.zeros((chunk_rows - c.shape[0],) + arr.shape[1:],
                           dtype=arr.dtype)
            c = np.concatenate([c, pad], axis=0)
        raw = np.ascontiguousarray(c).tobytes()
        if shuffle:
            el = arr.dtype.itemsize
            raw = np.frombuffer(raw, np.uint8).reshape(-1, el).T.tobytes()
        if deflate is not None:
            raw = zlib.compress(raw, deflate)
        out.append(raw)
    return out


def write_hdf5(path: str, datasets: dict[str, np.ndarray], *,
               chunk_rows: int | None = None, deflate: int | None = None,
               shuffle: bool = False,
               attrs: dict[str, dict] | None = None,
               root_attrs: dict | None = None) -> None:
    """{name: ndarray} -> one classic HDF5 file (atomic tmp+rename):
    v0 superblock, root group, one leaf B-tree/SNOD level (≤8 links —
    a loud gate, not silent truncation).  Default layout is contiguous;
    pass `chunk_rows` for chunked storage along the leading dimension
    (v1 chunk B-tree), optionally with `deflate` (zlib level) and/or
    byte `shuffle` filters per chunk."""
    if not datasets:
        raise ValueError("write_hdf5 needs at least one dataset")
    if (deflate is not None or shuffle) and chunk_rows is None:
        raise ValueError("filters require chunked layout (pass chunk_rows)")
    names = sorted(datasets)
    # symbol-table leaves hold up to 2k = 8 entries (leaf k = 4); wider
    # files get multiple SNOD children under one level-0 group B-tree
    # node (the libhdf5 layout; reader already walks nused children)
    snod_groups = [names[i:i + 8] for i in range(0, len(names), 8)]
    if len(snod_groups) > 256:
        raise NotImplementedError(
            f"{len(names)} datasets need a multi-LEVEL group B-tree")

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

    root_attr_msgs = [_message(_MSG_ATTRIBUTE, _attr_message(k, v))
                      for k, v in sorted((root_attrs or {}).items())]
    root_oh = _object_header(
        [_message(_MSG_SYMTAB, struct.pack("<QQ", 0, 0))]  # patched below
        + root_attr_msgs)
    root_oh_addr = alloc(len(root_oh))
    btree_size = 24 + 8 * (2 * len(snod_groups) + 1)  # keys/children interleaved
    btree_addr = alloc(btree_size)
    snod_size = 8 + 8 * 40  # leaf k=4 → 2k entries
    snod_addrs = [alloc(snod_size) for _ in snod_groups]
    heap_hdr_size = 32
    heap_hdr_addr = alloc(heap_hdr_size)
    heap_data_addr = alloc(len(heap_data))

    _BTREE_GATE = 4096

    def _ds_messages(n: str, btree_or_data_addr: int) -> list[bytes]:
        arr = np.ascontiguousarray(datasets[n])
        msgs = [
            _message(_MSG_DATASPACE,
                     struct.pack("<BBB5x", 1, arr.ndim, 0) + b"".join(
                         struct.pack("<Q", d) for d in arr.shape)),
            _message(_MSG_DATATYPE, _dt_message(arr.dtype)),
        ]
        if chunk_rows is None:
            msgs.append(_message(_MSG_LAYOUT, struct.pack(
                "<BBQQ", 3, 1, btree_or_data_addr, arr.nbytes)))
        else:
            cr = min(chunk_rows, max(arr.shape[0], 1))
            body = struct.pack("<BBB", 3, 2, arr.ndim + 1)
            body += struct.pack("<Q", btree_or_data_addr)
            for d in (cr,) + arr.shape[1:]:
                body += struct.pack("<I", d)
            body += struct.pack("<I", arr.dtype.itemsize)
            msgs.append(_message(_MSG_LAYOUT, body))
            if deflate is not None or shuffle:
                msgs.append(_message(_MSG_FILTERS, _filter_pipeline_message(
                    deflate, arr.dtype.itemsize if shuffle else None)))
        for an, av in sorted(((attrs or {}).get(n) or {}).items()):
            msgs.append(_message(_MSG_ATTRIBUTE, _attr_message(an, av)))
        return msgs

    ds_oh_addr: dict[str, int] = {}
    ds_oh_len: dict[str, int] = {}
    for n in names:
        oh = _object_header(_ds_messages(n, 0))
        ds_oh_len[n] = len(oh)
        ds_oh_addr[n] = alloc(len(oh))

    # data extents: contiguous blob per dataset, or (chunk btree + chunks)
    ds_data_addr: dict[str, int] = {}
    ds_chunks: dict[str, list] = {}   # name -> [(payload, addr, offset0)]
    ds_btree_addr: dict[str, int] = {}
    for n in names:
        arr = np.ascontiguousarray(datasets[n])
        if chunk_rows is None:
            ds_data_addr[n] = alloc(arr.nbytes)
            continue
        cr = min(chunk_rows, max(arr.shape[0], 1))
        payloads = _chunk_payloads(arr, cr, deflate, shuffle)
        if len(payloads) > _BTREE_GATE:
            raise NotImplementedError(
                f"{len(payloads)} chunks > {_BTREE_GATE} (single-leaf chunk "
                f"B-tree; raise chunk_rows or shard the file)")
        keysize = 8 + 8 * (arr.ndim + 1)
        ds_btree_addr[n] = alloc(
            24 + (len(payloads) + 1) * keysize + len(payloads) * 8)
        ds_chunks[n] = [(p, alloc(len(p)), i * cr)
                        for i, p in enumerate(payloads)]
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
        [_message(_MSG_SYMTAB, struct.pack("<QQ", btree_addr, heap_hdr_addr))]
        + root_attr_msgs)

    btree = struct.pack("<4sBBHQQ", b"TREE", 0, 0, len(snod_groups),
                        UNDEF, UNDEF)
    btree += struct.pack("<Q", 0)  # key0: before-everything sentinel
    for grp, addr in zip(snod_groups, snod_addrs):
        # child address, then the key AFTER it = its greatest name
        btree += struct.pack("<QQ", addr, name_off[grp[-1]])
    out += btree
    assert len(btree) == btree_size

    for grp, addr in zip(snod_groups, snod_addrs):
        assert len(out) == addr
        snod = struct.pack("<4sBxH", b"SNOD", 1, len(grp))
        for n in grp:
            snod += struct.pack("<QQI4x16x", name_off[n], ds_oh_addr[n], 0)
        snod += b"\x00" * (snod_size - len(snod))
        out += snod

    out += struct.pack("<4sB3xQQQ", b"HEAP", 0, len(heap_data), UNDEF,
                       heap_data_addr)
    out += heap_data

    for n in names:
        oh = _object_header(_ds_messages(
            n, ds_btree_addr[n] if chunk_rows is not None else ds_data_addr[n]))
        assert len(oh) == ds_oh_len[n]
        assert len(out) == ds_oh_addr[n]
        out += oh
    for n in names:
        arr = np.ascontiguousarray(datasets[n])
        if chunk_rows is None:
            assert len(out) == ds_data_addr[n]
            out += arr.tobytes()
            continue
        chunks = ds_chunks[n]
        keydims = arr.ndim + 1
        assert len(out) == ds_btree_addr[n]
        bt = struct.pack("<4sBBHQQ", b"TREE", 1, 0, len(chunks), UNDEF, UNDEF)

        def _key(nbytes: int, off0: int) -> bytes:
            offs = (off0,) + (0,) * (keydims - 1)
            return struct.pack("<II", nbytes, 0) + b"".join(
                struct.pack("<Q", o) for o in offs)

        for payload, addr, off0 in chunks:
            bt += _key(len(payload), off0) + struct.pack("<Q", addr)
        cr = min(chunk_rows, max(arr.shape[0], 1))
        bt += _key(0, len(chunks) * cr)  # final "past-the-end" key
        out += bt
        for payload, addr, _off0 in chunks:
            assert len(out) == addr
            out += payload
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
    # message blocks: the initial one plus any Object Header
    # Continuation (type 0x10) blocks it points at
    blocks = [(addr + 16, hsize)]
    read = 0
    bi = 0
    while bi < len(blocks) and read < nmsg:
        off, size = blocks[bi]
        end = off + size
        while read < nmsg and off + 8 <= end:
            mtype, msize, _flags = struct.unpack_from("<HHB", buf, off)
            body = buf[off + 8:off + 8 + msize]
            if mtype == 0x0010 and len(body) >= 16:  # continuation
                c_off, c_len = struct.unpack_from("<QQ", body, 0)
                blocks.append((c_off, c_len))
            else:
                msgs.append((mtype, body))
            off += 8 + msize
            read += 1
        bi += 1
    return msgs


def _heap_string(buf: bytes, heap_data_addr: int, offset: int) -> str:
    end = buf.index(b"\x00", heap_data_addr + offset)
    return buf[heap_data_addr + offset:end].decode()


def _parse_filters(body: bytes) -> list[tuple[int, list[int]]]:
    """Filter Pipeline message v1 -> [(filter_id, client_values)]."""
    ver, nf = body[0], body[1]
    if ver != 1:
        raise NotImplementedError(f"filter pipeline version {ver}")
    off = 8
    filters = []
    for _ in range(nf):
        fid, namelen, _flags, nvals = struct.unpack_from("<HHHH", body, off)
        off += 8
        off += (namelen + 7) & ~7 if namelen else 0
        vals = [struct.unpack_from("<I", body, off + 4 * i)[0]
                for i in range(nvals)]
        off += 4 * nvals + (4 if nvals % 2 else 0)
        filters.append((fid, vals))
    return filters


def _walk_chunk_btree(fetch, addr: int, keydims: int) -> list[dict]:
    """Node-type-1 v1 B-tree -> [{offset, nbytes, mask, addr}] (any level)."""
    sig, ntype, level, nused = struct.unpack_from("<4sBBH", fetch(addr, 8), 0)
    if sig != b"TREE" or ntype != 1:
        raise ValueError("bad chunk B-tree node")
    keysize = 8 + 8 * keydims
    body = fetch(addr + 24, nused * (keysize + 8))
    chunks = []
    off = 0
    for _ in range(nused):
        nbytes, mask = struct.unpack_from("<II", body, off)
        offs = struct.unpack_from(f"<{keydims}Q", body, off + 8)
        child = struct.unpack_from("<Q", body, off + keysize)[0]
        off += keysize + 8
        if level > 0:
            chunks += _walk_chunk_btree(fetch, child, keydims)
        else:
            chunks.append({"offset": offs[:-1], "nbytes": nbytes,
                           "mask": mask, "addr": child})
    return chunks


def _defilter(raw: bytes, filters: list[tuple[int, list[int]]],
              mask: int) -> bytes:
    """Undo the filter pipeline (applied in reverse write order); mask bit
    i set = filter i was skipped for this chunk."""
    import zlib

    for idx in range(len(filters) - 1, -1, -1):
        if mask & (1 << idx):
            continue
        fid, vals = filters[idx]
        if fid == 1:        # deflate
            raw = zlib.decompress(raw)
        elif fid == 2:      # shuffle
            el = vals[0] if vals else 1
            raw = np.frombuffer(raw, np.uint8).reshape(el, -1).T.tobytes()
        else:
            raise NotImplementedError(f"HDF5 filter id {fid}")
    return raw


def read_hdf5_meta(path: str) -> dict:
    """Driver-side header-graph parse -> {format, datasets: {name:
    {shape, dtype, data_addr, nbytes}}}.  Reads headers only, never data
    (the data extents are range-read per slab cluster-side)."""
    size = os.path.getsize(path)
    fh = open(path, "rb")
    buf = fh.read(min(size, 1 << 20))  # header graph lives up front

    def fetch(addr: int, n: int) -> bytes:
        if addr + n <= len(buf):
            return buf[addr:addr + n]
        fh.seek(addr)
        return fh.read(n)

    if buf[:8] != MAGIC:
        fh.close()
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
    if cache == 1:
        btree_addr, heap_addr = struct.unpack_from("<QQ", buf,
                                                   root_entry + 24)
    else:
        # no cached scratch: find the Symbol Table message in the root
        # object header (BAG and other h5py/HDF5-1.8 files)
        btree_addr = heap_addr = None
        for mtype, body in _read_object_header(buf, _root_oh):
            if mtype == _MSG_SYMTAB:
                btree_addr, heap_addr = struct.unpack_from("<QQ", body, 0)
        if btree_addr is None:
            raise NotImplementedError(
                "root group without symbol table (new-style links)")

    datasets: dict[str, dict] = {}

    def walk_group(btree_addr, heap_addr, prefix):
        sig, hver, heap_len, _free, heap_data_addr = struct.unpack_from(
            "<4sB3xQQQ", buf, heap_addr)
        if sig != b"HEAP":
            raise ValueError("bad local heap signature")
        sig, ntype, level, nused = struct.unpack_from("<4sBBH", buf,
                                                      btree_addr)
        if sig != b"TREE" or ntype != 0:
            raise ValueError("bad group B-tree node")
        if level != 0:
            raise NotImplementedError("multi-level group B-trees")
        child_base = btree_addr + 24
        for ci in range(nused):
            snod_addr = struct.unpack_from("<Q", buf,
                                           child_base + 8 + ci * 16)[0]
            sig, _sver, nsym = struct.unpack_from("<4sBxH", buf, snod_addr)
            if sig != b"SNOD":
                raise ValueError("bad symbol table node")
            for si in range(nsym):
                e = snod_addr + 8 + si * 40
                name_ofs, oh_addr = struct.unpack_from("<QQ", buf, e)
                name = _heap_string(buf, heap_data_addr, name_ofs)
                _walk_object(oh_addr, prefix + name)

    def _walk_object(oh_addr, full_name):
        shape = dtype = layout = None
        chunk_shape = btree = None
        sub_btree = sub_heap = None
        filters: list = []
        ds_attrs: dict = {}
        for mtype, body in _read_object_header(buf, oh_addr):
            if mtype == _MSG_SYMTAB:
                sub_btree, sub_heap = struct.unpack_from("<QQ", body, 0)
            elif mtype == _MSG_ATTRIBUTE:
                an, av = _parse_attr(body)
                if an is not None and av is not None:
                    ds_attrs[an] = av
            elif mtype == _MSG_DATASPACE:
                ver, ndim, flags = struct.unpack_from("<BBB", body, 0)
                if ver != 1:
                    raise NotImplementedError(f"dataspace version {ver}")
                shape = tuple(
                    struct.unpack_from("<Q", body, 8 + 8 * i)[0]
                    for i in range(ndim))
            elif mtype == _MSG_DATATYPE:
                try:
                    dtype = _parse_dt(body)
                except NotImplementedError:
                    dtype = None
            elif mtype == _MSG_FILTERS:
                filters = _parse_filters(body)
            elif mtype == _MSG_LAYOUT:
                ver, cls = body[0], body[1]
                if ver != 3:
                    raise NotImplementedError(f"data layout version {ver}")
                if cls == 1:
                    layout = struct.unpack_from("<QQ", body, 2)
                elif cls == 2:
                    keydims = body[2]
                    btree = struct.unpack_from("<Q", body, 3)[0]
                    dims = struct.unpack_from(f"<{keydims}I", body, 11)
                    chunk_shape = dims[:-1]  # last = element size
                else:
                    raise NotImplementedError(
                        "compact HDF5 layout (contiguous/chunked only)")
        if sub_btree is not None:  # subgroup: recurse
            walk_group(sub_btree, sub_heap, full_name + "/")
            return
        if shape is None or dtype is None or \
                (layout is None and btree is None):
            return  # non-dataset object (named type, vlen table, ...)
        if btree is not None:
            chunks = _walk_chunk_btree(fetch, btree, len(chunk_shape) + 1)
            datasets[full_name] = {
                "shape": shape, "dtype": dtype.str, "layout": "chunked",
                "chunk_shape": chunk_shape, "filters": filters,
                "chunks": sorted(chunks,
                                 key=lambda c: tuple(c["offset"])),
                "attrs": ds_attrs,
            }
        else:
            datasets[full_name] = {"shape": shape, "dtype": dtype.str,
                                   "layout": "contiguous",
                                   "data_addr": layout[0],
                                   "nbytes": layout[1],
                                   "attrs": ds_attrs}

    walk_group(btree_addr, heap_addr, "")
    root_attrs: dict = {}
    for mtype, body in _read_object_header(buf, _root_oh):
        if mtype == _MSG_ATTRIBUTE:
            an, av = _parse_attr(body)
            if an is not None and av is not None:
                root_attrs[an] = av
    fh.close()
    return {"format": "HDF5", "superblock_version": 0, "datasets": datasets,
            "attrs": root_attrs}


def read_hdf5_var(path: str, name: str) -> np.ndarray:
    """Driver-side full read of one dataset (small data / tests)."""
    m = read_hdf5_meta(path)
    d = m["datasets"][name]
    dt = np.dtype(d["dtype"])
    with open(path, "rb") as f:
        if d["layout"] == "contiguous":
            f.seek(d["data_addr"])
            raw = f.read(d["nbytes"])
            return np.frombuffer(raw, dtype=dt).reshape(d["shape"])
        out = np.zeros(d["shape"], dtype=dt)
        cshape = d["chunk_shape"]
        for c in d["chunks"]:
            f.seek(c["addr"])
            raw = _defilter(f.read(c["nbytes"]), d["filters"], c["mask"])
            block = np.frombuffer(raw, dtype=dt).reshape(cshape)
            sel_out = []
            sel_blk = []
            for dim in range(len(cshape)):
                lo = c["offset"][dim]
                hi = min(lo + cshape[dim], d["shape"][dim])
                sel_out.append(slice(lo, hi))
                sel_blk.append(slice(0, hi - lo))
            out[tuple(sel_out)] = block[tuple(sel_blk)]
        return out


def read_hdf5(path: str, var: str | None = None, *, rows_per_block: int = 4096):
    """-> ray.data.Dataset of slab rows (name, row0, n_rows, data:binary).
    Contiguous layout ⇒ each slab is one seek+read of its exact byte
    range; chunked layout ⇒ one slab per chunk (seek+read+defilter).
    Slabs over all (or one) dataset fan out as Ray tasks."""
    import ray.data as rd

    m = read_hdf5_meta(path)
    names = [var] if var is not None else sorted(m["datasets"])
    items = []
    for n in names:
        d = m["datasets"][n]
        lead = d["shape"][0] if d["shape"] else 1
        if d["layout"] == "chunked":
            if any(any(c["offset"][1:]) for c in d["chunks"]) or \
                    tuple(d["chunk_shape"][1:]) != tuple(d["shape"][1:]):
                # chunk grid splits trailing dims: assemble whole var in
                # one slab (general N-D placement)
                items.append({"name": n, "lo": 0, "hi": lead,
                              "addr": -2, "nbytes": -1, "mask": 0})
                continue
            cr = d["chunk_shape"][0]
            for c in d["chunks"]:
                lo = c["offset"][0]
                items.append({"name": n, "lo": lo, "hi": min(lo + cr, lead),
                              "addr": c["addr"], "nbytes": c["nbytes"],
                              "mask": c["mask"]})
            continue
        for s in range(0, max(lead, 1), rows_per_block):
            items.append({"name": n, "lo": s,
                          "hi": min(s + rows_per_block, lead),
                          "addr": -1, "nbytes": -1, "mask": 0})

    def load(b: pa.Table) -> pa.Table:
        rows = {"name": [], "row0": [], "n_rows": [], "data": []}
        with open(path, "rb") as f:
            for it in b.to_pylist():
                d = m["datasets"][it["name"]]
                shape = d["shape"]
                row_bytes = (int(np.prod(shape[1:])) if len(shape) > 1 else 1) \
                    * np.dtype(d["dtype"]).itemsize
                n_rows = it["hi"] - it["lo"]
                if it["addr"] == -2:  # whole-var N-D chunk assembly
                    raw = np.ascontiguousarray(
                        read_hdf5_var(path, it["name"])).tobytes()
                elif it["addr"] >= 0:   # chunk slab
                    f.seek(it["addr"])
                    raw = _defilter(f.read(it["nbytes"]), d["filters"],
                                    it["mask"])[:n_rows * row_bytes]
                else:                 # contiguous slab
                    f.seek(d["data_addr"] + it["lo"] * row_bytes)
                    raw = f.read(n_rows * row_bytes)
                rows["name"].append(it["name"])
                rows["row0"].append(it["lo"])
                rows["n_rows"].append(n_rows)
                rows["data"].append(raw)
        return pa.table({
            "name": pa.array(rows["name"], pa.string()),
            "row0": pa.array(rows["row0"], pa.int64()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    return rd.from_items(items).map_batches(load, batch_format="pyarrow")


# ------------------------------------------------------- netCDF-4 flavor
#
# netCDF-4 files ARE HDF5 files (frmts/netcdf/netcdfdataset.cpp detects the
# \x89HDF magic and re-routes to the HDF5 core).  The netCDF layer adds:
#   - dimension-scale datasets (attr CLASS = "DIMENSION_SCALE"; a dim with
#     a coordinate variable carries real data, a bare dim carries the
#     "This is a netCDF dimension but not a netCDF variable" NAME)
#   - DIMENSION_LIST / REFERENCE_LIST vlen-reference attributes binding
#     variable axes to dim scales — NOT dereferenced here (vlen + object
#     references live in the global heap); instead axes match dim scales
#     BY SIZE, exactly GDAL's phony-dim fallback (netcdfdataset.cpp emits
#     phony_dim_N for unlabeled HDF5 axes).  Ambiguous sizes get the
#     first size-matching dim, unmatched axes get phony_dim_{i}.
#   - _NCProperties root attribute (written by libnetcdf; surfaced as a
#     global attribute when present)


def netcdf4_meta(path: str) -> dict:
    """netCDF-4 view over an HDF5 file: {dims, vars, gatts}."""
    m = read_hdf5_meta(path)
    dims: dict[str, int] = {}
    for n, d in m["datasets"].items():
        a = d.get("attrs", {})
        if a.get("CLASS") == "DIMENSION_SCALE":
            dims[n] = d["shape"][0] if d["shape"] else 1
    variables: dict[str, dict] = {}
    for n, d in m["datasets"].items():
        a = d.get("attrs", {})
        if a.get("CLASS") == "DIMENSION_SCALE" and str(
                a.get("NAME", "")).startswith("This is a netCDF dimension"):
            continue  # bare dimension, not a variable
        axis_names = []
        for i, s in enumerate(d["shape"]):
            if n in dims and len(d["shape"]) == 1:
                axis_names.append(n)  # coordinate variable: its own dim
                continue
            match = [dn for dn, ds in dims.items() if ds == s]
            axis_names.append(match[0] if match else f"phony_dim_{i}")
        variables[n] = {
            "dims": axis_names, "shape": list(d["shape"]),
            "dtype": d["dtype"], "layout": d["layout"],
            "attrs": {k: v for k, v in a.items()
                      if k not in ("CLASS", "NAME")},
        }
    return {"format": "netCDF-4", "dims": dims, "vars": variables,
            "gatts": m.get("attrs", {})}


def write_netcdf4(path: str, variables: dict[str, tuple[tuple[str, ...], np.ndarray]],
                  *, coords: dict[str, np.ndarray] | None = None,
                  gatts: dict | None = None,
                  chunk_rows: int | None = None,
                  deflate: int | None = None) -> None:
    """netCDF-4-style HDF5 writer: variables {name: (dim_names, array)};
    dims become dimension-scale datasets (coordinate data from `coords`
    when given, else a bare int32 placeholder with the canonical netCDF
    NAME sentinel).  DIMENSION_LIST references are not written (readers
    here re-bind by size, the same phony-dim contract as the reader)."""
    datasets: dict[str, np.ndarray] = {}
    attrs: dict[str, dict] = {}
    dim_sizes: dict[str, int] = {}
    for name, (dim_names, arr) in variables.items():
        arr = np.asarray(arr)
        if len(dim_names) != arr.ndim:
            raise ValueError(f"{name}: {len(dim_names)} dims for rank {arr.ndim}")
        for dn, s in zip(dim_names, arr.shape):
            if dim_sizes.setdefault(dn, s) != s:
                raise ValueError(f"dimension {dn}: conflicting sizes")
        datasets[name] = arr
        attrs[name] = {}
    for dn, size in dim_sizes.items():
        if dn in datasets:  # coordinate variable doubles as its dim scale
            attrs[dn] = {"CLASS": "DIMENSION_SCALE", "NAME": dn}
            continue
        if coords and dn in coords:
            datasets[dn] = np.asarray(coords[dn])
            attrs[dn] = {"CLASS": "DIMENSION_SCALE", "NAME": dn}
        else:
            datasets[dn] = np.zeros(size, dtype=np.int32)
            attrs[dn] = {
                "CLASS": "DIMENSION_SCALE",
                "NAME": f"This is a netCDF dimension but not a netCDF "
                        f"variable.  {size}",
            }
    root = dict(gatts or {})
    root.setdefault("_NCProperties", "version=2,gdal_ray=1")
    write_hdf5(path, datasets, attrs=attrs, root_attrs=root,
               chunk_rows=chunk_rows, deflate=deflate)
