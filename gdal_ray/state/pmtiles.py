"""PMTiles v3 tile-archive sink/source, implemented from the public
PMTiles v3 specification — no pmtiles library.

Reference semantics: frmts/pmtiles (pmtilesdataset.cpp reads the same
layout via the vendored pmtiles headers).  A PMTiles archive is one file:

    [127-byte header][root directory][JSON metadata][leaf dirs][tile data]

- header: magic "PMTiles", spec version 3, u64 LE section offsets/
  lengths, entry counts, compression/type bytes, zoom/bounds/center.
- tile addressing: tileId = (4^z − 1)/3 + hilbert(x, y at order z) —
  zoom-cumulative offset plus the Hilbert index (the spec's locality
  ordering, cf. FlatGeobuf's packed Hilbert R-tree in the vector world).
- directories: varint-encoded entry lists — count, delta-encoded
  tileIds, run lengths, byte lengths, offsets (0 ⇒ contiguous with the
  previous entry, else value−1).

Directories: past 16,384 entries the writer splits into LEAF directories
(spec: a root entry with run_length 0 points at a leaf — offset into the
leaf section, length in bytes); the reader fans leaves out so each Ray
task decodes one leaf and range-reads only its tiles.  gzip or raw
internal/tile compression; PNG tile type by default, MVT supported.

Scale shape: like MBTiles, the write is a driver-side streaming sink
over cluster-encoded tiles (single-writer file; shard archives for
web-scale output); the read is parallel — entries decode driver-side
from the tiny root directory and each Ray task range-reads only its
tiles' bytes.
"""

from __future__ import annotations

import gzip
import json
import os
import struct

import numpy as np
import pyarrow as pa

HEADER_SIZE = 127
MAGIC = b"PMTiles"
MAX_ROOT_ENTRIES = 16384
LEAF_ENTRIES = 8192  # entries per leaf directory when the root overflows

COMP_NONE, COMP_GZIP = 1, 2
TILETYPE_MVT, TILETYPE_PNG = 1, 2


# ------------------------------------------------------------- tile ids


def _hilbert_xy_to_d(z: int, x: int, y: int) -> int:
    """Hilbert curve index of (x, y) on the 2^z × 2^z grid (spec §tileId)."""
    d = 0
    s = 1 << (z - 1) if z > 0 else 0
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def _hilbert_d_to_xy(z: int, d: int) -> tuple[int, int]:
    x = y = 0
    t = d
    s = 1
    while s < (1 << z):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s <<= 1
    return x, y


def zxy_to_tileid(z: int, x: int, y: int) -> int:
    if not (0 <= x < (1 << z) and 0 <= y < (1 << z)):
        raise ValueError(f"tile ({x},{y}) out of range at z={z}")
    base = ((1 << (2 * z)) - 1) // 3  # Σ 4^i for i<z
    return base + _hilbert_xy_to_d(z, x, y)


def tileid_to_zxy(tid: int) -> tuple[int, int, int]:
    z = 0
    acc = 0
    while acc + (1 << (2 * z)) <= tid:
        acc += 1 << (2 * z)
        z += 1
    x, y = _hilbert_d_to_xy(z, tid - acc)
    return z, x, y


# ------------------------------------------------------------- varints


def _write_varint(out: bytearray, v: int) -> None:
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if b < 0x80:
            return val, pos
        shift += 7


def encode_directory(entries: list[tuple[int, int, int, int]]) -> bytes:
    """entries: sorted (tile_id, offset, length, run_length) → spec bytes."""
    out = bytearray()
    _write_varint(out, len(entries))
    last = 0
    for tid, _, _, _ in entries:
        _write_varint(out, tid - last)
        last = tid
    for _, _, _, rl in entries:
        _write_varint(out, rl)
    for _, _, ln, _ in entries:
        _write_varint(out, ln)
    for i, (_, off, ln, _) in enumerate(entries):
        if i > 0 and off == entries[i - 1][1] + entries[i - 1][2]:
            _write_varint(out, 0)  # contiguous with previous
        else:
            _write_varint(out, off + 1)
    return bytes(out)


def decode_directory(buf: bytes) -> list[tuple[int, int, int, int]]:
    n, pos = _read_varint(buf, 0)
    tids = []
    last = 0
    for _ in range(n):
        d, pos = _read_varint(buf, pos)
        last += d
        tids.append(last)
    runs = []
    for _ in range(n):
        r, pos = _read_varint(buf, pos)
        runs.append(r)
    lens = []
    for _ in range(n):
        ln, pos = _read_varint(buf, pos)
        lens.append(ln)
    entries = []
    for i in range(n):
        v, pos = _read_varint(buf, pos)
        if v == 0:
            off = entries[i - 1][1] + entries[i - 1][2]
        else:
            off = v - 1
        entries.append((tids[i], off, lens[i], runs[i]))
    return entries


# ------------------------------------------------------------- header


def _pack_header(**kw) -> bytes:
    h = bytearray(HEADER_SIZE)
    h[0:7] = MAGIC
    h[7] = 3
    struct.pack_into(
        "<9Q", h, 8,
        kw["root_off"], kw["root_len"], kw["meta_off"], kw["meta_len"],
        kw["leaf_off"], kw["leaf_len"], kw["data_off"], kw["data_len"],
        kw["n_addressed"],
    )
    struct.pack_into("<2Q", h, 80, kw["n_entries"], kw["n_contents"])
    h[96] = 1 if kw.get("clustered", True) else 0
    h[97] = kw.get("internal_compression", COMP_GZIP)
    h[98] = kw.get("tile_compression", COMP_NONE)
    h[99] = kw.get("tile_type", TILETYPE_PNG)
    h[100] = kw["min_zoom"]
    h[101] = kw["max_zoom"]
    struct.pack_into(
        "<4i", h, 102,
        int(kw.get("min_lon", -180) * 1e7), int(kw.get("min_lat", -85) * 1e7),
        int(kw.get("max_lon", 180) * 1e7), int(kw.get("max_lat", 85) * 1e7),
    )
    h[118] = kw.get("center_zoom", kw["min_zoom"])
    struct.pack_into("<2i", h, 119, 0, 0)
    return bytes(h)


def read_header(path: str) -> dict:
    with open(path, "rb") as f:
        h = f.read(HEADER_SIZE)
    if h[0:7] != MAGIC or h[7] != 3:
        raise ValueError("not a PMTiles v3 archive")
    (root_off, root_len, meta_off, meta_len, leaf_off, leaf_len,
     data_off, data_len, n_addressed) = struct.unpack_from("<9Q", h, 8)
    n_entries, n_contents = struct.unpack_from("<2Q", h, 80)
    return {
        "root_off": root_off, "root_len": root_len,
        "meta_off": meta_off, "meta_len": meta_len,
        "leaf_off": leaf_off, "leaf_len": leaf_len,
        "data_off": data_off, "data_len": data_len,
        "n_addressed": n_addressed, "n_entries": n_entries,
        "n_contents": n_contents,
        "clustered": bool(h[96]),
        "internal_compression": h[97], "tile_compression": h[98],
        "tile_type": h[99], "min_zoom": h[100], "max_zoom": h[101],
    }


def _codec(comp: int):
    if comp == COMP_NONE:
        return lambda b: b, lambda b: b
    if comp == COMP_GZIP:
        return gzip.compress, gzip.decompress
    raise NotImplementedError(f"pmtiles compression {comp}")


# ------------------------------------------------------------- write


def write_pmtiles(tiles_ds, path: str, *, tile_size: int = 256,
                  metadata: dict | None = None,
                  already_encoded: bool = False,
                  tile_type: int = TILETYPE_PNG,
                  blob_col: str = "png") -> int:
    """Rendered-tiles Dataset (z,x,y,rgb,alpha — or z,x,y,<blob_col> when
    `already_encoded`) → one .pmtiles archive (atomic tmp+rename).  Tiles
    are PNG-encoded in parallel on the cluster (or pre-encoded blobs, e.g.
    MVT protobufs with tile_type=TILETYPE_MVT); the driver streams the
    blobs, orders them by Hilbert tileId (clustered layout) and emits the
    root directory.  Returns the tile count."""
    from gdal_ray.state.mbtiles import _encode_batch

    if not already_encoded:
        tiles_ds = tiles_ds.map_batches(
            lambda b: _encode_batch(b, tile_size), batch_format="pyarrow"
        )
        blob_col = "png"
    recs: list[tuple[int, bytes]] = []
    for b in tiles_ds.iter_batches(batch_format="pyarrow"):
        zs = b.column("z").to_numpy()
        xs = b.column("x").to_numpy()
        ys = b.column("y").to_numpy()
        blobs = b.column(blob_col).to_pylist()
        for i in range(len(zs)):
            recs.append((zxy_to_tileid(int(zs[i]), int(xs[i]), int(ys[i])),
                         blobs[i]))
    recs.sort(key=lambda r: r[0])
    tids = [r[0] for r in recs]
    if len(set(tids)) != len(tids):
        raise ValueError("duplicate (z,x,y) tiles")

    data = bytearray()
    entries = []
    for tid, blob in recs:
        entries.append((tid, len(data), len(blob), 1))
        data += blob
    gz, _ = _codec(COMP_GZIP)
    leaves = bytearray()
    if len(entries) <= MAX_ROOT_ENTRIES:
        root = gz(encode_directory(entries))
    else:
        # split into leaf directories: one root entry per leaf with
        # run_length 0, offset into the leaf section, length in bytes
        root_entries = []
        for s in range(0, len(entries), LEAF_ENTRIES):
            chunk = entries[s:s + LEAF_ENTRIES]
            blob = gz(encode_directory(chunk))
            root_entries.append((chunk[0][0], len(leaves), len(blob), 0))
            leaves += blob
        root = gz(encode_directory(root_entries))
    meta = gz(json.dumps(metadata or {"name": "gdal_ray tiles"}).encode())

    zooms = [tileid_to_zxy(t)[0] for t in tids] or [0]
    root_off = HEADER_SIZE
    meta_off = root_off + len(root)
    leaf_off = meta_off + len(meta)
    data_off = leaf_off + len(leaves)
    header = _pack_header(
        root_off=root_off, root_len=len(root),
        meta_off=meta_off, meta_len=len(meta),
        leaf_off=leaf_off, leaf_len=len(leaves),
        data_off=data_off, data_len=len(data),
        n_addressed=len(entries), n_entries=len(entries),
        n_contents=len(entries),
        min_zoom=min(zooms), max_zoom=max(zooms),
        tile_type=tile_type,
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(header)
        f.write(root)
        f.write(meta)
        f.write(bytes(leaves))
        f.write(bytes(data))
    os.replace(tmp, path)
    return len(entries)


# ------------------------------------------------------------- read


def read_metadata(path: str) -> dict:
    h = read_header(path)
    _, gunz = _codec(h["internal_compression"])
    with open(path, "rb") as f:
        f.seek(h["meta_off"])
        return json.loads(gunz(f.read(h["meta_len"])))


def _entries(path: str, h: dict) -> list[tuple[int, int, int, int]]:
    _, gunz = _codec(h["internal_compression"])
    with open(path, "rb") as f:
        f.seek(h["root_off"])
        return decode_directory(gunz(f.read(h["root_len"])))


def read_pmtiles(path: str, *, entries_per_block: int = 1024):
    """-> ray.data.Dataset of (z, x, y, png).  The tiny root directory
    decodes driver-side; tile-entry ranges (or whole leaf directories —
    run_length 0 root entries, decoded inside the task) fan out and each
    task range-reads only its tiles' bytes from the data section."""
    import ray.data as rd

    h = read_header(path)
    ents = _entries(path, h)
    data_off = h["data_off"]
    leaf_off = h["leaf_off"]
    tile_comp = h["tile_compression"]
    internal_comp = h["internal_compression"]
    items = []
    direct = [e for e in ents if e[3] != 0]
    leaf_ptrs = [e for e in ents if e[3] == 0]
    for s in range(0, len(direct), entries_per_block):
        chunk = direct[s:s + entries_per_block]
        items.append({
            "leaf_off": -1, "leaf_len": 0,
            "tids": [e[0] for e in chunk],
            "offs": [e[1] for e in chunk],
            "lens": [e[2] for e in chunk],
            "runs": [e[3] for e in chunk],
        })
    for _, off, ln, _ in leaf_ptrs:  # one task per leaf directory
        items.append({"leaf_off": off, "leaf_len": ln,
                      "tids": [], "offs": [], "lens": [], "runs": []})
    if not items:
        items.append({"leaf_off": -1, "leaf_len": 0,
                      "tids": [], "offs": [], "lens": [], "runs": []})

    def load(b: pa.Table) -> pa.Table:
        _, gunz = _codec(tile_comp)
        _, gunz_int = _codec(internal_comp)
        rows = {"z": [], "x": [], "y": [], "png": []}
        with open(path, "rb") as f:
            for item in b.to_pylist():
                ents_here = list(zip(item["tids"], item["offs"],
                                     item["lens"], item["runs"]))
                if item["leaf_off"] >= 0:
                    f.seek(leaf_off + item["leaf_off"])
                    ents_here = decode_directory(
                        gunz_int(f.read(item["leaf_len"])))
                for tid, off, ln, run in ents_here:
                    f.seek(data_off + off)
                    blob = gunz(f.read(ln))
                    for k in range(max(run, 1)):  # run-length: same bytes
                        z, x, y = tileid_to_zxy(tid + k)
                        rows["z"].append(z)
                        rows["x"].append(x)
                        rows["y"].append(y)
                        rows["png"].append(blob)
        return pa.table({
            "z": pa.array(rows["z"], pa.int64()),
            "x": pa.array(rows["x"], pa.int64()),
            "y": pa.array(rows["y"], pa.int64()),
            "png": pa.array(rows["png"], pa.binary()),
        })

    return rd.from_items(items).map_batches(load, batch_format="pyarrow")
