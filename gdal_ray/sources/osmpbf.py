"""OSM PBF (OpenStreetMap protocolbuffer binary format) driver.

Reference semantics: GDAL's OSM driver — ogr/ogrsf_frmts/osm/osm_parser.cpp
(PBF block/blob parse, DenseNodes delta decode, string table) and
ogrosmdatasource.cpp (layer materialization).  The wire format here is
implemented from the PUBLIC format description
(wiki.openstreetmap.org/wiki/PBF_Format and the fileformat.proto /
osmformat.proto schemas shipped with it):

    file   := repeat( int32-BE len | BlobHeader(len) | Blob(datasize) )
    BlobHeader := 1:type (string "OSMHeader"|"OSMData"), 3:datasize (int32)
    Blob       := 1:raw (bytes) | 2:raw_size + 3:zlib_data
    HeaderBlock    := 1:bbox{1:left 2:right 3:top 4:bottom sint64 nanodeg},
                      4:required_features*, 16:writingprogram
    PrimitiveBlock := 1:stringtable{1:bytes*}, 2:primitivegroup*,
                      17:granularity(=100), 19:lat_offset, 20:lon_offset
    PrimitiveGroup := 2:dense | 3:ways* | 4:relations*
    DenseNodes := 1:id (packed sint64, DELTA-coded), 8:lat, 9:lon (same),
                  10:keys_vals (packed int32: k,v string-table indices,
                  0 terminates each node's tag list)
    Way      := 1:id, 2:keys(packed u32), 3:vals, 8:refs(packed sint64 delta)
    Relation := 1:id, 2:keys, 3:vals, 8:roles_sid(packed i32),
                9:memids(packed sint64 delta), 10:types(packed enum)

    lat_deg = 1e-9 * (lat_offset + granularity * lat_raw)

Scale shape (the gtiff_reader / zarr pattern): blob boundaries are
discovered by a DRIVER-SIDE header scan that reads ~20 bytes per blob and
seeks past the payload (a planet file is ~70k blobs → a sub-second scan);
every Ray task then range-reads and decodes whole blobs in parallel.  The
hot path — packed-varint fields holding millions of delta-coded ids and
nanodegree coordinates per block — decodes via a fully vectorized numpy
varint kernel (group-by-continuation-bit + per-position shifts +
reduceat), then cumsum undoes the delta coding.  Way geometry assembly
(`way_lines`) is a distributed ref→node join, not a driver loop.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

import numpy as np
import pyarrow as pa

# ------------------------------------------------------- scalar varints

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5


def _uv(buf: bytes, pos: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if b < 0x80:
            return v, pos
        shift += 7


def _skip(buf: bytes, pos: int, wt: int) -> int:
    if wt == _WT_VARINT:
        return _uv(buf, pos)[1]
    if wt == _WT_LEN:
        ln, pos = _uv(buf, pos)
        return pos + ln
    if wt == _WT_I64:
        return pos + 8
    if wt == _WT_I32:
        return pos + 4
    raise ValueError(f"osmpbf: unsupported wire type {wt}")


def _put_uv(out: bytearray, v: int) -> None:
    while v > 0x7F:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _put_tag(out: bytearray, field: int, wt: int) -> None:
    _put_uv(out, (field << 3) | wt)


def _put_len(out: bytearray, field: int, payload: bytes) -> None:
    _put_tag(out, field, _WT_LEN)
    _put_uv(out, len(payload))
    out += payload


# --------------------------------------------- vectorized packed varints

def decode_packed_u64(buf: bytes) -> np.ndarray:
    """Packed varint payload → uint64 array, fully vectorized: bytes with
    the continuation bit clear end a value; per-value byte positions get
    7-bit shifts; np.add.reduceat assembles."""
    if not buf:
        return np.zeros(0, np.uint64)
    arr = np.frombuffer(buf, np.uint8)
    ends = arr < 0x80                       # last byte of each varint
    starts = np.empty(len(arr), bool)
    starts[0] = True
    starts[1:] = ends[:-1]
    start_idx = np.flatnonzero(starts)
    # position of each byte within its varint
    pos_in = np.arange(len(arr)) - np.repeat(
        start_idx, np.diff(np.append(start_idx, len(arr))))
    contrib = (arr & 0x7F).astype(np.uint64) << (7 * pos_in.astype(np.uint64))
    return np.add.reduceat(contrib, start_idx)


def encode_packed_u64(vals: np.ndarray) -> bytes:
    """uint64 array → packed varint payload, vectorized per byte position
    (≤10 passes)."""
    vals = np.asarray(vals, np.uint64)
    if len(vals) == 0:
        return b""
    with np.errstate(over="ignore"):
        nb = np.ones(len(vals), np.int64)
        v = vals >> np.uint64(7)
        while v.any():
            nb += (v != 0)
            v >>= np.uint64(7)
    total = int(nb.sum())
    out = np.zeros(total, np.uint8)
    offs = np.cumsum(nb) - nb               # start of each value
    v = vals.copy()
    idx = offs.copy()
    remaining = nb.copy()
    for _ in range(10):
        live = remaining > 0
        if not live.any():
            break
        byte = (v[live] & np.uint64(0x7F)).astype(np.uint8)
        more = remaining[live] > 1
        out[idx[live]] = byte | (more.astype(np.uint8) << 7)
        v[live] >>= np.uint64(7)
        idx[live] += 1
        remaining[live] -= 1
    return out.tobytes()


def _zz(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def _unzz(u: np.ndarray) -> np.ndarray:
    u = np.asarray(u, np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)
            ^ -(u & np.uint64(1)).astype(np.int64))


def _packed_sint_delta(vals) -> bytes:
    d = np.diff(np.asarray(vals, np.int64), prepend=np.int64(0))
    return encode_packed_u64(_zz(d))


def _unpack_sint_delta(buf: bytes) -> np.ndarray:
    return np.cumsum(_unzz(decode_packed_u64(buf)), dtype=np.int64)


# ------------------------------------------------------------ blob scan

def scan_blobs(path: str) -> list[dict]:
    """Driver-side index pass: [(type, blob byte offset, blob size)] —
    reads only the 4-byte length + BlobHeader per blob, seeks past data."""
    blobs = []
    fsize = os.path.getsize(path)
    with open(path, "rb") as f:
        while f.tell() + 4 <= fsize:
            (hlen,) = struct.unpack(">i", f.read(4))
            hdr = f.read(hlen)
            btype, datasize = "", 0
            pos = 0
            while pos < len(hdr):
                key, pos = _uv(hdr, pos)
                field, wt = key >> 3, key & 7
                if field == 1 and wt == _WT_LEN:
                    ln, pos = _uv(hdr, pos)
                    btype = hdr[pos:pos + ln].decode()
                    pos += ln
                elif field == 3 and wt == _WT_VARINT:
                    datasize, pos = _uv(hdr, pos)
                else:
                    pos = _skip(hdr, pos, wt)
            blobs.append({"type": btype, "offset": f.tell(),
                          "size": datasize})
            f.seek(datasize, 1)
    return blobs


def _blob_payload(raw: bytes) -> bytes:
    """Blob message → uncompressed block bytes (raw or zlib_data)."""
    pos = 0
    out = raw_size = None
    while pos < len(raw):
        key, pos = _uv(raw, pos)
        field, wt = key >> 3, key & 7
        if field == 1 and wt == _WT_LEN:            # raw
            ln, pos = _uv(raw, pos)
            out = raw[pos:pos + ln]
            pos += ln
        elif field == 2 and wt == _WT_VARINT:       # raw_size
            raw_size, pos = _uv(raw, pos)
        elif field == 3 and wt == _WT_LEN:          # zlib_data
            ln, pos = _uv(raw, pos)
            out = zlib.decompress(raw[pos:pos + ln])
            pos += ln
        else:
            pos = _skip(raw, pos, wt)
    if out is None:
        raise ValueError("osmpbf: Blob carries no raw/zlib payload "
                         "(lzma/bzip2 blobs not supported)")
    if raw_size is not None and len(out) != raw_size:
        raise ValueError("osmpbf: raw_size mismatch")
    return out


# -------------------------------------------------------- block decode

def _tags_json(keys: np.ndarray, vals: np.ndarray, strings: list[str]) -> str:
    if len(keys) == 0:
        return "{}"
    return json.dumps({strings[k]: strings[v]
                       for k, v in zip(keys.tolist(), vals.tolist())},
                      sort_keys=True, separators=(",", ":"))


def decode_primitive_block(data: bytes) -> dict:
    """PrimitiveBlock bytes → {'nodes': Table, 'ways': Table,
    'relations': Table} (any may be empty)."""
    strings: list[str] = []
    groups: list[bytes] = []
    gran, lat_off, lon_off = 100, 0, 0
    pos = 0
    while pos < len(data):
        key, pos = _uv(data, pos)
        field, wt = key >> 3, key & 7
        if field == 1 and wt == _WT_LEN:            # stringtable
            ln, pos = _uv(data, pos)
            st, sp = data[pos:pos + ln], 0
            pos += ln
            while sp < len(st):
                k2, sp = _uv(st, sp)
                ln2, sp = _uv(st, sp)
                if (k2 >> 3) == 1:
                    strings.append(st[sp:sp + ln2].decode("utf-8"))
                sp += ln2
        elif field == 2 and wt == _WT_LEN:
            ln, pos = _uv(data, pos)
            groups.append(data[pos:pos + ln])
            pos += ln
        elif field == 17:
            gran, pos = _uv(data, pos)
        elif field == 19:
            lat_off, pos = _uv(data, pos)
        elif field == 20:
            lon_off, pos = _uv(data, pos)
        else:
            pos = _skip(data, pos, wt)

    node_ids, node_lat, node_lon, node_tags = [], [], [], []
    ways, rels = [], []
    for g in groups:
        pos = 0
        while pos < len(g):
            key, pos = _uv(g, pos)
            field, wt = key >> 3, key & 7
            if wt != _WT_LEN:
                pos = _skip(g, pos, wt)
                continue
            ln, pos = _uv(g, pos)
            msg = g[pos:pos + ln]
            pos += ln
            if field == 2:                          # DenseNodes
                ids = lat = lon = np.zeros(0, np.int64)
                kv = np.zeros(0, np.int64)
                mp = 0
                while mp < len(msg):
                    k2, mp = _uv(msg, mp)
                    f2, w2 = k2 >> 3, k2 & 7
                    if w2 != _WT_LEN:
                        mp = _skip(msg, mp, w2)
                        continue
                    l2, mp = _uv(msg, mp)
                    payload = msg[mp:mp + l2]
                    mp += l2
                    if f2 == 1:
                        ids = _unpack_sint_delta(payload)
                    elif f2 == 8:
                        lat = _unpack_sint_delta(payload)
                    elif f2 == 9:
                        lon = _unpack_sint_delta(payload)
                    elif f2 == 10:
                        kv = decode_packed_u64(payload).astype(np.int64)
                node_ids.append(ids)
                node_lat.append(lat_off + gran * lat)
                node_lon.append(lon_off + gran * lon)
                # split keys_vals on the 0 sentinels, one segment per node
                if len(kv) and len(ids):
                    zero = np.flatnonzero(kv == 0)
                    segs = np.split(kv, zero)
                    tags = []
                    for s in segs[:len(ids)]:
                        s = s[s != 0] if len(s) and s[0] == 0 else s
                        tags.append(_tags_json(s[0::2], s[1::2], strings))
                    tags += ["{}"] * (len(ids) - len(tags))
                    node_tags.extend(tags)
                else:
                    node_tags.extend(["{}"] * len(ids))
            elif field == 3:                        # Way
                wid = 0
                keys = vals = refs = np.zeros(0, np.int64)
                mp = 0
                while mp < len(msg):
                    k2, mp = _uv(msg, mp)
                    f2, w2 = k2 >> 3, k2 & 7
                    if f2 == 1 and w2 == _WT_VARINT:
                        wid, mp = _uv(msg, mp)
                        continue
                    if w2 != _WT_LEN:
                        mp = _skip(msg, mp, w2)
                        continue
                    l2, mp = _uv(msg, mp)
                    payload = msg[mp:mp + l2]
                    mp += l2
                    if f2 == 2:
                        keys = decode_packed_u64(payload).astype(np.int64)
                    elif f2 == 3:
                        vals = decode_packed_u64(payload).astype(np.int64)
                    elif f2 == 8:
                        refs = _unpack_sint_delta(payload)
                ways.append((wid, refs, _tags_json(keys, vals, strings)))
            elif field == 4:                        # Relation
                rid = 0
                keys = vals = roles = mem = types = np.zeros(0, np.int64)
                mp = 0
                while mp < len(msg):
                    k2, mp = _uv(msg, mp)
                    f2, w2 = k2 >> 3, k2 & 7
                    if f2 == 1 and w2 == _WT_VARINT:
                        rid, mp = _uv(msg, mp)
                        continue
                    if w2 != _WT_LEN:
                        mp = _skip(msg, mp, w2)
                        continue
                    l2, mp = _uv(msg, mp)
                    payload = msg[mp:mp + l2]
                    mp += l2
                    if f2 == 2:
                        keys = decode_packed_u64(payload).astype(np.int64)
                    elif f2 == 3:
                        vals = decode_packed_u64(payload).astype(np.int64)
                    elif f2 == 8:
                        roles = decode_packed_u64(payload).astype(np.int64)
                    elif f2 == 9:
                        mem = _unpack_sint_delta(payload)
                    elif f2 == 10:
                        types = decode_packed_u64(payload).astype(np.int64)
                rels.append((rid, mem, types, roles,
                             _tags_json(keys, vals, strings), strings))

    nodes_tbl = pa.table({
        "node_id": pa.array(np.concatenate(node_ids)
                            if node_ids else np.zeros(0, np.int64)),
        "lat_nano": pa.array(np.concatenate(node_lat)
                             if node_lat else np.zeros(0, np.int64)),
        "lon_nano": pa.array(np.concatenate(node_lon)
                             if node_lon else np.zeros(0, np.int64)),
        "tags": pa.array(node_tags, pa.string()),
    })
    ways_tbl = pa.table({
        "way_id": pa.array([w[0] for w in ways], pa.int64()),
        "refs": pa.array([w[1].tolist() for w in ways],
                         pa.list_(pa.int64())),
        "tags": pa.array([w[2] for w in ways], pa.string()),
    })
    rels_tbl = pa.table({
        "rel_id": pa.array([r[0] for r in rels], pa.int64()),
        "member_ids": pa.array([r[1].tolist() for r in rels],
                               pa.list_(pa.int64())),
        "member_types": pa.array([r[2].tolist() for r in rels],
                                 pa.list_(pa.int64())),
        "member_roles": pa.array(
            [[r[5][i] for i in r[3].tolist()] for r in rels],
            pa.list_(pa.string())),
        "tags": pa.array([r[4] for r in rels], pa.string()),
    })
    return {"nodes": nodes_tbl, "ways": ways_tbl, "relations": rels_tbl}


# ---------------------------------------------------------- Dataset API

_EMPTY = {k: decode_primitive_block(b"")[k]
          for k in ("nodes", "ways", "relations")}


def read_osm(path: str, layer: str = "nodes"):
    """OSM PBF → Dataset of one layer ('nodes' | 'ways' | 'relations').

    One Ray task per OSMData blob (range read via offset/size from the
    driver-side scan); DenseNodes decode is the vectorized varint kernel.
    """
    import ray

    if layer not in _EMPTY:
        raise ValueError(f"read_osm: unknown layer {layer!r}")
    blobs = [b for b in scan_blobs(path) if b["type"] == "OSMData"]
    schema = _EMPTY[layer].schema

    def decode(batch: pa.Table) -> pa.Table:
        parts = []
        with open(path, "rb") as f:
            for off, size in zip(batch.column("offset").to_pylist(),
                                 batch.column("size").to_pylist()):
                f.seek(off)
                block = _blob_payload(f.read(size))
                parts.append(decode_primitive_block(block)[layer])
        return (pa.concat_tables(parts).combine_chunks()
                if parts else _EMPTY[layer])

    if not blobs:
        return ray.data.from_arrow(_EMPTY[layer])
    src = ray.data.from_items(
        [{"offset": b["offset"], "size": b["size"]} for b in blobs])
    ds = src.map_batches(decode, batch_format="pyarrow", batch_size=4)
    return ds.map_batches(lambda t: t.cast(schema), batch_format="pyarrow")


def way_lines(nodes_ds, ways_ds):
    """GDAL osm 'lines' layer analogue: resolve each way's node refs to
    coordinates with a DISTRIBUTED hash join (explode refs → join on
    node_id → regroup ordered by (way_id, seq)) and emit one row per way:
    way_id, n_pts, plus integer-exact endpoint/extent columns.  No node
    table ever lands on the driver (the reference does this with an
    in-process sqlite/custom node DB, osmdatasource ~GB scale; the join
    IS the cluster-native equivalent)."""
    import pyarrow.compute as pc

    def explode(b: pa.Table) -> pa.Table:
        refs = b.column("refs")
        lens = pc.list_value_length(refs).to_numpy(zero_copy_only=False)
        wid = np.repeat(b.column("way_id").to_numpy(zero_copy_only=False),
                        lens)
        seq = np.concatenate([np.arange(n, dtype=np.int64) for n in lens]) \
            if len(lens) else np.zeros(0, np.int64)
        return pa.table({
            "way_id": pa.array(wid),
            "seq": pa.array(seq),
            "node_id": pc.list_flatten(refs),
        })

    pts = ways_ds.map_batches(explode, batch_format="pyarrow")
    nodes = nodes_ds.select_columns(["node_id", "lat_nano", "lon_nano"])
    joined = pts.join(nodes, join_type="inner", num_partitions=16,
                      on=("node_id",))

    def assemble(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("seq", "ascending")])
        g = g.take(order)
        lat = g.column("lat_nano").to_numpy(zero_copy_only=False)
        lon = g.column("lon_nano").to_numpy(zero_copy_only=False)
        return pa.table({
            "way_id": pa.array([g.column("way_id")[0].as_py()], pa.int64()),
            "n_pts": pa.array([len(g)], pa.int64()),
            "lat0": pa.array([int(lat[0])], pa.int64()),
            "lon0": pa.array([int(lon[0])], pa.int64()),
            "lat1": pa.array([int(lat[-1])], pa.int64()),
            "lon1": pa.array([int(lon[-1])], pa.int64()),
            "lat_min": pa.array([int(lat.min())], pa.int64()),
            "lon_min": pa.array([int(lon.min())], pa.int64()),
        })

    return joined.groupby("way_id").map_groups(assemble,
                                               batch_format="pyarrow")


# --------------------------------------------------------------- writer

def _string_table(tag_dicts: list[dict]) -> tuple[bytes, dict]:
    """Build the block string table ('' is always index 0 per spec)."""
    idx: dict[str, int] = {"": 0}
    for d in tag_dicts:
        for k, v in d.items():
            idx.setdefault(k, len(idx))
            idx.setdefault(v, len(idx))
    st = bytearray()
    for s in idx:
        _put_len(st, 1, s.encode("utf-8"))
    return bytes(st), idx


def _wrap_blob(btype: str, block: bytes, *, compress: bool = True) -> bytes:
    blob = bytearray()
    if compress:
        _put_tag(blob, 2, _WT_VARINT)
        _put_uv(blob, len(block))
        _put_len(blob, 3, zlib.compress(block, 6))
    else:
        _put_len(blob, 1, block)
    hdr = bytearray()
    _put_len(hdr, 1, btype.encode())
    _put_tag(hdr, 3, _WT_VARINT)
    _put_uv(hdr, len(blob))
    return struct.pack(">i", len(hdr)) + bytes(hdr) + bytes(blob)


def encode_primitive_block(*, node_ids=None, lat_nano=None, lon_nano=None,
                           node_tags=None, ways=None, relations=None,
                           compress: bool = True) -> bytes:
    """One PrimitiveBlock (granularity 100, zero offsets) → framed blob
    bytes.  lat/lon are integer NANODEGREES and must be multiples of the
    granularity (exactness is the point: the round trip is bit-lossless).
    ways: [(way_id, refs, tags_dict)]; relations:
    [(rel_id, member_ids, member_types, member_roles, tags_dict)]."""
    GRAN = 100
    node_ids = np.asarray(node_ids if node_ids is not None else [],
                          np.int64)
    node_tags = list(node_tags) if node_tags is not None \
        else [{}] * len(node_ids)
    ways = ways or []
    relations = relations or []
    all_tags = (node_tags + [w[2] for w in ways]
                + [r[4] for r in relations]
                + [dict.fromkeys(r[3], "") for r in relations])
    st, idx = _string_table(all_tags)

    block = bytearray()
    _put_len(block, 1, st)

    if len(node_ids):
        lat = np.asarray(lat_nano, np.int64)
        lon = np.asarray(lon_nano, np.int64)
        if ((lat % GRAN) != 0).any() or ((lon % GRAN) != 0).any():
            raise ValueError("osmpbf: nanodegree coords must be multiples "
                             f"of granularity {GRAN}")
        dense = bytearray()
        _put_len(dense, 1, _packed_sint_delta(node_ids))
        _put_len(dense, 8, _packed_sint_delta(lat // GRAN))
        _put_len(dense, 9, _packed_sint_delta(lon // GRAN))
        kv: list[int] = []
        for d in node_tags:
            for k, v in d.items():
                kv += [idx[k], idx[v]]
            kv.append(0)
        _put_len(dense, 10, encode_packed_u64(np.asarray(kv, np.uint64)))
        grp = bytearray()
        _put_len(grp, 2, bytes(dense))
        _put_len(block, 2, bytes(grp))

    if ways:
        grp = bytearray()
        for wid, refs, tags in ways:
            w = bytearray()
            _put_tag(w, 1, _WT_VARINT)
            _put_uv(w, wid)
            keys = np.asarray([idx[k] for k in tags], np.uint64)
            vals = np.asarray([idx[v] for v in tags.values()], np.uint64)
            _put_len(w, 2, encode_packed_u64(keys))
            _put_len(w, 3, encode_packed_u64(vals))
            _put_len(w, 8, _packed_sint_delta(np.asarray(refs, np.int64)))
            _put_len(grp, 3, bytes(w))
        _put_len(block, 2, bytes(grp))

    if relations:
        grp = bytearray()
        for rid, mids, mtypes, roles, tags in relations:
            r = bytearray()
            _put_tag(r, 1, _WT_VARINT)
            _put_uv(r, rid)
            keys = np.asarray([idx[k] for k in tags], np.uint64)
            vals = np.asarray([idx[v] for v in tags.values()], np.uint64)
            _put_len(r, 2, encode_packed_u64(keys))
            _put_len(r, 3, encode_packed_u64(vals))
            _put_len(r, 8, encode_packed_u64(
                np.asarray([idx[x] for x in roles], np.uint64)))
            _put_len(r, 9, _packed_sint_delta(np.asarray(mids, np.int64)))
            _put_len(r, 10, encode_packed_u64(
                np.asarray(mtypes, np.uint64)))
            _put_len(grp, 4, bytes(r))
        _put_len(block, 2, bytes(grp))

    _put_tag(block, 17, _WT_VARINT)
    _put_uv(block, GRAN)
    return _wrap_blob("OSMData", bytes(block), compress=compress)


def _header_blob(bbox_nano=None) -> bytes:
    hb = bytearray()
    if bbox_nano is not None:
        bb = bytearray()
        for field, v in zip((1, 2, 3, 4), bbox_nano):
            _put_tag(bb, field, _WT_VARINT)
            _put_uv(bb, int(_zz(np.asarray([v], np.int64))[0]))
        _put_len(hb, 1, bytes(bb))
    _put_len(hb, 4, b"OsmSchema-V0.6")
    _put_len(hb, 4, b"DenseNodes")
    _put_len(hb, 16, b"gdal_ray")
    return _wrap_blob("OSMHeader", bytes(hb))


def write_osm_pbf(path: str, *, node_ids=None, lat_nano=None, lon_nano=None,
                  node_tags=None, ways=None, relations=None,
                  block_rows: int = 8000, compress: bool = True,
                  bbox_nano=None) -> int:
    """Serialize node/way/relation tables to an OSM PBF file (fixture
    writer + export door; deterministic bytes).  Nodes split into
    DenseNodes blocks of `block_rows`.  Atomic tmp+rename; returns bytes
    written."""
    node_ids = np.asarray(node_ids if node_ids is not None else [],
                          np.int64)
    node_tags = list(node_tags) if node_tags is not None \
        else [{}] * len(node_ids)
    out = bytearray(_header_blob(bbox_nano))
    for s in range(0, max(len(node_ids), 1), block_rows):
        if len(node_ids) == 0:
            break
        e = min(s + block_rows, len(node_ids))
        out += encode_primitive_block(
            node_ids=node_ids[s:e],
            lat_nano=np.asarray(lat_nano, np.int64)[s:e],
            lon_nano=np.asarray(lon_nano, np.int64)[s:e],
            node_tags=node_tags[s:e], compress=compress)
    if ways or relations:
        out += encode_primitive_block(ways=ways, relations=relations,
                                      compress=compress)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out)
    os.replace(tmp, path)
    return len(out)


def osm_info(path: str) -> dict:
    """gdalinfo/ogrinfo-door summary: blob counts + per-layer feature
    counts (decodes every block; fine for the info door's use)."""
    blobs = scan_blobs(path)
    counts = {"nodes": 0, "ways": 0, "relations": 0}
    with open(path, "rb") as f:
        for b in blobs:
            if b["type"] != "OSMData":
                continue
            f.seek(b["offset"])
            dec = decode_primitive_block(_blob_payload(f.read(b["size"])))
            for k in counts:
                counts[k] += len(dec[k])
    return {"driver": "OSM PBF", "n_blobs": len(blobs), **counts}
