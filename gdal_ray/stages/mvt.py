"""Mapbox Vector Tiles (MVT) encoder/decoder, implemented from the public
Mapbox Vector Tile specification 2.1 — no protobuf library.

Reference semantics: ogr/ogrsf_frmts/mvt/mvt_tile.cpp (geometry command
stream: MoveTo/LineTo/ClosePath command integers with zigzag deltas) and
mvtutils.cpp (layer schema: version 2, name, extent, key/value tables,
per-feature tag index pairs).  The wire format is standard protobuf:

    Tile   { repeated Layer layers = 3; }
    Layer  { uint32 version = 15; string name = 1;
             repeated Feature features = 2; repeated string keys = 3;
             repeated Value values = 4; uint32 extent = 5 (default 4096); }
    Feature{ uint64 id = 1; packed uint32 tags = 2; GeomType type = 3;
             packed uint32 geometry = 4; }
    Value  { oneof: string=1 float=2 double=3 int=4 uint=5 sint=6 bool=7 }

Geometry command integers: (cmd_id & 0x7) | (count << 3) with MoveTo=1
(2 params per point), LineTo=2, ClosePath=7 (no params); parameters are
zigzag-encoded coordinate deltas from the running cursor.

Scale shape: a tile is a small self-contained blob; encode/decode run per
tile inside map_batches / map_groups over the tile-keyed partitioning the
rest of the engine already uses — pixels and features shuffle once (the
tile groupby), bytes never do.  Within a tile, delta/zigzag math is numpy
over all vertices of a feature; the per-feature assembly loop is bounded
by features-per-tile, not corpus size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EXTENT_DEFAULT = 4096

GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 1, 2, 3
_CMD_MOVETO, _CMD_LINETO, _CMD_CLOSEPATH = 1, 2, 7

# protobuf wire types
_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5


# ----------------------------------------------------------------- varint


def _put_varint(out: bytearray, v: int) -> None:
    v &= (1 << 64) - 1
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _get_varint(buf: bytes, pos: int) -> tuple[int, int]:
    val = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if b < 0x80:
            return val, pos
        shift += 7


def _put_tag(out: bytearray, field: int, wt: int) -> None:
    _put_varint(out, (field << 3) | wt)


def _put_len_field(out: bytearray, field: int, payload: bytes) -> None:
    _put_tag(out, field, _WT_LEN)
    _put_varint(out, len(payload))
    out += payload


def _zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def _unzigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64)
    return ((v >> np.uint64(1)).astype(np.int64)
            ^ -(v & np.uint64(1)).astype(np.int64))


# ----------------------------------------------------------------- values


def _encode_value(v) -> bytes:
    out = bytearray()
    if isinstance(v, bool):
        _put_tag(out, 7, _WT_VARINT)
        _put_varint(out, 1 if v else 0)
    elif isinstance(v, (int, np.integer)):
        v = int(v)
        if v >= 0:
            _put_tag(out, 4, _WT_VARINT)  # int_value
            _put_varint(out, v)
        else:
            _put_tag(out, 6, _WT_VARINT)  # sint_value (zigzag)
            _put_varint(out, (v << 1) ^ (v >> 63))
    elif isinstance(v, (float, np.floating)):
        import struct

        _put_tag(out, 3, _WT_I64)  # double_value
        out += struct.pack("<d", float(v))
    elif isinstance(v, str):
        _put_len_field(out, 1, v.encode("utf-8"))
    else:
        raise TypeError(f"unsupported MVT value type {type(v)}")
    return bytes(out)


def _decode_value(buf: bytes):
    import struct

    pos = 0
    while pos < len(buf):
        key, pos = _get_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if field == 1 and wt == _WT_LEN:
            ln, pos = _get_varint(buf, pos)
            return buf[pos:pos + ln].decode("utf-8")
        if field == 2 and wt == _WT_I32:
            return struct.unpack_from("<f", buf, pos)[0]
        if field == 3 and wt == _WT_I64:
            return struct.unpack_from("<d", buf, pos)[0]
        if field in (4, 5) and wt == _WT_VARINT:
            v, pos = _get_varint(buf, pos)
            return v
        if field == 6 and wt == _WT_VARINT:
            v, pos = _get_varint(buf, pos)
            return (v >> 1) ^ -(v & 1)
        if field == 7 and wt == _WT_VARINT:
            v, pos = _get_varint(buf, pos)
            return bool(v)
        pos = _skip_field(buf, pos, wt)
    return None


# ----------------------------------------------------------------- geometry


def encode_geometry(geom_type: int, parts: list[np.ndarray]) -> np.ndarray:
    """parts: list of (n, 2) int arrays of tile-local coordinates.

    POINT: all parts concatenated become one MoveTo run (multipoint when
    total > 1).  LINESTRING: per part MoveTo(1) + LineTo(n-1).
    POLYGON: per ring MoveTo(1) + LineTo(n-1) + ClosePath (rings must NOT
    repeat the closing vertex — mvt_tile.cpp drops it on encode).
    Returns the uint32 command-integer stream.
    """
    cmds: list[np.ndarray] = []
    cx = cy = 0
    if geom_type == GEOM_POINT:
        pts = np.concatenate(parts, axis=0).astype(np.int64)
        dx = np.diff(np.concatenate([[cx], pts[:, 0]]))
        dy = np.diff(np.concatenate([[cy], pts[:, 1]]))
        params = np.empty(2 * len(pts), dtype=np.uint64)
        params[0::2] = _zigzag(dx)
        params[1::2] = _zigzag(dy)
        head = np.array([(_CMD_MOVETO) | (len(pts) << 3)], dtype=np.uint64)
        cmds = [head, params]
        return np.concatenate(cmds).astype(np.uint32)
    for part in parts:
        part = np.asarray(part, dtype=np.int64)
        n = len(part)
        if n < (2 if geom_type == GEOM_LINESTRING else 3):
            raise ValueError(f"part too short for geom type {geom_type}: {n}")
        dx = np.diff(np.concatenate([[cx], part[:, 0]]))
        dy = np.diff(np.concatenate([[cy], part[:, 1]]))
        params = np.empty(2 * n, dtype=np.uint64)
        params[0::2] = _zigzag(dx)
        params[1::2] = _zigzag(dy)
        seg = [
            np.array([_CMD_MOVETO | (1 << 3)], dtype=np.uint64),
            params[:2],
            np.array([_CMD_LINETO | ((n - 1) << 3)], dtype=np.uint64),
            params[2:],
        ]
        if geom_type == GEOM_POLYGON:
            seg.append(np.array([_CMD_CLOSEPATH | (1 << 3)], dtype=np.uint64))
        cmds += seg
        cx, cy = int(part[-1, 0]), int(part[-1, 1])
    return np.concatenate(cmds).astype(np.uint32)


def decode_geometry(geom_type: int, stream) -> list[np.ndarray]:
    """Command-integer stream -> list of (n, 2) absolute-coordinate parts
    (rings NOT re-closed; ClosePath is implicit, matching encode)."""
    s = np.asarray(stream, dtype=np.uint64)
    parts: list[np.ndarray] = []
    cx = cy = 0
    i = 0
    cur: list[tuple[int, int]] = []
    while i < len(s):
        cmd = int(s[i]) & 0x7
        count = int(s[i]) >> 3
        i += 1
        if cmd == _CMD_CLOSEPATH:
            if cur:
                parts.append(np.array(cur, dtype=np.int64))
                cur = []
            continue
        if cmd not in (_CMD_MOVETO, _CMD_LINETO):
            raise ValueError(f"bad MVT command {cmd}")
        params = s[i:i + 2 * count]
        i += 2 * count
        dx = _unzigzag(params[0::2])
        dy = _unzigzag(params[1::2])
        xs = cx + np.cumsum(dx)
        ys = cy + np.cumsum(dy)
        if cmd == _CMD_MOVETO and count >= 1:
            if cur:
                parts.append(np.array(cur, dtype=np.int64))
                cur = []
            if geom_type == GEOM_POINT:
                parts += [np.array([[x, y]], dtype=np.int64)
                          for x, y in zip(xs, ys)]
            else:
                cur = [(int(x), int(y)) for x, y in zip(xs, ys)]
        else:  # LineTo
            cur += [(int(x), int(y)) for x, y in zip(xs, ys)]
        if len(xs):
            cx, cy = int(xs[-1]), int(ys[-1])
    if cur:
        parts.append(np.array(cur, dtype=np.int64))
    return parts


# ----------------------------------------------------------------- layer


def encode_layer(name: str, features: list[dict], *,
                 extent: int = EXTENT_DEFAULT) -> bytes:
    """features: dicts with keys
        type: GEOM_* int
        parts: list of (n,2) int arrays (tile-local coords)
        id: optional int
        props: optional dict[str, str|int|float|bool]
    Key/value tables are deduplicated across the layer (mvtutils.cpp
    FindOrAddKey/FindOrAddValue semantics)."""
    keys: list[str] = []
    key_idx: dict[str, int] = {}
    vals: list[bytes] = []
    val_idx: dict[bytes, int] = {}
    feat_blobs: list[bytes] = []
    for f in features:
        body = bytearray()
        if f.get("id") is not None:
            _put_tag(body, 1, _WT_VARINT)
            _put_varint(body, int(f["id"]))
        props = f.get("props") or {}
        if props:
            tags = bytearray()
            for k, v in props.items():
                if k not in key_idx:
                    key_idx[k] = len(keys)
                    keys.append(k)
                enc = _encode_value(v)
                if enc not in val_idx:
                    val_idx[enc] = len(vals)
                    vals.append(enc)
                _put_varint(tags, key_idx[k])
                _put_varint(tags, val_idx[enc])
            _put_len_field(body, 2, bytes(tags))
        _put_tag(body, 3, _WT_VARINT)
        _put_varint(body, int(f["type"]))
        geom = encode_geometry(int(f["type"]), f["parts"])
        gbuf = bytearray()
        for g in geom.tolist():
            _put_varint(gbuf, g)
        _put_len_field(body, 4, bytes(gbuf))
        feat_blobs.append(bytes(body))

    out = bytearray()
    _put_tag(out, 15, _WT_VARINT)
    _put_varint(out, 2)  # version
    _put_len_field(out, 1, name.encode("utf-8"))
    for blob in feat_blobs:
        _put_len_field(out, 2, blob)
    for k in keys:
        _put_len_field(out, 3, k.encode("utf-8"))
    for v in vals:
        _put_len_field(out, 4, v)
    if extent != EXTENT_DEFAULT:
        _put_tag(out, 5, _WT_VARINT)
        _put_varint(out, extent)
    return bytes(out)


def encode_tile(layers: dict[str, list[dict]] | list[tuple[str, bytes]],
                *, extent: int = EXTENT_DEFAULT) -> bytes:
    """dict name->features (encoded here) or pre-encoded (name, bytes)."""
    out = bytearray()
    if isinstance(layers, dict):
        for name, feats in layers.items():
            _put_len_field(out, 3, encode_layer(name, feats, extent=extent))
    else:
        for _, blob in layers:
            _put_len_field(out, 3, blob)
    return bytes(out)


def _skip_field(buf: bytes, pos: int, wt: int) -> int:
    if wt == _WT_VARINT:
        while buf[pos] >= 0x80:
            pos += 1
        return pos + 1
    if wt == _WT_I64:
        return pos + 8
    if wt == _WT_I32:
        return pos + 4
    if wt == _WT_LEN:
        ln, pos = _get_varint(buf, pos)
        return pos + ln
    raise ValueError(f"bad wire type {wt}")


def _decode_feature(buf: bytes) -> dict:
    pos = 0
    f: dict = {"id": None, "tags": [], "type": None, "geometry": []}
    while pos < len(buf):
        key, pos = _get_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if field == 1 and wt == _WT_VARINT:
            f["id"], pos = _get_varint(buf, pos)
        elif field == 2:  # packed tags
            ln, pos = _get_varint(buf, pos)
            end = pos + ln
            while pos < end:
                v, pos = _get_varint(buf, pos)
                f["tags"].append(v)
        elif field == 3 and wt == _WT_VARINT:
            f["type"], pos = _get_varint(buf, pos)
        elif field == 4:  # packed geometry
            ln, pos = _get_varint(buf, pos)
            end = pos + ln
            while pos < end:
                v, pos = _get_varint(buf, pos)
                f["geometry"].append(v)
        else:
            pos = _skip_field(buf, pos, wt)
    f["parts"] = decode_geometry(f["type"], f["geometry"])
    return f


def _decode_layer(buf: bytes) -> dict:
    pos = 0
    layer: dict = {"version": 1, "name": "", "features": [], "keys": [],
                   "values": [], "extent": EXTENT_DEFAULT}
    while pos < len(buf):
        key, pos = _get_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if field == 15 and wt == _WT_VARINT:
            layer["version"], pos = _get_varint(buf, pos)
        elif field == 1 and wt == _WT_LEN:
            ln, pos = _get_varint(buf, pos)
            layer["name"] = buf[pos:pos + ln].decode("utf-8")
            pos += ln
        elif field == 2 and wt == _WT_LEN:
            ln, pos = _get_varint(buf, pos)
            layer["features"].append(_decode_feature(buf[pos:pos + ln]))
            pos += ln
        elif field == 3 and wt == _WT_LEN:
            ln, pos = _get_varint(buf, pos)
            layer["keys"].append(buf[pos:pos + ln].decode("utf-8"))
            pos += ln
        elif field == 4 and wt == _WT_LEN:
            ln, pos = _get_varint(buf, pos)
            layer["values"].append(_decode_value(buf[pos:pos + ln]))
            pos += ln
        elif field == 5 and wt == _WT_VARINT:
            layer["extent"], pos = _get_varint(buf, pos)
        else:
            pos = _skip_field(buf, pos, wt)
    for f in layer["features"]:
        f["props"] = {
            layer["keys"][f["tags"][i]]: layer["values"][f["tags"][i + 1]]
            for i in range(0, len(f["tags"]), 2)
        }
    return layer


def decode_tile(buf: bytes) -> list[dict]:
    """MVT tile bytes -> list of layer dicts (features carry decoded
    absolute tile-local geometry in `parts` and materialized `props`)."""
    pos = 0
    layers = []
    while pos < len(buf):
        key, pos = _get_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if field == 3 and wt == _WT_LEN:
            ln, pos = _get_varint(buf, pos)
            layers.append(_decode_layer(buf[pos:pos + ln]))
            pos += ln
        else:
            pos = _skip_field(buf, pos, wt)
    return layers


# --------------------------------------------------------------- stages


def encode_point_tiles(assigned, *, zoom: int, layer_name: str = "points",
                       extent: int = EXTENT_DEFAULT, id_col: str = "point_id",
                       props_cols: dict[str, str] | None = None):
    """Dataset of pre-quantized point rows (x, y, qx, qy, id_col [, prop
    source cols]) -> Dataset (z, x, y, mvt:binary), one MVT tile per (x,y)
    via the tile-keyed groupby — the engine's single spatial shuffle.
    props_cols: {mvt_property_name: column} copied into feature props."""
    props_cols = props_cols or {}

    def build(g: pa.Table) -> pa.Table:
        tx = int(g.column("x")[0].as_py())
        ty = int(g.column("y")[0].as_py())
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        qx = g.column("qx").to_numpy(zero_copy_only=False)
        qy = g.column("qy").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")  # deterministic tile bytes
        prop_arrs = {p: g.column(c).to_numpy(zero_copy_only=False)
                     for p, c in props_cols.items()}
        feats = []
        for i in order:
            feats.append({
                "type": GEOM_POINT,
                "parts": [np.array([[qx[i], qy[i]]], dtype=np.int64)],
                "id": int(ids[i]),
                "props": {p: a[i].item() if hasattr(a[i], "item") else a[i]
                          for p, a in prop_arrs.items()},
            })
        blob = encode_tile({layer_name: feats}, extent=extent)
        return pa.table({
            "z": pa.array([zoom], pa.int64()),
            "x": pa.array([tx], pa.int64()),
            "y": pa.array([ty], pa.int64()),
            "mvt": pa.array([blob], pa.binary()),
        })

    return assigned.groupby(["x", "y"]).map_groups(build, batch_format="pyarrow")


def quantize_points_batch(b: pa.Table, *, zoom: int, lon_col: str = "px",
                          lat_col: str = "py", extent: int = EXTENT_DEFAULT,
                          keep: list[str] | None = None) -> pa.Table:
    """lon/lat -> (x, y, qx, qy): XYZ mercator tile + tile-local MVT
    coordinates (y down from tile top), clipped to [0, extent-1].  Mirrors
    tilemath.lonlat_to_tile_xyz so a SQL oracle can reproduce it exactly."""
    from gdal_ray import tilemath as tm

    lon = b.column(lon_col).to_numpy()
    lat = np.clip(b.column(lat_col).to_numpy(), -tm.MAX_LATITUDE, tm.MAX_LATITUDE)
    mx, my = tm.lonlat_to_meters(lon, lat)
    n = np.int64(1) << np.int64(zoom)
    res = tm.INITIAL_RESOLUTION / float(n)
    pgx = (mx + tm.ORIGIN_SHIFT) / res / 256.0   # tile units from west
    pgy = (my + tm.ORIGIN_SHIFT) / res / 256.0   # tile units from south (TMS)
    x = np.clip(np.ceil(pgx).astype(np.int64) - 1, 0, n - 1)
    ty_tms = np.clip(np.ceil(pgy).astype(np.int64) - 1, 0, n - 1)
    y = (n - 1) - ty_tms
    qx = np.clip(np.floor((pgx - x) * extent).astype(np.int64), 0, extent - 1)
    qy = np.clip(np.floor(((n - pgy) - y) * extent).astype(np.int64), 0, extent - 1)
    cols = {
        "x": pa.array(x, pa.int64()),
        "y": pa.array(y, pa.int64()),
        "qx": pa.array(qx, pa.int64()),
        "qy": pa.array(qy, pa.int64()),
    }
    for k in keep or []:
        cols[k] = b.column(k)
    return pa.table(cols)


# ---- generic vector → MVT tiling (the `vectortiles` CLI door) --------------
#
# Cover/clip/quantize each feature to its zoom-Z tiles inside map_batches,
# then ONE groupby((z,x,y)) builds tile blobs — the same single spatial
# shuffle as encode_point_tiles, generalized to lines and polygons
# (reference: ogr/ogrsf_frmts/mvt/mvtutils.cpp, which clips through GEOS;
# here rings clip with Sutherland–Hodgman `clip_ring_box` and lines with
# Liang–Barsky `clip_line_box`, both in tile units).  Holes are clipped
# per-ring (documented deviation: a hole that crosses the tile edge keeps
# its clipped shape; the reference re-noded topology via GEOS).


def _tile_units(coords: np.ndarray, zoom: int) -> np.ndarray:
    """lon/lat columns -> global WebMercator tile units at `zoom`
    (x right from -180, y down from the top latitude)."""
    from gdal_ray import tilemath as tm

    n = float(1 << zoom)
    lon = coords[:, 0]
    lat = np.clip(coords[:, 1], -tm.MAX_LATITUDE, tm.MAX_LATITUDE)
    mx = (lon + 180.0) / 360.0 * n
    lat_r = np.radians(lat)
    my = (1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n
    return np.stack([mx, my], axis=1)


def _pack_parts(parts: list[np.ndarray]) -> bytes:
    chunks = [np.asarray([len(parts)], np.int64).tobytes()]
    for p in parts:
        chunks.append(np.asarray([len(p)], np.int64).tobytes())
        chunks.append(np.ascontiguousarray(p, dtype=np.int64).tobytes())
    return b"".join(chunks)


def _unpack_parts(blob: bytes) -> list[np.ndarray]:
    npart = int(np.frombuffer(blob, np.int64, 1)[0])
    off = 8
    parts = []
    for _ in range(npart):
        k = int(np.frombuffer(blob, np.int64, 1, off)[0])
        off += 8
        parts.append(np.frombuffer(blob, np.int64, 2 * k, off).reshape(k, 2))
        off += 16 * k
    return parts


def geometry_cover_batch(b: pa.Table, *, zoom: int,
                         extent: int = EXTENT_DEFAULT,
                         props: list[str] | None = None) -> pa.Table:
    """(wkb [, prop columns]) rows -> per-(tile, feature) rows
    (z, x, y, gtype, parts:binary, props:json-string), clipped and
    quantized to tile-local integers."""
    import json as _json

    from gdal_ray.geometry.ops import clip_line_box, clip_ring_box
    from gdal_ray.sources.geojson import wkb_to_geometry

    props = props or []
    n = 1 << zoom
    out = {"z": [], "x": [], "y": [], "gtype": [], "parts": [], "props": []}
    prop_cols = {p: b.column(p).to_pylist() for p in props}
    for i, wkb in enumerate(b.column("wkb").to_pylist()):
        geom = wkb_to_geometry(wkb)
        t = geom["type"]
        pj = _json.dumps({p: prop_cols[p][i] for p in props}, sort_keys=True)
        if t in ("Point", "MultiPoint"):
            pts = np.asarray([geom["coordinates"]] if t == "Point"
                             else geom["coordinates"], np.float64)
            gt, shapes = GEOM_POINT, [pts]
        elif t in ("LineString", "MultiLineString"):
            ls = ([geom["coordinates"]] if t == "LineString"
                  else geom["coordinates"])
            gt, shapes = GEOM_LINESTRING, [np.asarray(l, np.float64)
                                           for l in ls]
        else:
            polys = ([geom["coordinates"]] if t == "Polygon"
                     else geom["coordinates"])
            gt = GEOM_POLYGON
            shapes = [np.asarray(r, np.float64)
                      for rings in polys for r in rings]
        units = [_tile_units(s, zoom) for s in shapes]
        allu = np.concatenate(units)
        tx0 = max(int(np.floor(allu[:, 0].min())), 0)
        tx1 = min(int(np.floor(allu[:, 0].max())), n - 1)
        ty0 = max(int(np.floor(allu[:, 1].min())), 0)
        ty1 = min(int(np.floor(allu[:, 1].max())), n - 1)
        for ty in range(ty0, ty1 + 1):
            for tx in range(tx0, tx1 + 1):
                parts = []
                for u in units:
                    if gt == GEOM_POINT:
                        sel = ((u[:, 0] >= tx) & (u[:, 0] < tx + 1)
                               & (u[:, 1] >= ty) & (u[:, 1] < ty + 1))
                        if sel.any():
                            clipped = [u[sel]]
                        else:
                            clipped = []
                    elif gt == GEOM_LINESTRING:
                        clipped = clip_line_box(u, tx, ty, tx + 1, ty + 1)
                    else:
                        r = clip_ring_box(u, tx, ty, tx + 1, ty + 1)
                        clipped = [r] if len(r) >= 3 else []
                    for c in clipped:
                        q = np.round((c - [tx, ty]) * extent).astype(np.int64)
                        keep = np.ones(len(q), bool)
                        keep[1:] = (np.diff(q, axis=0) != 0).any(axis=1)
                        q = q[keep]
                        if gt == GEOM_POINT or \
                           (gt == GEOM_LINESTRING and len(q) >= 2) or \
                           (gt == GEOM_POLYGON and len(q) >= 3):
                            parts.append(q)
                if parts:
                    out["z"].append(zoom)
                    out["x"].append(tx)
                    out["y"].append(ty)
                    out["gtype"].append(gt)
                    out["parts"].append(_pack_parts(parts))
                    out["props"].append(pj)
    return pa.table({
        "z": pa.array(out["z"], pa.int64()),
        "x": pa.array(out["x"], pa.int64()),
        "y": pa.array(out["y"], pa.int64()),
        "gtype": pa.array(out["gtype"], pa.int64()),
        "parts": pa.array(out["parts"], pa.binary()),
        "props": pa.array(out["props"], pa.string()),
    })


def build_mixed_tile(layer_name: str = "layer",
                     extent: int = EXTENT_DEFAULT):
    """groupby((z,x,y)) finalizer for geometry_cover_batch rows -> one
    (z, x, y, mvt) row; features sorted by (props, bytes) so tile blobs
    are deterministic across partitionings."""
    import json as _json

    def build(g: pa.Table) -> pa.Table:
        z = int(g.column("z")[0].as_py())
        x = int(g.column("x")[0].as_py())
        y = int(g.column("y")[0].as_py())
        rows = sorted(
            zip(g.column("props").to_pylist(),
                g.column("gtype").to_pylist(),
                g.column("parts").to_pylist()),
            key=lambda r: (r[0], r[2]))
        feats = [{"type": int(gt), "parts": _unpack_parts(blob),
                  "props": _json.loads(pj)}
                 for pj, gt, blob in rows]
        blob = encode_tile([(layer_name,
                             encode_layer(layer_name, feats,
                                          extent=extent))])
        return pa.table({
            "z": pa.array([z], pa.int64()),
            "x": pa.array([x], pa.int64()),
            "y": pa.array([y], pa.int64()),
            "mvt": pa.array([blob], pa.binary()),
        })

    return build
