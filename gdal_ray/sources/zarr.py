"""Zarr v2 raster store driver — directory of JSON metadata + compressed
C-order chunks, implemented from the public Zarr v2 spec (no zarr-python).

Reference semantics: frmts/zarr (zarrdriver.cpp / zarrv2group.cpp) — the
reference reads/writes the same on-disk layout: a `.zarray` JSON document
(shape, chunks, dtype, compressor, fill_value, order) beside chunk files
named ``<i>.<j>`` (dimension_separator "." by default, "/" supported).

Scope: 2-D (and 2-D + trailing channel) arrays, C order, compressor
``zlib``/``gzip`` or null (raw) — the subset that needs no external
codec library.  Edge chunks are stored full-size, padded with
fill_value, per the v2 spec.

Scale shape: chunks are the parallel unit in both directions — a read
enumerates chunk indices driver-side (pure arithmetic on shape/chunks)
and each Ray task opens only its chunk files; a write fans chunks out
via map_batches so every task writes its own files (atomic tmp+rename)
and only the tiny per-chunk summary returns to the driver.  The .zarray
metadata is one tiny driver-side JSON write.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pyarrow as pa

_SUPPORTED_COMPRESSORS = ("zlib", "gzip", "zstd", "blosc", None)


def _dtype_str(dt: np.dtype) -> str:
    """numpy dtype -> zarr v2 dtype string ('<f8', '>i4', '|u1', ...)."""
    return np.dtype(dt).str


def _compress(raw: bytes, compressor: str | None, level: int,
              typesize: int = 1) -> bytes:
    if compressor is None:
        return raw
    if compressor == "zlib":
        return zlib.compress(raw, level)
    if compressor == "gzip":
        import gzip

        return gzip.compress(raw, compresslevel=level)
    if compressor == "zstd":
        from gdal_ray.compress import zstd_compress

        return zstd_compress(raw, level if level else 9)
    if compressor == "blosc":
        from gdal_ray.compress import blosc_compress

        return blosc_compress(raw, typesize=typesize, codec="lz4",
                              level=level if level else 5)
    raise NotImplementedError(f"compressor {compressor!r}")


def _decompress(blob: bytes, compressor: str | None) -> bytes:
    if compressor is None:
        return blob
    if compressor == "zlib":
        return zlib.decompress(blob)
    if compressor == "gzip":
        import gzip

        return gzip.decompress(blob)
    if compressor == "zstd":
        from gdal_ray.compress import zstd_decompress

        return zstd_decompress(blob)
    if compressor == "blosc":
        # blosc frames are self-describing (header carries the inner
        # codec, shuffle flag and typesize)
        from gdal_ray.compress import blosc_decompress

        return blosc_decompress(blob)
    raise NotImplementedError(f"compressor {compressor!r}")


_V3_DTYPES = {
    "bool": "|b1", "int8": "|i1", "uint8": "|u1",
    "int16": "<i2", "uint16": "<u2", "int32": "<i4", "uint32": "<u4",
    "int64": "<i8", "uint64": "<u8", "float32": "<f4", "float64": "<f8",
}
_V3_NAMES = {np.dtype(v).str.lstrip("|<>="): k for k, v in _V3_DTYPES.items()}


_CRC32C_TABLE = None


def _crc32c(data: bytes) -> int:
    """Software CRC-32C (Castagnoli, reflected poly 0x82F63B78) — the
    checksum zarr v3's sharding index uses; no crc32c lib in sandbox.
    Check value: crc32c(b"123456789") == 0xE3069283 (pytest-pinned)."""
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        tab = np.empty(256, dtype=np.uint32)
        for i in range(256):
            c = np.uint32(i)
            for _ in range(8):
                c = (c >> np.uint32(1)) ^ (np.uint32(0x82F63B78)
                                           if c & np.uint32(1) else np.uint32(0))
            tab[i] = c
        _CRC32C_TABLE = tab
    crc = np.uint32(0xFFFFFFFF)
    tab = _CRC32C_TABLE
    for b in data:
        crc = tab[(crc ^ np.uint32(b)) & np.uint32(0xFF)] ^ (crc >> np.uint32(8))
    return int(crc ^ np.uint32(0xFFFFFFFF))


def _parse_inner_codecs(codecs: list, dtype: str):
    comp = None
    for codec in codecs or [{"name": "bytes"}]:
        name = codec["name"]
        if name == "bytes":
            endian = codec.get("configuration", {}).get("endian", "little")
            if np.dtype(dtype).itemsize > 1:
                dtype = ("<" if endian == "little" else ">") + dtype[1:]
        elif name == "gzip":
            comp = {"id": "gzip",
                    "level": codec.get("configuration", {}).get("level", 1)}
        elif name == "zstd":
            comp = {"id": "zstd",
                    "level": codec.get("configuration", {}).get("level", 9)}
        else:
            raise NotImplementedError(f"zarr v3 codec {name!r} "
                                      "(no codec lib in sandbox)")
    return comp, dtype


def _shard_index_size(n_inner: int, crc: bool) -> int:
    return n_inner * 16 + (4 if crc else 0)


def _encode_shard(block: np.ndarray, inner: tuple, comp, level: int,
                  fill_value, crc: bool, index_location: str) -> bytes:
    """Shard container (zarr v3 sharding_indexed, index at end/start):
    encoded inner chunks back to back + uint64-LE (offset, nbytes) pairs
    in C order over the inner grid (2^64-1 pairs for omitted fill-only
    chunks) + optional CRC-32C of the index."""
    grid = _grid(block.shape, inner)
    n_inner = int(np.prod(grid))
    payloads: list[bytes | None] = []
    fill = fill_value if fill_value is not None else 0
    for idx in np.ndindex(*grid):
        sub = _pad_chunk(block, idx, inner, fill)
        if np.all(sub == np.asarray(fill, dtype=block.dtype)):
            payloads.append(None)  # omitted: reads as fill per spec
            continue
        raw = sub.tobytes()
        payloads.append(_compress(raw, comp["id"] if comp else None,
                                  comp["level"] if comp else level))
    idx_size = _shard_index_size(n_inner, crc)
    body = bytearray()
    entries = np.full((n_inner, 2), np.uint64(0xFFFFFFFFFFFFFFFF),
                      dtype=np.uint64)
    base = idx_size if index_location == "start" else 0
    for i, p in enumerate(payloads):
        if p is None:
            continue
        entries[i, 0] = np.uint64(base + len(body))
        entries[i, 1] = np.uint64(len(p))
        body += p
    index = entries.tobytes()
    if crc:
        index += int(_crc32c(index)).to_bytes(4, "little")
    if index_location == "start":
        return index + bytes(body)
    return bytes(body) + index


def _decode_shard(raw: bytes, shard_shape: tuple, inner: tuple, dtype,
                  comp, fill_value, crc: bool,
                  index_location: str) -> np.ndarray:
    grid = _grid(shard_shape, inner)
    n_inner = int(np.prod(grid))
    idx_size = _shard_index_size(n_inner, crc)
    index = raw[:idx_size] if index_location == "start" else raw[-idx_size:]
    if crc:
        want = int.from_bytes(index[-4:], "little")
        if _crc32c(index[:-4]) != want:
            raise ValueError("zarr shard index CRC-32C mismatch")
        index = index[:-4]
    entries = np.frombuffer(index, dtype=np.uint64).reshape(n_inner, 2)
    fill = fill_value if fill_value is not None else 0
    out = np.full(shard_shape, fill, dtype=dtype)
    missing = np.uint64(0xFFFFFFFFFFFFFFFF)
    for i, idx in enumerate(np.ndindex(*grid)):
        off, nb = entries[i]
        if off == missing:
            continue
        payload = raw[int(off):int(off) + int(nb)]
        sub_raw = _decompress(payload, comp["id"] if comp else None)
        sub = np.frombuffer(sub_raw, dtype=dtype).reshape(inner)
        sl = tuple(slice(j * c, min((j + 1) * c, s))
                   for j, c, s in zip(idx, inner, shard_shape))
        out[sl] = sub[tuple(slice(0, s.stop - s.start) for s in sl)]
    return out


def _meta_v3(path: str, m: dict) -> dict:
    """zarr.json (v3 spec) -> the normalized dict the readers consume
    (v2-shaped: shape/chunks/dtype/compressor/fill_value/separator)."""
    if m.get("node_type") != "array":
        raise NotImplementedError(f"zarr v3 node_type {m.get('node_type')!r}")
    grid = m["chunk_grid"]
    if grid["name"] != "regular":
        raise NotImplementedError(f"chunk_grid {grid['name']!r}")
    kenc = m.get("chunk_key_encoding", {"name": "default"})
    if kenc["name"] not in ("default", "v2"):
        raise NotImplementedError(f"chunk_key_encoding {kenc['name']!r}")
    sep = kenc.get("configuration", {}).get(
        "separator", "/" if kenc["name"] == "default" else ".")
    dt = m["data_type"]
    if dt not in _V3_DTYPES:
        raise NotImplementedError(f"zarr v3 data_type {dt!r}")
    dtype = _V3_DTYPES[dt]
    codecs = m.get("codecs", [{"name": "bytes"}])
    shard = None
    if codecs and codecs[0]["name"] == "sharding_indexed":
        cfg = codecs[0]["configuration"]
        comp, dtype = _parse_inner_codecs(cfg.get("codecs"), dtype)
        crc = False
        for ic in cfg.get("index_codecs", [{"name": "bytes"}]):
            if ic["name"] == "crc32c":
                crc = True
            elif ic["name"] != "bytes":
                raise NotImplementedError(
                    f"shard index codec {ic['name']!r}")
        shard = {"inner": list(cfg["chunk_shape"]), "comp": comp,
                 "crc": crc,
                 "index_location": cfg.get("index_location", "end")}
        comp = None
    else:
        comp, dtype = _parse_inner_codecs(codecs, dtype)
    return {
        "shard": shard,
        "zarr_format": 3, "shape": m["shape"],
        "chunks": grid["configuration"]["chunk_shape"],
        "dtype": dtype, "compressor": comp,
        "fill_value": m.get("fill_value", 0),
        "dimension_separator": sep,
        "key_encoding": kenc["name"],
        "attributes": m.get("attributes", {}),
    }


def _meta(path: str) -> dict:
    v3 = os.path.join(path, "zarr.json")
    if os.path.exists(v3):
        with open(v3) as f:
            return _meta_v3(path, json.load(f))
    with open(os.path.join(path, ".zarray")) as f:
        m = json.load(f)
    if m.get("zarr_format") != 2:
        raise NotImplementedError(f"zarr_format {m.get('zarr_format')}")
    if m.get("order", "C") != "C":
        raise NotImplementedError("only C-order zarr arrays")
    if m.get("filters"):
        raise NotImplementedError("zarr filters not supported")
    comp = m.get("compressor")
    cid = comp["id"] if comp else None
    if cid not in _SUPPORTED_COMPRESSORS:
        raise NotImplementedError(f"compressor {cid!r} (no codec lib in sandbox)")
    m["key_encoding"] = "v2"
    return m


def _chunk_name(idx: tuple[int, ...], sep: str) -> str:
    return sep.join(str(i) for i in idx)


def _chunk_relpath(m: dict, idx: tuple[int, ...]) -> str:
    """Relative chunk key per the store's encoding: v2 '<i>.<j>' (or '/'),
    v3 default 'c/<i>/<j>' (or 'c.<i>.<j>')."""
    sep = m.get("dimension_separator", ".")
    name = _chunk_name(idx, sep)
    if m.get("zarr_format") == 3 and m.get("key_encoding") == "default":
        return "c" + sep + name
    return name


def _chunk_fspath(path: str, m: dict, idx: tuple[int, ...]) -> str:
    rel = _chunk_relpath(m, idx)
    return os.path.join(path, *rel.split("/")) if "/" in rel \
        else os.path.join(path, rel)


def _grid(shape, chunks):
    return [(s + c - 1) // c for s, c in zip(shape, chunks)]


# ---------------------------------------------------------------- write


def write_zarr(arr: np.ndarray, path: str, *, chunks=None,
               compressor: str | None = "zlib", level: int = 1,
               fill_value=0, attrs: dict | None = None,
               dimension_separator: str = ".") -> None:
    """Driver-side sink for a small in-memory array (atomic per file)."""
    arr = np.asarray(arr)
    if chunks is None:
        chunks = tuple(min(s, 256) for s in arr.shape)
    os.makedirs(path, exist_ok=True)
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(chunks),
        "dtype": _dtype_str(arr.dtype),
        "compressor": ({"id": "blosc", "cname": "lz4",
                        "clevel": level if level else 5, "shuffle": 1,
                        "blocksize": 0} if compressor == "blosc" else
                       {"id": compressor, "level": level}
                       if compressor else None),
        "fill_value": (None if fill_value is None
                       else (fill_value if not isinstance(fill_value, float)
                             or np.isfinite(fill_value) else "NaN")),
        "order": "C",
        "filters": None,
        "dimension_separator": dimension_separator,
    }
    _atomic_write(os.path.join(path, ".zarray"),
                  json.dumps(meta, indent=1).encode())
    if attrs:
        _atomic_write(os.path.join(path, ".zattrs"),
                      json.dumps(attrs, indent=1).encode())
    grid = _grid(arr.shape, chunks)
    for idx in np.ndindex(*grid):
        block = _pad_chunk(arr, idx, chunks, fill_value)
        name = _chunk_name(idx, dimension_separator)
        if dimension_separator == "/":
            os.makedirs(os.path.join(path, *name.split("/")[:-1]), exist_ok=True)
        _atomic_write(os.path.join(path, *name.split("/")) if
                      dimension_separator == "/" else os.path.join(path, name),
                      _compress(block.tobytes(), compressor, level,
                                typesize=arr.dtype.itemsize))


def write_zarr_v3(arr: np.ndarray, path: str, *, chunks=None,
                  compressor: str | None = "gzip", level: int = 1,
                  fill_value=0, attrs: dict | None = None,
                  separator: str = "/",
                  inner_chunks=None) -> None:
    """Zarr v3 driver-side sink: one `zarr.json` (array node, regular
    chunk grid, default chunk-key encoding, bytes[+gzip] codec chain) +
    `c/<i>/<j>` chunk files — the v3 layout frmts/zarr's V3 group reads."""
    arr = np.asarray(arr)
    if arr.dtype.byteorder == ">":
        arr = arr.astype(arr.dtype.newbyteorder("<"))
    name = _V3_NAMES.get(arr.dtype.str.lstrip("|<>="))
    if name is None:
        raise NotImplementedError(f"zarr v3 data_type for {arr.dtype}")
    if chunks is None:
        chunks = tuple(min(s, 256) for s in arr.shape)
    codecs = [{"name": "bytes", "configuration": {"endian": "little"}}]
    if compressor == "gzip":
        codecs.append({"name": "gzip", "configuration": {"level": level}})
    elif compressor is not None:
        raise NotImplementedError(f"zarr v3 codec {compressor!r}")
    if inner_chunks is not None:
        # sharding_indexed: the grid chunk becomes a SHARD of inner
        # chunks with a uint64 (offset, nbytes) index + CRC-32C at the
        # end — the v3 layout for many-small-chunk archives (one file
        # per shard, range-readable inner chunks)
        codecs = [{
            "name": "sharding_indexed",
            "configuration": {
                "chunk_shape": list(inner_chunks),
                "codecs": codecs,
                "index_codecs": [
                    {"name": "bytes", "configuration": {"endian": "little"}},
                    {"name": "crc32c"},
                ],
                "index_location": "end",
            },
        }]
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(arr.shape),
        "data_type": name,
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": list(chunks)}},
        "chunk_key_encoding": {"name": "default",
                               "configuration": {"separator": separator}},
        "fill_value": (fill_value if fill_value is None
                       or not isinstance(fill_value, float)
                       or np.isfinite(fill_value) else "NaN"),
        "codecs": codecs,
        "attributes": attrs or {},
    }
    os.makedirs(path, exist_ok=True)
    _atomic_write(os.path.join(path, "zarr.json"),
                  json.dumps(meta, indent=1).encode())
    m = {"zarr_format": 3, "key_encoding": "default",
         "dimension_separator": separator}
    comp = "gzip" if compressor == "gzip" else None
    for idx in np.ndindex(*_grid(arr.shape, chunks)):
        block = _pad_chunk(arr, idx, chunks, fill_value)
        fp = _chunk_fspath(path, m, idx)
        os.makedirs(os.path.dirname(fp), exist_ok=True)
        if inner_chunks is not None:
            payload = _encode_shard(
                block, tuple(inner_chunks),
                {"id": "gzip", "level": level} if comp else None,
                level, fill_value, True, "end")
        else:
            payload = _compress(block.tobytes(), comp, level)
        _atomic_write(fp, payload)


def _pad_chunk(arr, idx, chunks, fill_value) -> np.ndarray:
    sl = tuple(slice(i * c, min((i + 1) * c, s))
               for i, c, s in zip(idx, chunks, arr.shape))
    block = arr[sl]
    if block.shape != tuple(chunks):  # edge chunk: stored full-size padded
        full = np.full(chunks, fill_value if fill_value is not None else 0,
                       dtype=arr.dtype)
        full[tuple(slice(0, e) for e in block.shape)] = block
        block = full
    return np.ascontiguousarray(block)


def _atomic_write(final: str, data: bytes) -> None:
    tmp = f"{final}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, final)


def write_zarr_tiles(tiles_ds, path: str, *, shape, chunks, dtype,
                     compressor: str | None = "zlib", level: int = 1,
                     fill_value=0) -> int:
    """Scale path: a Dataset of chunk rows (cy:int64, cx:int64,
    data:binary — raw C-order full-chunk bytes) writes in parallel, one
    file per chunk per task, atomic rename; the driver writes only the
    metadata.  Returns chunks written."""
    dt = np.dtype(dtype)
    os.makedirs(path, exist_ok=True)
    meta = {
        "zarr_format": 2,
        "shape": list(shape),
        "chunks": list(chunks),
        "dtype": _dtype_str(dt),
        "compressor": ({"id": "blosc", "cname": "lz4",
                        "clevel": level if level else 5, "shuffle": 1,
                        "blocksize": 0} if compressor == "blosc" else
                       {"id": compressor, "level": level}
                       if compressor else None),
        "fill_value": fill_value,
        "order": "C",
        "filters": None,
        "dimension_separator": ".",
    }
    _atomic_write(os.path.join(path, ".zarray"),
                  json.dumps(meta, indent=1).encode())
    nbytes = int(np.prod(chunks)) * dt.itemsize

    def sink(b: pa.Table) -> pa.Table:
        cys = b.column("cy").to_numpy()
        cxs = b.column("cx").to_numpy()
        blobs = b.column("data").to_pylist()
        for i in range(len(cys)):
            if len(blobs[i]) != nbytes:
                raise ValueError(
                    f"chunk ({cys[i]},{cxs[i]}): got {len(blobs[i])} bytes, "
                    f"expected full chunk {nbytes}"
                )
            _atomic_write(os.path.join(path, f"{int(cys[i])}.{int(cxs[i])}"),
                          _compress(blobs[i], compressor, level))
        return pa.table({"cy": b.column("cy"), "cx": b.column("cx"),
                         "written": pa.array([True] * len(cys))})

    out = tiles_ds.map_batches(sink, batch_format="pyarrow").to_pandas()
    return int(out["written"].sum())


# ---------------------------------------------------------------- read


def read_zarr_meta(path: str) -> dict:
    return _meta(path)


def read_zarr(path: str):
    """-> ray.data.Dataset of chunk rows (cy, cx, h, w, data:binary raw
    bytes cropped to the in-bounds window).  Chunk indices enumerate
    driver-side from the metadata; each task reads only its files."""
    import ray.data as rd

    m = _meta(path)
    if len(m["shape"]) != 2:
        raise NotImplementedError("read_zarr handles 2-D arrays")
    comp = m["compressor"]["id"] if m["compressor"] else None
    dt = np.dtype(m["dtype"])
    ch, cw = m["chunks"]
    H, W = m["shape"]
    fill = m.get("fill_value", 0)
    if fill == "NaN":
        fill = np.nan
    gy, gx = _grid(m["shape"], m["chunks"])
    items = [{"cy": y, "cx": x} for y in range(gy) for x in range(gx)]

    def load(b: pa.Table) -> pa.Table:
        rows = {"cy": [], "cx": [], "h": [], "w": [], "data": []}
        for r in b.to_pylist():
            y, x = r["cy"], r["cx"]
            fp = _chunk_fspath(path, m, (y, x))
            h = min(ch, H - y * ch)
            w = min(cw, W - x * cw)
            if os.path.exists(fp):
                with open(fp, "rb") as f:
                    data0 = f.read()
                if m.get("shard"):
                    sh = m["shard"]
                    block = _decode_shard(
                        data0, (ch, cw), tuple(sh["inner"]), dt,
                        sh["comp"], fill, sh["crc"],
                        sh["index_location"])[:h, :w]
                else:
                    raw = _decompress(data0, comp)
                    block = np.frombuffer(raw, dtype=dt).reshape(ch, cw)[:h, :w]
            else:  # missing chunk = fill_value per spec
                block = np.full((h, w), fill, dtype=dt)
            rows["cy"].append(y)
            rows["cx"].append(x)
            rows["h"].append(h)
            rows["w"].append(w)
            rows["data"].append(np.ascontiguousarray(block).tobytes())
        return pa.table({
            "cy": pa.array(rows["cy"], pa.int64()),
            "cx": pa.array(rows["cx"], pa.int64()),
            "h": pa.array(rows["h"], pa.int64()),
            "w": pa.array(rows["w"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    return rd.from_items(items).map_batches(load, batch_format="pyarrow")


def read_zarr_array(path: str) -> np.ndarray:
    """Driver-side full assembly (small arrays / tests)."""
    m = _meta(path)
    if len(m["shape"]) != 2:
        raise NotImplementedError("read_zarr_array handles 2-D arrays")
    comp = m["compressor"]["id"] if m["compressor"] else None
    dt = np.dtype(m["dtype"])
    ch, cw = m["chunks"]
    H, W = m["shape"]
    fill = m.get("fill_value", 0)
    if fill == "NaN":
        fill = np.nan
    out = np.full((H, W), fill if fill is not None else 0, dtype=dt)
    gy, gx = _grid(m["shape"], m["chunks"])
    for y in range(gy):
        for x in range(gx):
            fp = _chunk_fspath(path, m, (y, x))
            if not os.path.exists(fp):
                continue
            with open(fp, "rb") as f:
                data0 = f.read()
            if m.get("shard"):
                sh = m["shard"]
                block = _decode_shard(data0, (ch, cw), tuple(sh["inner"]),
                                      dt, sh["comp"], fill, sh["crc"],
                                      sh["index_location"])
            else:
                raw = _decompress(data0, comp)
                block = np.frombuffer(raw, dtype=dt).reshape(ch, cw)
            h = min(ch, H - y * ch)
            w = min(cw, W - x * cw)
            out[y * ch:y * ch + h, x * cw:x * cw + w] = block[:h, :w]
    return out
