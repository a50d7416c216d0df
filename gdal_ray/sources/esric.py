"""Esri Compact Cache V2 / .tpkx reader (frmts/esric/esric_dataset.cpp).

Format facts: tiles live in ``_alllayers-style`` trees
``.../L{lod:02d}/R{row0:04x}C{col0:04x}.bundle``; each bundle covers a
128x128 tile block and starts with a 64-byte header (u32 magic 3 at 0,
u32 5 at 12, u32 40 at 32, u32 index-bytes 131072 at 60) followed by
128*128 little-endian uint64 index entries — offset in the low 40 bits,
tile byte size in the high 24; the payloads are plain PNG/JPEG files.
``.tpkx`` is the same tree inside a zip with a ``root.json`` tiling
scheme; Compact Cache V2 uses ``conf.xml``.  Tiles decode through the
engine's codec door; missing bundles/tiles are transparent zeros.
"""

from __future__ import annotations

import json
import os
import re
import struct
import zipfile

import numpy as np

BSZ = 128  # bundle size in tiles
TSZ = 256  # tile pixel size


class _ZipSource:
    def __init__(self, path: str):
        self.z = zipfile.ZipFile(path)
        self.names = set(self.z.namelist())
        roots = [n for n in self.names if n.endswith("root.json")]
        self.prefix = roots[0][:-len("root.json")] if roots else ""

    def read(self, rel: str) -> bytes | None:
        n = self.prefix + rel
        return self.z.read(n) if n in self.names else None


class _DirSource:
    def __init__(self, path: str):
        self.base = path

    def read(self, rel: str) -> bytes | None:
        p = os.path.join(self.base, rel)
        if not os.path.exists(p):
            return None
        with open(p, "rb") as f:
            return f.read()


def _source(path: str):
    if path.lower().endswith((".tpkx", ".zip")):
        return _ZipSource(path), "tile"
    # V2 cache directory: conf.xml next to _alllayers
    if os.path.exists(os.path.join(path, "conf.xml")):
        return _DirSource(path), "_alllayers"
    raise ValueError(f"not an Esri compact cache: {path}")


def esric_meta(path: str) -> dict:
    src, tiledir = _source(path)
    if isinstance(src, _ZipSource):
        root = json.loads(src.read("root.json"))
        n_lods = int(root.get("maxLOD", -1)) + 1 or len(
            root.get("tileInfo", {}).get("lods", []))
        packet = int(root.get("storageInfo", {}).get("packetSize", 128))
    else:
        xml = src.read("conf.xml").decode("utf-8", "replace")
        m = re.search(r"<PacketSize>(\d+)</PacketSize>", xml)
        packet = int(m.group(1)) if m else 128
        n_lods = len(re.findall(r"<LODInfo", xml)) or \
            len(re.findall(r"<LevelID>", xml))
    return {"driver": "ESRIC", "n_lods": n_lods, "packet_size": packet,
            "tile_size": TSZ, "tile_dir": tiledir,
            "epsg": 3857}


def _bundle_index(raw: bytes) -> np.ndarray | None:
    if len(raw) < 64 + BSZ * BSZ * 8:
        return None
    if struct.unpack_from("<I", raw, 0)[0] != 3 or \
            struct.unpack_from("<I", raw, 12)[0] != 5 or \
            struct.unpack_from("<I", raw, 32)[0] != 40 or \
            struct.unpack_from("<I", raw, 60)[0] != BSZ * BSZ * 8:
        return None
    return np.frombuffer(raw, dtype="<u8", count=BSZ * BSZ, offset=64)


def read_esric_level(path: str, lod: int) -> np.ndarray:
    """Assemble one LOD of the cache -> (n*TSZ, n*TSZ, 4) RGBA uint8
    with n = 2**lod tiles per axis (web-mercator tiling scheme);
    missing tiles stay transparent zeros."""
    from gdal_ray.codecs import decode

    src, tiledir = _source(path)
    n = 1 << lod
    out = np.zeros((n * TSZ, n * TSZ, 4), dtype=np.uint8)
    for by in range(0, n, BSZ):
        for bx in range(0, n, BSZ):
            raw = src.read(f"{tiledir}/L{lod:02d}/R{by:04x}C{bx:04x}"
                           ".bundle")
            if raw is None:
                continue
            index = _bundle_index(raw)
            if index is None:
                continue
            for row in range(min(BSZ, n - by)):
                for col in range(min(BSZ, n - bx)):
                    e = int(index[row * BSZ + col])
                    off = e & 0xFFFFFFFFFF
                    size = e >> 40
                    if size == 0:
                        continue
                    tile = decode(raw[off:off + size])
                    if tile.ndim == 2:
                        tile = np.stack([tile] * 3 + [np.full_like(
                            tile, 255)], axis=-1)
                    elif tile.shape[2] == 3:
                        tile = np.concatenate(
                            [tile, np.full(tile.shape[:2] + (1,), 255,
                                           np.uint8)], axis=2)
                    y0 = (by + row) * TSZ
                    x0 = (bx + col) * TSZ
                    out[y0:y0 + tile.shape[0],
                        x0:x0 + tile.shape[1]] = tile[:TSZ, :TSZ]
    return out
