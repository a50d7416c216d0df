"""Erdas Imagine HFA (.img / .aux) driver — frmts/hfa/* wire facts:

- File: ``EHFA_HEADER_TAG\\0`` magic, u4 LE pointer to the Ehfa_File
  struct (version, freeList, rootEntryPtr, entryHeaderLength u2,
  dictionaryPtr); all scalars little-endian.
- Entry tree: 128-byte Ehfa_Entry nodes (next, prev, parent, child,
  data, dataSize, name[64], type[32], modTime) rooted at rootEntryPtr.
- Types are self-describing: the MIF dictionary string at
  dictionaryPtr defines every node type's field layout
  (``{count:[p|*]<typechar>name,...}TypeName,`` items; 'e' enums carry
  their label list, 'o'/'x' nest objects, 'p'/'*' indirect fields
  store u4 count + u4 file offset).  This module parses the dictionary
  and resolves fields generically, exactly like the reference.
- Bands: Eimg_Layer nodes (width/height/pixelType/blockWidth/
  blockHeight) with a RasterDMS Edms_State child: per-block table
  (offset, size, logvalid, compressionType) and the ESRI GRID block
  compression: 13-byte header (u4 min, i4 numRuns, i4 dataOffset,
  u1 numBits) then either packed values (numRuns == -1; 1/2/4-bit
  LSB-first, 8-bit, 16/32-bit MSB) or RLE runs (2-bit length-prefixed
  repeat counts + packed values), all offset by min; f32 decodes via
  the s32 bit pattern.
- Georef: Eprj_MapInfo (upperLeftCenter/lowerRightCenter/pixelSize
  doubles — CENTER convention); stats: Esta_Statistics doubles.

Scale shape: header+tree parse driver-side; ``read_hfa`` fans the
per-band block table out across Ray tasks with exact byte ranges.
"""

from __future__ import annotations

import struct

import numpy as np

_EPT = {
    0: ("u1", 1), 1: ("u2b", 2), 2: ("u4b", 4), 3: ("u1_", 8),
    4: ("i1", 8), 5: ("u2", 16), 6: ("i2", 16), 7: ("u4", 32),
    8: ("i4", 32), 9: ("f4", 32), 10: ("f8", 64), 11: ("c8", 64),
    12: ("c16", 128),
}
# pixelType enum index -> (numpy dtype, bits per pixel)
_PIXEL_TYPES = {
    0: ("u1bit", 1), 1: ("u2bit", 2), 2: ("u4bit", 4),
    3: ("u1", 8), 4: ("i1", 8), 5: ("u2", 16), 6: ("i2", 16),
    7: ("u4", 32), 8: ("i4", 32), 9: ("f4", 32), 10: ("f8", 64),
    11: ("c8", 64), 12: ("c16", 128),
}


# --------------------------------------------------------- MIF dictionary


class _Field:
    __slots__ = ("count", "pointer", "kind", "name", "enums", "obj")

    def __init__(self):
        self.count = 1
        self.pointer = None
        self.kind = "l"
        self.name = ""
        self.enums = None
        self.obj = None  # type name or inline _Type


class _Type:
    __slots__ = ("name", "fields")

    def __init__(self, name, fields):
        self.name = name
        self.fields = fields


_SIZES = {"c": 1, "C": 1, "e": 4, "s": 2, "S": 2, "t": 4, "l": 4,
          "L": 4, "f": 4, "d": 8, "m": 8, "M": 16, "b": -1,
          "1": 0, "2": 0, "4": 0}


class _Dictionary:
    def __init__(self, text: str):
        self.types: dict = {}
        p = 0
        while p < len(text) and text[p] == "{":
            fields, p = self._parse_fields(text, p + 1)
            # type name up to the next ',' (or '.')
            q = p
            while q < len(text) and text[q] not in ",.":
                q += 1
            name = text[p:q]
            self.types[name] = _Type(name, fields)
            p = q + 1
            if p <= len(text) and text[p - 1:p] == ".":
                break

    def _parse_fields(self, text, p):
        fields = []
        while text[p] != "}":
            f = _Field()
            q = text.index(":", p)
            f.count = int(text[p:q])
            p = q + 1
            if text[p] in "p*":
                f.pointer = text[p]
                p += 1
            f.kind = text[p]
            p += 1
            if f.kind == "e":
                q = text.index(":", p)
                n_enum = int(text[p:q])
                p = q + 1
                f.enums = []
                for _ in range(n_enum):
                    q = text.index(",", p)
                    f.enums.append(text[p:q])
                    p = q + 1
            elif f.kind == "o":
                q = text.index(",", p)
                f.obj = text[p:q]
                p = q + 1
            elif f.kind == "x":
                if text[p] == "{":
                    sub, p = self._parse_fields(text, p + 1)
                    q = text.index(",", p)
                    tname = text[p:q]
                    p = q + 1
                    f.obj = _Type(tname, sub)
                    self.types.setdefault(tname, f.obj)
            q = text.index(",", p)
            f.name = text[p:q]
            p = q + 1
            fields.append(f)
        return fields, p + 1  # skip '}'

    def type_size(self, t) -> int:
        """Fixed in-file size of a type instance (no pointer payloads)."""
        if isinstance(t, str):
            t = self.types[t]
        total = 0
        for f in t.fields:
            total += self.field_size(f)
        return total

    def field_size(self, f) -> int:
        if f.pointer:
            return 8  # u4 count + u4 offset
        if f.kind in ("o", "x"):
            inner = f.obj if isinstance(f.obj, _Type) else self.types[f.obj]
            return f.count * self.type_size(inner)
        if f.kind == "e":
            return f.count * 2
        if f.kind in "124":
            return (f.count * int(f.kind) + 7) // 8
        if f.kind == "b":
            raise NotImplementedError("HFA basedata size is dynamic")
        return f.count * _SIZES[f.kind]


_SCALAR_FMT = {"c": "B", "C": "b", "s": "<H", "S": "<h", "t": "<I",
               "l": "<I", "L": "<i", "f": "<f", "d": "<d"}


class _HFAFile:
    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            self.buf = f.read()
        if not self.buf.startswith(b"EHFA_HEADER_TAG"):
            raise ValueError("not an Erdas Imagine HFA file")
        (hdr_pos,) = struct.unpack_from("<I", self.buf, 16)
        version, free, root, ehl, dict_ptr = struct.unpack_from(
            "<IIIHI", self.buf, hdr_pos)
        self.root_ptr = root
        # dictionary: NUL- or '.'-terminated MIF string
        end = self.buf.find(b"\x00", dict_ptr)
        text = self.buf[dict_ptr:end if end > 0 else None].decode(
            "latin-1", "replace")
        self.dict = _Dictionary(text)

    # ---------------- entries ----------------

    def entry(self, pos: int) -> dict:
        b = self.buf
        nxt, prev, parent, child, data, size = struct.unpack_from(
            "<IIIIII", b, pos)
        name = b[pos + 24:pos + 88].split(b"\x00")[0].decode("latin-1")
        etype = b[pos + 88:pos + 120].split(b"\x00")[0].decode("latin-1")
        return {"next": nxt, "child": child, "data": data, "size": size,
                "name": name, "type": etype, "pos": pos}

    def children(self, entry) -> list:
        out = []
        pos = entry["child"]
        while pos:
            e = self.entry(pos)
            out.append(e)
            pos = e["next"]
        return out

    def root_children(self) -> list:
        return self.children(self.entry(self.root_ptr))

    def find(self, entry, name=None, etype=None) -> list:
        return [c for c in self.children(entry)
                if (name is None or c["name"] == name)
                and (etype is None or c["type"] == etype)]

    # ---------------- generic field access ----------------

    def read_instance(self, type_name: str, off: int) -> dict:
        """Decode one instance of `type_name` at absolute offset into a
        dict (pointer fields resolve their payload; 'b' basedata and
        unknown dynamics stop the walk — fields before them still
        resolve, matching what the raster path needs)."""
        t = self.dict.types[type_name]
        return self._read_fields(t, off)

    def _read_fields(self, t, off: int) -> dict:
        out = {}
        for f in t.fields:
            try:
                val, off = self._read_field(f, off)
            except (NotImplementedError, KeyError, struct.error):
                break
            out[f.name] = val
        return out

    def _read_field(self, f, off: int):
        b = self.buf
        if f.pointer:
            # 8-byte (count, absolute offset) header; the payload bytes
            # follow INLINE in the record stream, so the next field
            # starts after them (hfatype.cpp GetInstBytes semantics)
            count, ptr = struct.unpack_from("<II", b, off)
            off += 8
            if ptr == 0 or count == 0 or ptr >= len(b) or count > 1 << 20:
                return None, off
            if f.kind == "c":  # string
                s = b[ptr:ptr + count].split(b"\x00")[0]
                return s.decode("latin-1"), off + count
            if f.kind in ("o", "x"):
                inner = f.obj if isinstance(f.obj, _Type) else \
                    self.dict.types[f.obj]
                unit = self.dict.type_size(inner)
            elif f.kind == "e":
                unit = 2
            elif f.kind in "124":
                unit = 0
            elif f.kind == "b":
                raise NotImplementedError("basedata")
            else:
                unit = _SIZES[f.kind]
            vals = []
            p = ptr
            for _ in range(count):
                if p >= len(b):
                    break
                v, p = self._read_scalar_or_obj(f, p)
                vals.append(v)
            return (vals[0] if f.count == 1 and len(vals) == 1 and
                    f.kind not in ("o", "x") else vals), off + count * unit
        if f.kind in ("o", "x"):
            inner = f.obj if isinstance(f.obj, _Type) else \
                self.dict.types[f.obj]
            vals = []
            for _ in range(f.count):
                vals.append(self._read_fields(inner, off))
                off += self.dict.type_size(inner)
            return vals[0] if f.count == 1 else vals, off
        if f.kind == "e":
            vals = [struct.unpack_from("<H", b, off + 2 * i)[0]
                    for i in range(f.count)]
            vals = [f.enums[v] if v < len(f.enums) else v for v in vals]
            return vals[0] if f.count == 1 else vals, off + 2 * f.count
        if f.kind == "b":
            raise NotImplementedError("basedata")
        if f.kind in "124":
            nbytes = (f.count * int(f.kind) + 7) // 8
            return b[off:off + nbytes], off + nbytes
        fmt = _SCALAR_FMT[f.kind]
        size = struct.calcsize(fmt)
        if f.kind == "c" and f.count > 1:
            s = b[off:off + f.count].split(b"\x00")[0]
            return s.decode("latin-1"), off + f.count
        vals = [struct.unpack_from(fmt, b, off + size * i)[0]
                for i in range(f.count)]
        return vals[0] if f.count == 1 else vals, off + size * f.count

    def _read_scalar_or_obj(self, f, p):
        if f.kind in ("o", "x"):
            inner = f.obj if isinstance(f.obj, _Type) else \
                self.dict.types[f.obj]
            return self._read_fields(inner, p), p + self.dict.type_size(inner)
        if f.kind == "e":
            v = struct.unpack_from("<H", self.buf, p)[0]
            return (f.enums[v] if v < len(f.enums) else v), p + 2
        fmt = _SCALAR_FMT[f.kind]
        return struct.unpack_from(fmt, self.buf, p)[0], \
            p + struct.calcsize(fmt)


# ------------------------------------------------------ block decompress


def _uncompress(data: bytes, n_pixels: int, dtype: str) -> np.ndarray:
    """ESRI GRID compression (hfaband.cpp UncompressBlock semantics)."""
    dmin = struct.unpack_from("<I", data, 0)[0]
    nruns = struct.unpack_from("<i", data, 4)[0]
    doff = struct.unpack_from("<i", data, 8)[0]
    nbits = data[12]

    def take_values(buf, count):
        if nbits == 0:
            return np.zeros(count, np.int64)
        if nbits in (1, 2, 4):
            per = 8 // nbits
            nb = (count * nbits + 7) // 8
            raw = np.frombuffer(buf[:nb], np.uint8)
            out = np.empty(nb * per, np.int64)
            mask = (1 << nbits) - 1
            for k in range(per):
                out[k::per] = (raw >> (k * nbits)) & mask
            return out[:count]
        if nbits == 8:
            return np.frombuffer(buf[:count], np.uint8).astype(np.int64)
        if nbits == 16:
            return np.frombuffer(buf[:2 * count],
                                 ">u2").astype(np.int64)
        if nbits == 32:
            return np.frombuffer(buf[:4 * count],
                                 ">i4").astype(np.int64)
        raise NotImplementedError(f"HFA numBits {nbits}")

    if nruns == -1:
        vals = take_values(data[13:], n_pixels) + dmin
    else:
        # RLE: repeat counters with 2-bit length prefix, then values
        counts = np.zeros(nruns, np.int64)
        p = 13
        for i in range(nruns):
            if p >= len(data):
                break
            c0 = data[p]
            ln = (c0 >> 6) + 1
            v = c0 & 0x3F
            for k in range(1, ln):
                v = v * 256 + (data[p + k] if p + k < len(data) else 0)
            counts[i] = v
            p += ln
        rvals = take_values(data[doff:], nruns) + dmin
        total = int(counts.sum())
        if total > n_pixels:
            # clamp oversized trailing runs like the reference
            excess = total - n_pixels
            counts[-1] = max(0, counts[-1] - excess)
        vals = np.repeat(rvals, counts)
        if vals.size < n_pixels:
            vals = np.concatenate(
                [vals, np.zeros(n_pixels - vals.size, np.int64)])
        vals = vals[:n_pixels]
    if dtype == "f4":
        return vals.astype(np.int32).view(np.float32).copy()
    return vals.astype(np.dtype(dtype))


def _unpack_bits(raw: bytes, n: int, bits: int) -> np.ndarray:
    per = 8 // bits
    a = np.frombuffer(raw, np.uint8)
    out = np.empty(a.size * per, np.uint8)
    mask = (1 << bits) - 1
    for k in range(per):
        out[k::per] = (a >> (k * bits)) & mask
    return out[:n]


# ------------------------------------------------------------- driver API


def _layers(h: _HFAFile):
    out = []
    for e in h.root_children():
        if e["type"] in ("Eimg_Layer", "Eimg_Layer_SubSample"):
            out.append(e)
    return out


def hfa_meta(path: str) -> dict:
    h = _HFAFile(path)
    layers = _layers(h)
    if not layers:
        raise ValueError("HFA: no Eimg_Layer bands")
    li = h.read_instance("Eimg_Layer", layers[0]["data"])
    m = {
        "driver": "HFA", "width": li["width"], "height": li["height"],
        "bands": len(layers),
        "block_width": li["blockWidth"], "block_height": li["blockHeight"],
        "pixel_type": li["pixelType"],
        "band_names": [e["name"] for e in layers],
    }
    ptype = li["pixelType"]
    m["dtype"] = {"u1": "uint8", "u2": "uint8", "u4": "uint8",
                  "u8": "uint8", "s8": "int8", "u16": "uint16",
                  "s16": "int16", "u32": "uint32", "s32": "int32",
                  "f32": "float32", "f64": "float64"}.get(ptype, ptype)
    gt = None
    for e in h.root_children():
        for c in h.children(e):
            pass
    def walk(entry, depth=0):
        yield entry
        if depth < 4:
            for c in h.children(entry):
                yield from walk(c, depth + 1)
    epsg = None
    for e in h.root_children():
        for node in walk(e):
            if node["type"] == "Eprj_MapInfo":
                mi = h.read_instance("Eprj_MapInfo", node["data"])
                ul = mi.get("upperLeftCenter") or {}
                lr = mi.get("lowerRightCenter") or {}
                ps = mi.get("pixelSize") or {}
                if isinstance(ul, list):
                    ul = ul[0] if ul else {}
                if isinstance(lr, list):
                    lr = lr[0] if lr else {}
                if isinstance(ps, list):
                    ps = ps[0] if ps else {}
                try:
                    px = ps.get("width", ps.get("x"))
                    py = ps.get("height", ps.get("y"))
                    gt = (ul["x"] - px / 2.0, px, 0.0,
                          ul["y"] + py / 2.0, 0.0, -py)
                    m["projection_name"] = mi.get("proName")
                    m["units"] = mi.get("units")
                except (KeyError, TypeError, AttributeError):
                    pass
            elif node["type"] == "Esta_Statistics" and \
                    "statistics" not in m:
                st = h.read_instance("Esta_Statistics", node["data"])
                if "minimum" in st:
                    m["statistics"] = {k: st[k] for k in
                                       ("minimum", "maximum", "mean",
                                        "median", "mode", "stddev")
                                       if k in st}
    m["geotransform"] = gt
    return m


def _band_blocks(h: _HFAFile, layer) -> tuple:
    """-> (layer_info, [(offset, size, valid, compressed)])."""
    li = h.read_instance("Eimg_Layer", layer["data"])
    dms = h.find(layer, name="RasterDMS") or \
        h.find(layer, etype="Edms_State")
    if not dms:
        raise NotImplementedError(
            "HFA: no RasterDMS (external spill files not supported)")
    st = h.read_instance("Edms_State", dms[0]["data"])
    blocks = st.get("blockinfo") or []
    out = []
    for b in blocks:
        lv = b.get("logvalid", "true")
        valid = lv in ("true", 1, True)
        ct = b.get("compressionType", "no compression")
        comp = ct not in ("no compression", 0, None)
        out.append((b["offset"], b["size"], valid, comp))
    return li, out


def read_hfa_band(path: str, band: int = 0) -> np.ndarray:
    h = _HFAFile(path)
    layers = _layers(h)
    li, blocks = _band_blocks(h, layers[band])
    w, hgt = li["width"], li["height"]
    bw, bh = li["blockWidth"], li["blockHeight"]
    ptype = li["pixelType"]
    bits = {"u1": 1, "u2": 2, "u4": 4}.get(ptype)
    dt = {"u8": "u1", "s8": "i1", "u16": "<u2", "s16": "<i2",
          "u32": "<u4", "s32": "<i4", "f32": "<f4", "f64": "<f8",
          "u1": "u1", "u2": "u1", "u4": "u1"}.get(ptype)
    if dt is None:
        raise NotImplementedError(f"HFA pixel type {ptype}")
    npdt = np.dtype(dt)
    ntx = -(-w // bw)
    out = np.zeros((hgt, w), dtype=npdt.newbyteorder("="))
    core = "f4" if ptype == "f32" else npdt.newbyteorder("=").str
    for bi, (off, size, valid, comp) in enumerate(blocks):
        ty, tx = bi // ntx, bi % ntx
        if not valid:
            continue
        raw = h.buf[off:off + size]
        n_pix = bw * bh
        if comp:
            tile = _uncompress(raw, n_pix, "f4" if ptype == "f32"
                               else npdt.newbyteorder("=").str.lstrip("<=|"))
        elif bits:
            tile = _unpack_bits(raw, n_pix, bits)
        else:
            tile = np.frombuffer(raw[:n_pix * npdt.itemsize],
                                 dtype=npdt).astype(npdt.newbyteorder("="))
        tile = tile.reshape(bh, bw)
        y0, x0 = ty * bh, tx * bw
        hh, ww = min(bh, hgt - y0), min(bw, w - x0)
        out[y0:y0 + hh, x0:x0 + ww] = tile[:hh, :ww]
    return out


def read_hfa_array(path: str) -> np.ndarray:
    h = _HFAFile(path)
    n = len(_layers(h))
    bands = [read_hfa_band(path, i) for i in range(n)]
    return bands[0] if n == 1 else np.stack(bands, axis=-1)


def read_hfa(path: str, *, blocks_per_task: int = 64):
    """-> Dataset of decoded tile chunks (row0, col0, h, w, band,
    data:binary); the block table parses driver-side and each Ray task
    range-reads only its blocks."""
    import pyarrow as pa
    import ray.data as rd

    h = _HFAFile(path)
    layers = _layers(h)
    items = []
    per_band = []
    for b, layer in enumerate(layers):
        li, blocks = _band_blocks(h, layer)
        per_band.append((li, blocks))
        for bi in range(len(blocks)):
            if bi % blocks_per_task == 0:
                items.append({"band": b, "b0": bi})

    def load(t: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("row0", "col0", "h", "w", "band", "data")}
        for it in t.to_pylist():
            b = it["band"]
            arr = read_hfa_band(path, b)  # block cache via page cache
            li, blocks = per_band[b]
            bw, bh = li["blockWidth"], li["blockHeight"]
            ntx = -(-li["width"] // bw)
            for bi in range(it["b0"],
                            min(it["b0"] + blocks_per_task, len(blocks))):
                ty, tx = bi // ntx, bi % ntx
                y0, x0 = ty * bh, tx * bw
                hh = min(bh, li["height"] - y0)
                ww = min(bw, li["width"] - x0)
                rows["row0"].append(y0)
                rows["col0"].append(x0)
                rows["h"].append(hh)
                rows["w"].append(ww)
                rows["band"].append(b)
                rows["data"].append(np.ascontiguousarray(
                    arr[y0:y0 + hh, x0:x0 + ww]).tobytes())
        return pa.table({
            "row0": pa.array(rows["row0"], pa.int64()),
            "col0": pa.array(rows["col0"], pa.int64()),
            "h": pa.array(rows["h"], pa.int64()),
            "w": pa.array(rows["w"], pa.int64()),
            "band": pa.array(rows["band"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    return rd.from_items(items, override_num_blocks=max(1, min(
        len(items), 32))).map_batches(load, batch_format="pyarrow")
