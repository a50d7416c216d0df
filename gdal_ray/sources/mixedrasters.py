"""Final small-driver batch: R raster (RRASTER .grd/.gri), DigitalGlobe
TIL, PCI PAux, Generic Binary (.hdr/.bil), NOAA NGS GEOID binary grids,
Vexcel MFF, Erdas EIR raw, and NOHRSC SNODAS headers.

Wire facts (frmts/raw/{rrasterdataset,pauxdataset,genbindataset,
mffdataset,eirdataset,snodasdataset}.cpp, frmts/til/tildataset.cpp,
frmts/ngsgeoid/ngsgeoiddataset.cpp):
- RRASTER: INI-ish .grd ([georeference] nrows/ncols/xmin..ymax,
  [data] datatype INT1U/INT2S/.../FLT4S/FLT8S, byteorder, nbands,
  bandorder BIL/BSQ/BIP) + raw .gri.
- TIL: ``numTiles``/``TILE_n.filename``/offset keys mosaicking
  referenced rasters (TIFFs decoded by this engine).
- PAux: .aux text (AuxilaryTarget, RawDefinition w h nbands,
  ChanDefinition-n: type offset pixel_offset line_offset Swapped?).
- GenBin: .hdr keywords (BANDS/ROWS/COLS/DATATYPE U8|U16|S16|F32/
  INTERLEAVING BSQ|BIL|BIP) + .bil raw.
- NGSGEOID: 44-byte header SLAT,WLON,DLAT,DLON f8 + NLAT,NLON,IKIND i4
  (IKIND==1 fixes endianness), f4 rows from the south (bottom-up);
  node-registered: gt anchored at cell edges via half-cell shifts.
- MFF: .hdr KEY=VALUE (IMAGE_LINES/LINE_SAMPLES) + band files .b<n>
  (byte) per band; EIR: IMAGINE_RAW_FILE keyword block.
- SNODAS: 'key: value' text header with a data file pathname.
"""

from __future__ import annotations

import os
import re
import struct

import numpy as np

_RR_TYPES = {
    "LOG1S": "u1", "INT1S": "i1", "INT1U": "u1", "INT2S": "i2",
    "INT2U": "u2", "INT4S": "i4", "INT4U": "u4", "FLT4S": "f4",
    "FLT8S": "f8",
}


def rraster_meta(path: str) -> dict:
    grd = path if path.lower().endswith(".grd") else path[:-4] + ".grd"
    with open(grd, "r", errors="replace") as f:
        text = f.read()
    kv = dict(re.findall(r"^(\w+)=(.*)$", text, re.M))
    dt = _RR_TYPES.get(kv.get("datatype", "FLT4S").upper())
    if dt is None:
        raise NotImplementedError(f"RRASTER datatype {kv.get('datatype')}")
    order = "<" if kv.get("byteorder", "little").lower() == "little" else ">"
    w, h = int(kv["ncols"]), int(kv["nrows"])
    nb = int(kv.get("nbands", 1))
    xmin, xmax = float(kv["xmin"]), float(kv["xmax"])
    ymin, ymax = float(kv["ymin"]), float(kv["ymax"])
    return {
        "driver": "RRASTER", "width": w, "height": h, "bands": nb,
        "wire_dtype": order + dt,
        "dtype": np.dtype(dt).name,
        "interleave": kv.get("bandorder", "BIL").upper(),
        "data_path": grd[:-4] + ".gri",
        "nodata": None if kv.get("nodatavalue", "NA") == "NA"
        else float(kv["nodatavalue"]),
        "projection": kv.get("projection"),
        "geotransform": (xmin, (xmax - xmin) / w, 0.0,
                         ymax, 0.0, -(ymax - ymin) / h),
    }


def read_rraster_array(path: str) -> np.ndarray:
    m = rraster_meta(path)
    dt = np.dtype(m["wire_dtype"])
    w, h, nb = m["width"], m["height"], m["bands"]
    with open(m["data_path"], "rb") as f:
        raw = np.frombuffer(f.read(w * h * nb * dt.itemsize), dtype=dt)
    il = m["interleave"]
    if il == "BSQ":
        arr = raw.reshape(nb, h, w).transpose(1, 2, 0)
    elif il == "BIP":
        arr = raw.reshape(h, w, nb)
    else:  # BIL
        arr = raw.reshape(h, nb, w).transpose(0, 2, 1)
    arr = np.ascontiguousarray(arr.astype(dt.newbyteorder("=")))
    return arr[:, :, 0] if nb == 1 else arr


def til_meta(path: str) -> dict:
    with open(path, "r", errors="replace") as f:
        text = f.read()
    kv = dict(re.findall(r"([\w.]+)\s*=\s*\"?([^\";\n]+)\"?", text))
    n = int(kv.get("numTiles", 0))
    tiles = []
    for i in range(1, n + 1):
        tiles.append({
            "path": os.path.join(os.path.dirname(path),
                                 kv[f"TILE_{i}.filename"].strip()),
            "col0": int(kv.get(f"TILE_{i}.ULColOffset", 0)),
            "row0": int(kv.get(f"TILE_{i}.ULRowOffset", 0)),
            "col1": int(kv.get(f"TILE_{i}.LRColOffset", 0)),
            "row1": int(kv.get(f"TILE_{i}.LRRowOffset", 0)),
        })
    if not tiles:
        raise ValueError("TIL: no tiles")
    w = max(t["col1"] for t in tiles)
    h = max(t["row1"] for t in tiles)
    return {"driver": "TIL", "width": w, "height": h, "tiles": tiles}


def read_til_array(path: str) -> np.ndarray:
    from gdal_ray.codecs.tiff import decode_tiff

    m = til_meta(path)
    out = None
    for t in m["tiles"]:
        with open(t["path"], "rb") as f:
            arr = np.squeeze(np.asarray(decode_tiff(f.read())))
        if out is None:
            shape = (m["height"], m["width"]) + \
                (() if arr.ndim == 2 else (arr.shape[2],))
            out = np.zeros(shape, arr.dtype)
        out[t["row0"]:t["row0"] + arr.shape[0],
            t["col0"]:t["col0"] + arr.shape[1]] = arr
    return out


_PAUX_TYPES = {"8U": "u1", "16U": "u2", "16S": "i2", "32R": "f4"}


def paux_meta(path: str) -> dict:
    aux = path if path.lower().endswith(".aux") else path + ".aux"
    if not os.path.exists(aux):
        aux = os.path.splitext(path)[0] + ".aux"
    with open(aux, "r", errors="replace") as f:
        text = f.read()
    m = re.search(r"AuxilaryTarget:\s*(\S+)", text)
    raw_name = m.group(1) if m else None
    rd = re.search(r"RawDefinition:\s*(\d+)\s+(\d+)\s+(\d+)", text)
    if not rd:
        raise ValueError("PAux: no RawDefinition")
    w, h, nb = (int(v) for v in rd.groups())
    chans = []
    for cm in re.finditer(r"ChanDefinition-(\d+):\s*(\S+)\s+(\d+)\s+(\d+)"
                          r"\s+(\d+)\s*(\S*)", text):
        chans.append({
            "dtype": _PAUX_TYPES.get(cm.group(2), "u1"),
            "offset": int(cm.group(3)),
            "pixel_offset": int(cm.group(4)),
            "line_offset": int(cm.group(5)),
            # PCIDSK semantics: on LSB hosts 'Swapped' IS native
            # little-endian (pauxdataset.cpp bNative)
            "swapped": cm.group(6).strip().lower() != "swapped",
        })
    gt = None
    ul = re.search(r"UpLeftX:\s*([-\d.]+)", text)
    uy = re.search(r"UpLeftY:\s*([-\d.]+)", text)
    lx = re.search(r"LoRightX:\s*([-\d.]+)", text)
    ly = re.search(r"LoRightY:\s*([-\d.]+)", text)
    if ul and uy and lx and ly:
        x0, y0 = float(ul.group(1)), float(uy.group(1))
        x1, y1 = float(lx.group(1)), float(ly.group(1))
        gt = (x0, (x1 - x0) / w, 0.0, y0, 0.0, -(y0 - y1) / h)
    return {
        "driver": "PAux", "width": w, "height": h, "bands": len(chans),
        "dtype": chans[0]["dtype"] if chans else "u1",
        "chans": chans, "geotransform": gt,
        "data_path": os.path.join(os.path.dirname(aux), raw_name)
        if raw_name else os.path.splitext(aux)[0],
    }


def read_paux_band(path: str, band: int = 0) -> np.ndarray:
    m = paux_meta(path)
    ch = m["chans"][band]
    dt = np.dtype(ch["dtype"])
    if ch["swapped"]:
        dt = dt.newbyteorder(">")
    w, h = m["width"], m["height"]
    with open(m["data_path"], "rb") as f:
        buf = f.read()
    out = np.empty((h, w), dt.newbyteorder("="))
    for y in range(h):
        off = ch["offset"] + y * ch["line_offset"]
        row = np.frombuffer(buf[off:off + w * ch["pixel_offset"]],
                            dtype=np.uint8)
        row = row.reshape(w, ch["pixel_offset"])[:, :dt.itemsize]
        out[y] = np.ascontiguousarray(row).view(dt)[:, 0]
    return out


_GENBIN_TYPES = {"U8": "u1", "S8": "i1", "U16": "u2", "S16": "i2",
                 "U32": "u4", "S32": "i4", "F32": "f4", "F64": "f8"}


def genbin_meta(path: str) -> dict:
    hdr = path if path.lower().endswith(".hdr") else \
        os.path.splitext(path)[0] + ".hdr"
    with open(hdr, "r", errors="replace") as f:
        text = f.read()
    kv = {}
    for ln in text.split("\n"):
        parts = ln.split(":", 1)
        if len(parts) == 2:
            kv[parts[0].strip().upper()] = parts[1].strip()
    if "BANDS" not in kv or "ROWS" not in kv:
        raise ValueError("not a Generic Binary header")
    dt = _GENBIN_TYPES.get(kv.get("DATATYPE", "U8").strip(), "u1")
    return {
        "driver": "GenBin", "width": int(kv["COLS"]),
        "height": int(kv["ROWS"]), "bands": int(kv["BANDS"]),
        "wire_dtype": dt, "dtype": np.dtype(dt).name,
        "interleave": kv.get("INTERLEAVING", "BSQ").upper(),
        "data_path": os.path.splitext(hdr)[0] + ".bil",
        "geotransform": None,
    }


def read_genbin_array(path: str) -> np.ndarray:
    m = genbin_meta(path)
    dt = np.dtype(m["wire_dtype"])
    w, h, nb = m["width"], m["height"], m["bands"]
    with open(m["data_path"], "rb") as f:
        raw = f.read(w * h * nb * dt.itemsize)
    if len(raw) < w * h * nb * dt.itemsize:
        raw = raw + b"\x00" * (w * h * nb * dt.itemsize - len(raw))
    flat = np.frombuffer(raw, dtype=dt)
    il = m["interleave"]
    if il == "BIL":
        arr = flat.reshape(h, nb, w).transpose(0, 2, 1)
    elif il == "BIP":
        arr = flat.reshape(h, w, nb)
    else:
        arr = flat.reshape(nb, h, w).transpose(1, 2, 0)
    arr = np.ascontiguousarray(arr.astype(dt.newbyteorder("=")))
    return arr[:, :, 0] if nb == 1 else arr


def ngsgeoid_meta(path: str) -> dict:
    import struct

    with open(path, "rb") as f:
        hdr = f.read(44)
    for order in ("<", ">"):
        (ikind,) = struct.unpack_from(order + "i", hdr, 40)
        if ikind == 1:
            break
    else:
        raise ValueError("not an NGS GEOID binary grid")
    slat, wlon, dlat, dlon = struct.unpack_from(order + "4d", hdr, 0)
    nlat, nlon = struct.unpack_from(order + "2i", hdr, 32)
    return {
        "driver": "NGSGEOID", "width": nlon, "height": nlat, "bands": 1,
        "dtype": "float32", "order": order,
        "geotransform": (wlon - dlon / 2 - 360.0, dlon, 0.0,
                         slat + nlat * dlat - dlat / 2, 0.0, -dlat),
    }


def read_ngsgeoid_array(path: str) -> np.ndarray:
    m = ngsgeoid_meta(path)
    w, h = m["width"], m["height"]
    with open(path, "rb") as f:
        f.seek(44)
        raw = f.read(w * h * 4)
    if len(raw) < w * h * 4:
        raw = raw + b"\x00" * (w * h * 4 - len(raw))
    arr = np.frombuffer(raw, dtype=m["order"] + "f4").reshape(h, w)
    return np.ascontiguousarray(arr[::-1].astype("=f4"))  # south-up file


def mff_meta(path: str) -> dict:
    with open(path, "r", errors="replace") as f:
        text = f.read()
    kv = dict(re.findall(r"^\s*(\w+)\s*=\s*(.*)$", text, re.M))
    if "IMAGE_LINES" not in kv:
        raise ValueError("not an MFF header")
    h = int(kv["IMAGE_LINES"])
    w = int(kv["LINE_SAMPLES"])
    base = os.path.splitext(path)[0]
    bands = sorted(f for f in os.listdir(os.path.dirname(path) or ".")
                   if f.lower().startswith(
                       os.path.basename(base).lower() + ".b"))
    return {"driver": "MFF", "width": w, "height": h,
            "bands": max(1, len(bands)), "dtype": "uint8",
            "band_files": [os.path.join(os.path.dirname(path), f)
                           for f in bands]}


def read_mff_band(path: str, band: int = 0) -> np.ndarray:
    m = mff_meta(path)
    w, h = m["width"], m["height"]
    raw = b""
    if band < len(m["band_files"]):
        with open(m["band_files"][band], "rb") as f:
            raw = f.read(w * h)
    if len(raw) < w * h:
        raw = raw + b"\x00" * (w * h - len(raw))
    return np.frombuffer(raw, np.uint8).reshape(h, w)


def eir_meta(path: str) -> dict:
    with open(path, "r", errors="replace") as f:
        text = f.read()
    if "IMAGINE_RAW_FILE" not in text:
        raise ValueError("not an Erdas EIR header")
    kv = dict(re.findall(r"^(\w+)[ \t]+(.+)$", text, re.M))
    return {"driver": "EIR", "width": int(kv.get("WIDTH", 0)),
            "height": int(kv.get("HEIGHT", 0)),
            "bands": int(kv.get("NUM_LAYERS", 1)), "dtype": "uint8",
            "data_path": os.path.join(os.path.dirname(path),
                                      kv.get("PIXEL_FILES", "").strip()),
            "offset": int(kv.get("DATA_OFFSET", 0))}


def read_eir_array(path: str) -> np.ndarray:
    m = eir_meta(path)
    w, h = m["width"], m["height"]
    with open(m["data_path"], "rb") as f:
        f.seek(m["offset"])
        raw = f.read(w * h)
    if len(raw) < w * h:
        raw = raw + b"\x00" * (w * h - len(raw))
    return np.frombuffer(raw, np.uint8).reshape(h, w)


def snodas_meta(path: str) -> dict:
    with open(path, "r", errors="replace") as f:
        text = f.read()
    kv = {}
    for ln in text.split("\n"):
        parts = ln.split(":", 1)
        if len(parts) == 2:
            kv[parts[0].strip()] = parts[1].strip()
    if "Number of columns" not in kv:
        raise ValueError("not a SNODAS header")
    w = int(kv["Number of columns"])
    h = int(kv["Number of rows"])
    minx = float(kv.get("Minimum x-axis coordinate", 0))
    maxx = float(kv.get("Maximum x-axis coordinate", 0))
    miny = float(kv.get("Minimum y-axis coordinate", 0))
    maxy = float(kv.get("Maximum y-axis coordinate", 0))
    return {
        "driver": "SNODAS", "width": w, "height": h, "bands": 1,
        "dtype": "int16",
        "nodata": float(kv.get("No data value", -9999)),
        "minimum": float(kv["Minimum data value"])
        if "Minimum data value" in kv else None,
        "data_path": kv.get("Data file pathname"),
        "geotransform": (minx, (maxx - minx) / w, 0.0,
                         maxy, 0.0, -(maxy - miny) / h),
    }


# --------------------------------------------------------------- IRIS

def iris_meta(path: str) -> dict:
    """Sigmet/Vaisala IRIS radar products (frmts/iris/irisdataset.cpp):
    640-byte LE header — structure ids 27/26 at bytes 0/12, product
    code u2 @24, data-type code u2 @142, raster size i4 @112/@116;
    Float32 band with the product-specific raw->physical conversions."""
    import struct

    with open(path, "rb") as f:
        hdr = f.read(640)
    id1 = struct.unpack_from("<h", hdr, 0)[0]
    id2 = struct.unpack_from("<h", hdr, 12)[0]
    if not (id1 == 27 and id2 == 26):
        raise ValueError("not an IRIS product file")
    w = struct.unpack_from("<i", hdr, 112)[0]
    h = struct.unpack_from("<i", hdr, 116)[0]
    prod = struct.unpack_from("<H", hdr, 24)[0]
    dtype_code = struct.unpack_from("<H", hdr, 142)[0]
    nbytes = 1 if dtype_code in (1, 2, 3, 32, 35) else 2
    return {"driver": "IRIS", "width": w, "height": h, "bands": 1,
            "dtype": "float32", "product_code": prod,
            "data_type_code": dtype_code, "item_bytes": nbytes}


def read_iris_array(path: str) -> np.ndarray:
    m = iris_meta(path)
    w, h = m["width"], m["height"]
    code = m["data_type_code"]
    nb = m["item_bytes"]
    with open(path, "rb") as f:
        f.seek(640)
        raw = f.read(w * h * nb)
    if len(raw) < w * h * nb:
        raw = raw + b"\x00" * (w * h * nb - len(raw))
    if nb == 1:
        v = np.frombuffer(raw, np.uint8).astype(np.float32)
    else:
        v = np.frombuffer(raw, "<u2").astype(np.float32)
    if code in (1, 2):      # dBZ/dBT: (v-64)/2, 95.5 -> nodata
        out = (v - 64.0) / 2.0
        out[out == 95.5] = -9999.0
    elif code in (8, 9):    # Fliquid2: (v-32768)/100
        out = (v - 32768.0) / 100.0
        out[np.isclose(out, 327.67)] = -9999.0
    elif code == 37:        # VIL2 exponent/mantissa
        iv = v.astype(np.int64)
        exp = iv >> 12
        mant = iv - (exp << 12)
        out = np.where(exp == 0, mant / 1000.0,
                       ((mant + 4096) << np.maximum(exp - 1, 0)) / 1000.0
                       ).astype(np.float32)
        out[iv == 65535] = -9999.0
    elif code == 33:        # TOPS height
        out = (v - 1.0) / 1000.0
        out[v == 0] = -1.0
        out[v == 65535] = -9999.0
    elif code == 32:        # VEL 1-byte
        out = (v - 1.0) / 10.0
        out[v == 0] = -1.0
        out[v == 255] = -9999.0
    elif code == 35:        # (v-128)*0.2
        out = (v - 128.0) * 0.2
        out[v == 0] = -9998.0
        out[v == 255] = -9999.0
    else:
        out = v
    # IRIS rasters are stored bottom-up (the reference seeks
    # nYSize-1-nBlockYOff per scanline)
    return np.ascontiguousarray(
        out.reshape(h, w)[::-1]).astype(np.float32)


# ---------------------------------------------------------------- BAG

def bag_meta(path: str) -> dict:
    """ONS BAG bathymetry (frmts/hdf5/bagdataset.cpp): an HDF5 file
    with BAG_root/{elevation, uncertainty, nominal_elevation} Float32
    grids stored south-up (GDAL flips), nodata 1e6; georef lives in the
    BAG_root/metadata XML."""
    from gdal_ray.sources.hdf5 import read_hdf5_meta

    m = read_hdf5_meta(path)
    ds = m["datasets"]
    if "BAG_root/elevation" not in ds:
        raise ValueError("not a BAG file (no BAG_root/elevation)")
    bands = [n for n in ("BAG_root/elevation", "BAG_root/uncertainty",
                         "BAG_root/nominal_elevation") if n in ds]
    h, w = ds["BAG_root/elevation"]["shape"]
    return {"driver": "BAG", "width": w, "height": h,
            "bands": len(bands), "dtype": "float32",
            "band_names": [b.split("/")[1] for b in bands],
            "band_datasets": bands, "nodata": 1000000.0}


def read_bag_band(path: str, band: int = 0) -> np.ndarray:
    from gdal_ray.sources.hdf5 import read_hdf5_var

    m = bag_meta(path)
    a = read_hdf5_var(path, m["band_datasets"][band])
    return np.ascontiguousarray(a[::-1]).astype(np.float32)


# ---------------------------------------------------------------- KRO

def kro_meta(path: str) -> dict:
    """Autopano KRO (frmts/raw/krodataset.cpp, public wiki spec):
    'KRO\\x01' + BE u4 width, height, bit depth (8/16/32), band count;
    pixel-interleaved big-endian samples (depth 32 = Float32)."""
    import struct

    with open(path, "rb") as f:
        hdr = f.read(20)
    if hdr[:4] != b"KRO\x01":
        raise ValueError("not a KRO file")
    w, h, depth, nb = struct.unpack(">4i", hdr[4:20])
    dt = {8: ">u1", 16: ">u2", 32: ">f4"}.get(depth)
    if dt is None:
        raise NotImplementedError(f"KRO depth {depth}")
    return {"driver": "KRO", "width": w, "height": h, "bands": nb,
            "wire_dtype": dt, "dtype": np.dtype(dt[1:]).name}


def read_kro_array(path: str) -> np.ndarray:
    m = kro_meta(path)
    dt = np.dtype(m["wire_dtype"])
    w, h, nb = m["width"], m["height"], m["bands"]
    with open(path, "rb") as f:
        f.seek(20)
        raw = f.read(w * h * nb * dt.itemsize)
    arr = np.frombuffer(raw, dtype=dt).reshape(h, w, nb)
    arr = np.ascontiguousarray(arr.astype(dt.newbyteorder("=")))
    return arr[:, :, 0] if nb == 1 else arr


def write_kro(path: str, arr) -> str:
    import struct

    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    depth = {np.uint8: 8, np.uint16: 16, np.float32: 32}.get(a.dtype.type)
    if depth is None:
        raise NotImplementedError(f"KRO write for {a.dtype}")
    with open(path, "wb") as f:
        f.write(b"KRO\x01" + struct.pack(">4i", a.shape[1], a.shape[0],
                                         depth, a.shape[2]))
        f.write(np.ascontiguousarray(
            a.astype(a.dtype.newbyteorder(">"))).tobytes())
    return path


# ---------------------------------------------------------------- PNM

def pnm_meta(path: str) -> dict:
    """Netpbm P5 (grey) / P6 (RGB) binary (frmts/raw/pnmdataset.cpp)."""
    with open(path, "rb") as f:
        head = f.read(64)
    if head[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM file")
    toks = []
    p = 2
    data_off = None
    while len(toks) < 3 and p < len(head):
        while p < len(head) and head[p:p + 1].isspace():
            p += 1
        if head[p:p + 1] == b"#":
            while p < len(head) and head[p] != 0x0A:
                p += 1
            continue
        q = p
        while q < len(head) and not head[q:q + 1].isspace():
            q += 1
        toks.append(int(head[p:q]))
        p = q
        if len(toks) == 3:
            data_off = p + 1
    w, h, maxval = toks
    nb = 3 if head[:2] == b"P6" else 1
    dt = "u1" if maxval < 256 else ">u2"
    return {"driver": "PNM", "width": w, "height": h, "bands": nb,
            "wire_dtype": dt, "dtype": np.dtype(dt.lstrip(">")).name,
            "maxval": maxval, "data_offset": data_off}


def read_pnm_array(path: str) -> np.ndarray:
    m = pnm_meta(path)
    dt = np.dtype(m["wire_dtype"])
    w, h, nb = m["width"], m["height"], m["bands"]
    with open(path, "rb") as f:
        f.seek(m["data_offset"])
        raw = f.read(w * h * nb * dt.itemsize)
    arr = np.frombuffer(raw, dtype=dt).reshape(h, w, nb)
    arr = np.ascontiguousarray(arr.astype(dt.newbyteorder("=")))
    return arr[:, :, 0] if nb == 1 else arr


def write_pnm(path: str, arr) -> str:
    a = np.asarray(arr)
    nb = 1 if a.ndim == 2 else a.shape[2]
    magic = b"P5" if nb == 1 else b"P6"
    maxval = 65535 if a.dtype.itemsize == 2 else 255
    with open(path, "wb") as f:
        f.write(magic + b"\n%d %d\n%d\n" % (a.shape[1], a.shape[0],
                                            maxval))
        out = a.astype(">u2") if maxval == 65535 else a.astype("u1")
        f.write(np.ascontiguousarray(out).tobytes())
    return path


# --------------------------------------------------------------- JDEM

def jdem_meta(path: str) -> dict:
    """Japanese DEM .mem (frmts/jdem): 1011-byte ASCII header, dims at
    +23/+26 (3 digits each), then per-row records of 6-char mesh code +
    3-digit 1-based row number + 5-digit decimeter heights (+2 pad)."""
    with open(path, "rb") as f:
        hdr = f.read(1011)
    if len(hdr) < 32:
        raise ValueError("not a JDEM file")
    w = int(hdr[23:26])
    h = int(hdr[26:29])
    return {"driver": "JDEM", "width": w, "height": h, "bands": 1,
            "dtype": "float32", "record_size": w * 5 + 9 + 2}


def read_jdem_array(path: str) -> np.ndarray:
    m = jdem_meta(path)
    w, h, rs = m["width"], m["height"], m["record_size"]
    out = np.zeros((h, w), np.float32)
    with open(path, "rb") as f:
        f.seek(1011)
        for y in range(h):
            rec = f.read(rs)
            if len(rec) < 9:
                break
            for i in range(w):
                s = rec[9 + 5 * i:14 + 5 * i].decode("latin-1").strip()
                out[y, i] = (int(s) if s and
                             s.lstrip("+-").isdigit() else 0) * 0.1
    return out


# -------------------------------------------------------------- PCIDSK

def pcidsk_meta(path: str) -> dict:
    """PCI Geomatics .pix (public PCIDSK spec / frmts/pcidsk/sdk
    cpcidskfile.cpp field positions): 512-byte ASCII header — width
    @384:8, height @392:8, channels @376:8, image start block @304:16
    (1-based 512-byte blocks), interleaving @360:8, channel type counts
    @464 (4x4: 8U,16S,16U,32R in that channel order)."""
    with open(path, "rb") as f:
        hdr = f.read(512)
    if not hdr.startswith(b"PCIDSK  "):
        raise ValueError("not a PCIDSK file")

    def fld(off, n):
        return hdr[off:off + n].decode("latin-1").strip()

    w = int(fld(384, 8))
    h = int(fld(392, 8))
    nchan = int(fld(376, 8))
    img_block = int(fld(304, 16))
    interleave = fld(360, 8).upper()
    counts = [int(fld(464 + 4 * i, 4) or 0) for i in range(4)]
    types = (["u1"] * counts[0] + ["i2"] * counts[1] +
             ["u2"] * counts[2] + ["f4"] * counts[3])
    if not types:
        types = ["u1"] * nchan
    return {"driver": "PCIDSK", "width": w, "height": h, "bands": nchan,
            "dtype": types[0], "channel_types": types,
            "interleave": interleave,
            "data_offset": (img_block - 1) * 512}


def read_pcidsk_band(path: str, band: int = 0) -> np.ndarray:
    m = pcidsk_meta(path)
    w, h = m["width"], m["height"]
    types = m["channel_types"]
    with open(path, "rb") as f:
        if m["interleave"].startswith("BAND"):
            off = m["data_offset"]
            for b in range(band):
                off += w * h * np.dtype(types[b]).itemsize
            f.seek(off)
            dt = np.dtype(types[band])
            raw = f.read(w * h * dt.itemsize)
            return np.frombuffer(raw, dtype=dt).reshape(h, w).copy()
        if m["interleave"].startswith("PIXEL"):
            group = sum(np.dtype(t).itemsize for t in types)
            coff = sum(np.dtype(t).itemsize for t in types[:band])
            dt = np.dtype(types[band])
            f.seek(m["data_offset"])
            raw = np.frombuffer(f.read(w * h * group), np.uint8)
            raw = raw.reshape(h * w, group)[:, coff:coff + dt.itemsize]
            return np.ascontiguousarray(raw).view(dt).reshape(h, w).copy()
    raise NotImplementedError(f"PCIDSK interleave {m['interleave']}")


# --------------------------------------------------------------- Idrisi

_RST_TYPES = {"byte": "u1", "integer": "<i2", "real": "<f4"}


def rst_meta(path: str) -> dict:
    """Idrisi RST (frmts/idrisi): .rdc 'key : value' text companion
    (data type byte/integer/real, columns/rows, min/max X/Y edges) +
    raw little-endian .rst."""
    rdc = (path[:-4] if path.lower().endswith(".rst") else path) + ".rdc"
    with open(rdc, "r", errors="replace") as f:
        text = f.read()
    kv = {}
    for ln in text.split("\n"):
        if ":" in ln:
            k, v = ln.split(":", 1)
            kv[k.strip().lower()] = v.strip()
    if "idrisi" not in kv.get("file format", "").lower():
        raise ValueError("not an Idrisi .rdc header")
    dt = _RST_TYPES.get(kv.get("data type", "byte").lower())
    if dt is None:
        raise NotImplementedError(
            f"Idrisi data type {kv.get('data type')}")
    w = int(kv["columns"])
    h = int(kv["rows"])
    gt = None
    try:
        x0, x1 = float(kv["min. x"]), float(kv["max. x"])
        y0, y1 = float(kv["min. y"]), float(kv["max. y"])
        gt = (x0, (x1 - x0) / w, 0.0, y1, 0.0, -(y1 - y0) / h)
    except (KeyError, ValueError):
        pass
    return {"driver": "RST", "width": w, "height": h, "bands": 1,
            "wire_dtype": dt, "dtype": np.dtype(dt.lstrip("<")).name,
            "geotransform": gt,
            "data_path": rdc[:-4] + ".rst",
            "ref_system": kv.get("ref. system")}


def read_rst_array(path: str) -> np.ndarray:
    m = rst_meta(path)
    dt = np.dtype(m["wire_dtype"])
    w, h = m["width"], m["height"]
    with open(m["data_path"], "rb") as f:
        raw = f.read(w * h * dt.itemsize)
    return np.ascontiguousarray(np.frombuffer(raw, dtype=dt).reshape(
        h, w).astype(dt.newbyteorder("=")))


# --------------------------------------------------------------- NOAA_B

def noaa_b_meta(path: str) -> dict:
    """NOAA .b geoid grids (frmts/raw/noaa_b_dataset.cpp): 52-byte
    header — 4 doubles (lat0, lon0, dlat, dlon) at +4, 3 ints (nrows,
    ncols, ikind) at +36; ikind==1 picks the byte order; f4 values."""
    import struct

    with open(path, "rb") as f:
        hdr = f.read(52)
    for order in (">", "<"):
        ikind = struct.unpack_from(order + "i", hdr, 44)[0]
        if ikind in (0, 1, 2, 3):
            lat0, lon0, dlat, dlon = struct.unpack_from(order + "4d",
                                                        hdr, 4)
            nrows, ncols = struct.unpack_from(order + "2i", hdr, 36)
            if 0 < nrows < 1 << 24 and 0 < ncols < 1 << 24 \
                    and 0 < dlat <= 90 and 0 < dlon <= 90:
                break
    else:
        raise ValueError("not a NOAA .b grid")
    return {"driver": "NOAA_B", "width": ncols, "height": nrows,
            "bands": 1, "dtype": "float32", "order": order,
            "geotransform": (lon0 - dlon / 2, dlon, 0.0,
                             lat0 + dlat / 2, 0.0, -dlat)}


def read_noaa_b_array(path: str) -> np.ndarray:
    """Rows are FORTRAN records (4-byte length header/trailer) stored
    south to north; the raster flips to north-up."""
    m = noaa_b_meta(path)
    w, h = m["width"], m["height"]
    rec = 4 + w * 4 + 4
    out = np.zeros((h, w), np.float32)
    with open(path, "rb") as f:
        f.seek(52)
        data = f.read(h * rec)
    for k in range(h):
        row = np.frombuffer(data[k * rec + 4:k * rec + 4 + w * 4],
                            m["order"] + "f4")
        out[h - 1 - k] = row
    return out


# ----------------------------------------------------------------- MFF2

def mff2_meta(path: str) -> dict:
    """Vexcel MFF2/HKV: a DIRECTORY with 'attrib' key=value text
    (extent.cols/rows, pixel.size bits, encoding/order flags marked by
    '*') + raw 'image_data'."""
    attrib = os.path.join(path, "attrib")
    if not os.path.exists(attrib):
        raise ValueError("not an MFF2 directory (no attrib)")
    kv = {}
    with open(attrib, "r", errors="replace") as f:
        for ln in f:
            if "=" in ln:
                k, v = ln.split("=", 1)
                kv[k.strip()] = v.strip()
    w = int(kv["extent.cols"])
    h = int(kv["extent.rows"])
    bits = int(kv.get("pixel.size", 8))

    def star(key, default):
        v = kv.get(key, "")
        m = re.search(r"\*(\w[\w-]*)", v)
        return m.group(1) if m else default

    enc = star("pixel.encoding", "unsigned")
    order = star("pixel.order", "lsbf")
    base = {"unsigned": "u", "twos-complement": "i",
            "ieee-754": "f"}.get(enc, "u")
    dt = ("<" if order == "lsbf" else ">") + base + str(bits // 8)
    return {"driver": "MFF2", "width": w, "height": h, "bands": 1,
            "wire_dtype": dt,
            "dtype": np.dtype(base + str(bits // 8)).name,
            "data_path": os.path.join(path, "image_data")}


def read_mff2_array(path: str) -> np.ndarray:
    m = mff2_meta(path)
    dt = np.dtype(m["wire_dtype"])
    w, h = m["width"], m["height"]
    with open(m["data_path"], "rb") as f:
        raw = f.read(w * h * dt.itemsize)
    return np.ascontiguousarray(np.frombuffer(raw, dtype=dt).reshape(
        h, w).astype(dt.newbyteorder("=")))


# -------------------------------------------------------------- ROI_PAC

def roipac_meta(path: str) -> dict:
    """JPL ROI_PAC (frmts/raw/roipacdataset.cpp): <file>.rsc text
    (WIDTH, FILE_LENGTH, X_FIRST/X_STEP...) + raw data typed by the
    file extension (.dem/.int/.slc/...)."""
    rsc = path + ".rsc"
    if not os.path.exists(rsc):
        raise ValueError("not a ROI_PAC dataset (no .rsc)")
    kv = {}
    with open(rsc, "r", errors="replace") as f:
        for ln in f:
            parts = ln.split(None, 1)
            if len(parts) == 2:
                kv[parts[0]] = parts[1].strip()
    w = int(kv["WIDTH"])
    h = int(kv["FILE_LENGTH"])
    ext = os.path.splitext(path)[1].lower()
    dt, nb = {".dem": ("<i2", 1), ".flg": ("u1", 1),
              ".slc": ("<c8", 1), ".int": ("<c8", 1),
              ".amp": ("<f4", 2), ".cor": ("<f4", 2),
              ".hgt": ("<f4", 2), ".unw": ("<f4", 2),
              ".msk": ("<f4", 1)}.get(ext, ("<f4", 1))
    gt = None
    if "X_FIRST" in kv:
        gt = (float(kv["X_FIRST"]) - float(kv["X_STEP"]) / 2,
              float(kv["X_STEP"]), 0.0,
              float(kv["Y_FIRST"]) - float(kv["Y_STEP"]) / 2, 0.0,
              float(kv["Y_STEP"]))
    return {"driver": "ROI_PAC", "width": w, "height": h, "bands": nb,
            "wire_dtype": dt, "dtype": np.dtype(dt.lstrip("<")).name,
            "geotransform": gt}


def read_roipac_array(path: str) -> np.ndarray:
    m = roipac_meta(path)
    dt = np.dtype(m["wire_dtype"])
    w, h = m["width"], m["height"]
    with open(path, "rb") as f:
        raw = f.read(w * h * dt.itemsize)
    return np.ascontiguousarray(np.frombuffer(raw, dtype=dt).reshape(
        h, w).astype(dt.newbyteorder("=")))


# ------------------------------------------------------------- PCRaster

_CSF_REPR = {0x00: "u1", 0x26: "i4", 0x5A: "f4", 0xDB: "f8",
             0x21: "i2", 0x04: "u1", 0x15: "u2", 0x34: "u4"}


def pcraster_meta(path: str) -> dict:
    """PCRaster CSF .map (the public CSF spec / frmts/pcraster):
    'RUU CROSS SYSTEM MAP FORMAT' signature; raster header @64:
    valueScale u2, cellRepr u2, min/max 8B each, xUL/yUL f8, angle f8,
    cellSize f8, nrRows/nrCols u4; data @256."""
    import struct

    with open(path, "rb") as f:
        hdr = f.read(256)
    if not hdr.startswith(b"RUU CROSS SYSTEM MAP FORMAT"):
        raise ValueError("not a PCRaster CSF map")
    vs, repr_code = struct.unpack_from("<HH", hdr, 64)
    x_ul, y_ul = struct.unpack_from("<2d", hdr, 84)
    nrows, ncols = struct.unpack_from("<II", hdr, 100)
    cell, _celly, angle = struct.unpack_from("<3d", hdr, 108)
    dt = _CSF_REPR.get(repr_code)
    if dt is None:
        raise NotImplementedError(f"CSF cell representation {repr_code:#x}")
    return {"driver": "PCRaster", "width": ncols, "height": nrows,
            "bands": 1, "wire_dtype": "<" + dt,
            "dtype": np.dtype(dt).name, "value_scale": vs,
            "geotransform": (x_ul, cell, 0.0, y_ul, 0.0, -cell)}


def read_pcraster_array(path: str) -> np.ndarray:
    m = pcraster_meta(path)
    dt = np.dtype(m["wire_dtype"])
    w, h = m["width"], m["height"]
    with open(path, "rb") as f:
        f.seek(256)
        raw = f.read(w * h * dt.itemsize)
    return np.ascontiguousarray(np.frombuffer(raw, dtype=dt).reshape(
        h, w).astype(dt.newbyteorder("=")))


# --------------------------------------------------------- Northwood GRD

def nwt_grd_meta(path: str) -> dict:
    """Northwood/Vertical Mapper GRD (frmts/northwood): 'HGPC' magic +
    format char ('1' surface / '8' classified); dims u2 @9/@11 (u4
    @128/@132 when zero), bounds f8 LE @13..45, z-range f4 @45/@49,
    colour inflection table @516 (u2 count, then 7-byte zVal f4 +
    r,g,b records); u2 rows from 1024, Z = zmin + (raw-1) * (zmax -
    zmin)/65534, raw 0 = nodata; RGB bands via a 4096-entry ramp
    interpolated through the inflections (createIP)."""
    import struct

    with open(path, "rb") as f:
        hdr = f.read(1024)
    if hdr[:4] != b"HGPC":
        raise ValueError("not a Northwood GRD file")
    fmt = chr(hdr[4])
    w = struct.unpack_from("<H", hdr, 9)[0]
    h = struct.unpack_from("<H", hdr, 11)[0]
    if w == 0:
        w = struct.unpack_from("<I", hdr, 128)[0]
    if h == 0:
        h = struct.unpack_from("<I", hdr, 132)[0]
    minx, maxx, miny, maxy = struct.unpack_from("<4d", hdr, 13)
    zmin, zmax = struct.unpack_from("<2f", hdr, 45)
    n_inf = struct.unpack_from("<H", hdr, 516)[0]
    inflections = []
    if n_inf <= 32:
        for i in range(n_inf):
            z = struct.unpack_from("<f", hdr, 518 + 7 * i)[0]
            r, g, b = hdr[522 + 7 * i], hdr[523 + 7 * i], hdr[524 + 7 * i]
            inflections.append((z, r, g, b))
    step = (maxx - minx) / (w - 1)
    return {"driver": "NWT_GRD", "width": w, "height": h, "bands": 4,
            "dtype": "float32", "zmin": zmin, "zmax": zmax,
            "format": fmt, "inflections": inflections,
            "geotransform": (minx - step / 2, step, 0.0,
                             maxy + step / 2, 0.0, -step)}


def _nwt_colormap(m: dict) -> np.ndarray:
    """4096-entry RGB ramp per northwood.cpp createIP/linearColor."""
    size = 4096
    cmap = np.zeros((size, 3), np.uint8)
    mark = [0]

    def create_ip(index, r, g, b):
        if index == 0:
            cmap[0] = (r, g, b)
            mark[0] = 0
            return
        if index <= mark[0]:
            return
        wm = mark[0]
        base = cmap[wm].astype(np.float32)
        slope = (np.array([r, g, b], np.float32) - base) / (index - wm)
        for i in range(wm + 1, index):
            cmap[i] = (base + (i - wm) * slope + 0.5).astype(np.uint8)
        cmap[index] = (r, g, b)
        mark[0] = index

    def linear(lo, hi, mid):
        z0, r0, g0, b0 = lo
        z1, r1, g1, b1 = hi
        if mid < z0:
            return r0, g0, b0
        if mid > z1:
            return r1, g1, b1
        s = (mid - z0) / (z1 - z0)
        return (int(s * (r1 - r0) + r0 + 0.5),
                int(s * (g1 - g0) + g0 + 0.5),
                int(s * (b1 - b0) + b0 + 0.5))

    create_ip(0, 255, 255, 255)
    inf = m["inflections"]
    if not inf:
        return cmap
    zmin, zmax = m["zmin"], m["zmax"]
    if zmin <= inf[0][0]:
        create_ip(1, inf[0][1], inf[0][2], inf[0][3])
    i = 1
    while i < len(inf):
        if zmin < inf[i][0]:
            r, g, b = linear(inf[i - 1], inf[i], zmin)
            create_ip(1, r, g, b)
            break
        i += 1
    if i >= len(inf):
        last = inf[-1]
        create_ip(1, last[1], last[2], last[3])
        create_ip(size - 1, last[1], last[2], last[3])
        return cmap
    index = 0
    while i < len(inf):
        if zmax < inf[i][0]:
            r, g, b = linear(inf[i - 1], inf[i], zmax)
            index = size - 1
            create_ip(index, r, g, b)
            break
        index = int((inf[i][0] - zmin) / (zmax - zmin) * size)
        if index >= size:
            index = size - 1
        create_ip(index, inf[i][1], inf[i][2], inf[i][3])
        i += 1
    if index < size - 1:
        last = inf[-1]
        create_ip(size - 1, last[1], last[2], last[3])
    return cmap


def read_nwt_grd_band(path: str, band: int = 0) -> np.ndarray:
    """Bands 1-3 = ramp RGB (uint8), band 4 = Z float32."""
    m = nwt_grd_meta(path)
    w, h = m["width"], m["height"]
    with open(path, "rb") as f:
        f.seek(1024)
        raw = np.frombuffer(f.read(w * h * 2), "<u2").reshape(h, w)
    if band == 3:
        scale = (m["zmax"] - m["zmin"]) / 65534.0
        out = (m["zmin"] + (raw.astype(np.float64) - 1) * scale
               ).astype(np.float32)
        out[raw == 0] = -1e37
        return out
    cmap = _nwt_colormap(m)
    return cmap[raw >> 4, band].copy()


# --------------------------------------------------------- FARSITE LCP

def lcp_meta(path: str) -> dict:
    """FARSITE v.4 landscape file (frmts/raw/lcpdataset.cpp): 7316-byte
    header — crown/ground-fuel flags at 0/4 select 5/7/8/10 bands,
    size at 4164/4168, west/east/north/south doubles at 4172..4196,
    cell sizes at 4208/4216; pixel-interleaved int16 LE data follows."""
    with open(path, "rb") as f:
        h = f.read(7316)
    crown = struct.unpack_from("<i", h, 0)[0] - 20
    ground = struct.unpack_from("<i", h, 4)[0] - 20
    n_bands = 5 + (3 if crown else 0) + (2 if ground else 0)
    w = struct.unpack_from("<i", h, 4164)[0]
    hgt = struct.unpack_from("<i", h, 4168)[0]
    east, west, north, south = struct.unpack_from("<4d", h, 4172)
    cellx, celly = struct.unpack_from("<2d", h, 4208)
    return {"driver": "LCP", "width": w, "height": hgt,
            "bands": n_bands, "dtype": "int16",
            "geotransform": (west, cellx, 0.0, north, 0.0, -celly),
            "latitude": struct.unpack_from("<i", h, 8)[0],
            "description": h[6804:7316].split(b"\0")[0].decode(
                "latin-1", "replace")}


def read_lcp_array(path: str) -> np.ndarray:
    m = lcp_meta(path)
    w, h, nb = m["width"], m["height"], m["bands"]
    with open(path, "rb") as f:
        f.seek(7316)
        raw = np.frombuffer(f.read(w * h * nb * 2), dtype="<i2")
    return raw.reshape(h, w, nb)  # pixel-interleaved


# --------------------------------------------------- NADCON LOS/LAS grids

def loslas_meta(path: str) -> dict:
    """NADCON .los/.las/.geo datum grid (frmts/raw/loslasdataset.cpp):
    int32 nx/ny at byte 64, float32 min_lon/dlon/min_lat/dlat at 76;
    rows south-first with a 4-byte Fortran record prefix."""
    with open(path, "rb") as f:
        f.seek(64)
        nx, ny = struct.unpack("<2i", f.read(8))
        f.seek(76)
        min_lon, dlon, min_lat, dlat = struct.unpack("<4f", f.read(16))
    kind = {"los": "Longitude Offset (arc seconds)",
            "las": "Latitude Offset (arc seconds)",
            "geo": "Geoid undulation (meters)"}.get(
        path.rsplit(".", 1)[-1].lower(), "")
    return {"driver": "LOSLAS", "width": nx, "height": ny, "bands": 1,
            "dtype": "float32", "band_description": kind,
            "geotransform": (min_lon - dlon * 0.5, float(dlon), 0.0,
                             min_lat + (ny - 0.5) * dlat, 0.0,
                             float(-dlat))}


def read_loslas_array(path: str) -> np.ndarray:
    m = loslas_meta(path)
    nx, ny = m["width"], m["height"]
    rec = nx * 4 + 4
    with open(path, "rb") as f:
        f.seek(rec)  # the first record is the header row
        data = f.read(rec * ny)
    rows = np.frombuffer(data, dtype="<f4").reshape(ny, nx + 1)[:, 1:]
    return rows[::-1].copy()  # south-first on disk; north-up raster


# --------------------------------------------------------------- ISIS2

def isis2_meta(path: str) -> dict:
    """ISIS2 cube (frmts/pds/isis2dataset.cpp): PDS-style keyword label,
    ^QUBE record pointer, CORE_ITEMS (samples, lines, bands),
    CORE_ITEM_BYTES/TYPE (SUN_* = big-endian, PC_/LSB_ = little)."""
    with open(path, "rb") as f:
        head = f.read(32768).decode("latin-1", "replace")
    kv = {}
    for line in head.splitlines():
        line = line.split("/*")[0].strip()
        if "=" in line:
            k, v = line.split("=", 1)
            kv[k.strip()] = v.strip()
    rec_bytes = int(kv.get("RECORD_BYTES", "512"))
    qube_rec = int(kv.get("^QUBE", "1").split()[0])
    items = kv["CORE_ITEMS"].strip("()").split(",")
    ns, nl, nb = (int(x) for x in items)
    ib = int(kv.get("CORE_ITEM_BYTES", "1"))
    ctype = kv.get("CORE_ITEM_TYPE", "PC_INTEGER").strip()
    be = ctype.startswith(("SUN", "MSB"))
    real = "REAL" in ctype
    unsigned = "UNSIGNED" in ctype
    dt = (f"{'>' if be else '<'}"
          f"{'f' if real else ('u' if unsigned else 'i')}{ib}")
    return {"driver": "ISIS2", "width": ns, "height": nl, "bands": nb,
            "dtype": dt, "offset": (qube_rec - 1) * rec_bytes,
            "base": float(kv.get("CORE_BASE", "0.0")),
            "multiplier": float(kv.get("CORE_MULTIPLIER", "1.0"))}


def read_isis2_array(path: str) -> np.ndarray:
    m = isis2_meta(path)
    ns, nl, nb = m["width"], m["height"], m["bands"]
    dt = np.dtype(m["dtype"])
    want = ns * nl * nb * dt.itemsize
    with open(path, "rb") as f:
        f.seek(m["offset"])
        raw = f.read(want)
    if len(raw) < want:  # truncated fixture: zero-fill like the ref
        raw = raw + b"\0" * (want - len(raw))
    a = np.frombuffer(raw, dtype=dt).reshape(nb, nl, ns)
    a = np.ascontiguousarray(a.transpose(1, 2, 0).astype(
        dt.newbyteorder("=")))
    return a[:, :, 0] if nb == 1 else a


# ----------------------------------------------------------- NASA MRF

_MRF_EXT = {"LERC": ".lrc", "PNG": ".ppg", "PPNG": ".ppg", "JPEG": ".pjg",
            "DEFLATE": ".pzp", "ZSTD": ".pzs", "NONE": ".til",
            "TIF": ".ptf"}
_MRF_DT = {"Byte": np.uint8, "Int16": np.int16, "UInt16": np.uint16,
           "Int32": np.int32, "UInt32": np.uint32, "Float32": np.float32,
           "Float64": np.float64}


def mrf_meta(path: str) -> dict:
    """NASA Meta Raster Format (frmts/mrf/): XML .mrf header + .idx
    (big-endian uint64 offset/size pairs per page) + a page data file
    whose suffix names the codec."""
    xml = open(path).read()

    def attr(tag, name, default=None):
        m = re.search(rf"<{tag}[^>]*\b{name}=\"([^\"]+)\"", xml)
        return m.group(1) if m else default

    m = re.search(r"<Compression>([^<]+)</Compression>", xml)
    comp = m.group(1).strip() if m else "PNG"
    dt = re.search(r"<DataType>([^<]+)</DataType>", xml)
    bbox = re.search(
        r"<BoundingBox minx=\"([^\"]+)\" miny=\"([^\"]+)\""
        r" maxx=\"([^\"]+)\" maxy=\"([^\"]+)\"", xml)
    w = int(attr("Size", "x"))
    h = int(attr("Size", "y"))
    c = int(attr("Size", "c", "1"))
    pw = int(attr("PageSize", "x", "512"))
    ph = int(attr("PageSize", "y", "512"))
    out = {"driver": "MRF", "width": w, "height": h, "bands": c,
           "page_w": pw, "page_h": ph, "compression": comp,
           "dtype": np.dtype(_MRF_DT.get(
               dt.group(1).strip() if dt else "Byte", np.uint8)).name}
    if bbox:
        x0, y0, x1, y1 = (float(v) for v in bbox.groups())
        out["geotransform"] = (x0, (x1 - x0) / w, 0.0, y1, 0.0,
                               -(y1 - y0) / h)
    return out


def read_mrf_array(path: str) -> np.ndarray:
    m = mrf_meta(path)
    w, h, c = m["width"], m["height"], m["bands"]
    pw, ph = m["page_w"], m["page_h"]
    comp = m["compression"].upper()
    dt = np.dtype(m["dtype"])
    base = path.rsplit(".", 1)[0]
    idx = np.frombuffer(open(base + ".idx", "rb").read(), dtype=">u8")
    import glob as _glob

    data_path = base + _MRF_EXT.get(comp, ".til")
    if not os.path.exists(data_path):
        cands = [p for p in _glob.glob(base + ".*")
                 if not p.endswith((".mrf", ".idx", ".aux.xml"))]
        if not cands:
            raise FileNotFoundError(f"MRF data file for {path}")
        data_path = cands[0]
    data = open(data_path, "rb").read()
    px = (w + pw - 1) // pw
    py = (h + ph - 1) // ph
    out = np.zeros((py * ph, px * pw, c), dtype=dt)
    k = 0
    for b in range(c):
        for ty in range(py):
            for tx in range(px):
                off, size = int(idx[2 * k]), int(idx[2 * k + 1])
                k += 1
                if size == 0:
                    continue
                blob = data[off:off + size]
                if comp == "LERC":
                    from gdal_ray.compress import lerc_decode

                    tile = np.asarray(lerc_decode(blob))
                elif comp in ("PNG", "PPNG"):
                    from gdal_ray.codecs.png import decode_png

                    tile = decode_png(blob)
                elif comp == "JPEG":
                    from gdal_ray.codecs import decode

                    tile = decode(blob)
                elif comp == "DEFLATE":
                    import zlib

                    tile = np.frombuffer(zlib.decompress(blob),
                                         dtype=dt).reshape(ph, pw)
                elif comp == "ZSTD":
                    from gdal_ray.compress import zstd_decompress

                    tile = np.frombuffer(zstd_decompress(blob),
                                         dtype=dt).reshape(ph, pw)
                elif comp == "NONE":
                    tile = np.frombuffer(blob, dtype=dt).reshape(ph, pw)
                elif comp == "TIF":
                    from gdal_ray.codecs.tiff import decode_tiff

                    tile = decode_tiff(blob)
                else:
                    raise NotImplementedError(f"MRF compression {comp}")
                tile = np.asarray(tile)
                if tile.ndim == 3 and tile.shape[2] == 1:
                    tile = tile[:, :, 0]
                t = np.nan_to_num(tile[:ph, :pw]) \
                    if tile.dtype.kind == "f" and dt.kind != "f" \
                    else tile[:ph, :pw]
                out[ty * ph:ty * ph + t.shape[0],
                    tx * pw:tx * pw + t.shape[1], b] = t.astype(dt)
    out = out[:h, :w]
    return out[:, :, 0] if c == 1 else out


# ------------------------------------------------------------- ISCE

_ISCE_DT = {"BYTE": "u1", "SHORT": "i2", "INT": "i4", "FLOAT": "f4",
            "DOUBLE": "f8", "CFLOAT": "c8", "CDOUBLE": "c16"}


def isce_meta(path: str) -> dict:
    """JPL ISCE image (frmts/raw/iscedataset.cpp): raw data + an
    <imageFile> XML of <property name=..><value>..</value> pairs."""
    xml = open(path + ".xml").read()
    kv = {}
    for m in re.finditer(
            r'<property name="([^"]+)">\s*<value>([^<]*)</value>', xml):
        kv[m.group(1).upper()] = m.group(2).strip()
    w = int(kv["WIDTH"])
    h = int(kv["LENGTH"])
    nb = int(kv.get("NUMBER_BANDS", "1"))
    dt = _ISCE_DT[kv.get("DATA_TYPE", "FLOAT").upper()]
    bo = "<" if kv.get("BYTE_ORDER", "l").lower().startswith("l") else ">"
    return {"driver": "ISCE", "width": w, "height": h, "bands": nb,
            "dtype": bo + dt, "scheme": kv.get("SCHEME", "BIP").upper()}


def read_isce_array(path: str) -> np.ndarray:
    m = isce_meta(path)
    w, h, nb = m["width"], m["height"], m["bands"]
    dt = np.dtype(m["dtype"])
    raw = np.frombuffer(open(path, "rb").read(w * h * nb * dt.itemsize),
                        dtype=dt)
    sch = m["scheme"]
    if sch == "BIP":
        a = raw.reshape(h, w, nb)
    elif sch == "BIL":
        a = raw.reshape(h, nb, w).transpose(0, 2, 1)
    else:  # BSQ
        a = raw.reshape(nb, h, w).transpose(1, 2, 0)
    a = np.ascontiguousarray(a.astype(dt.newbyteorder("=")))
    return a[:, :, 0] if nb == 1 else a


# ------------------------------------------------- Arc/Info Binary Grid

AIG_NODATA = -2147483647


def _aig_file(cover_dir: str, name: str) -> str:
    """Case-insensitive coverage file lookup (UC coverages use
    HDR.ADF etc.)."""
    p = os.path.join(cover_dir, name)
    if os.path.exists(p):
        return p
    up = os.path.join(cover_dir, name.upper())
    if os.path.exists(up):
        return up
    for f in os.listdir(cover_dir):
        if f.lower() == name:
            return os.path.join(cover_dir, f)
    raise FileNotFoundError(p)


def aig_meta(cover_dir: str) -> dict:
    """Arc/Info Binary Grid coverage directory (frmts/aigrid/gridlib.c):
    hdr.adf (BE: cell type @16, compressed flag @20, cell sizes @256/264,
    blocks per row/col @288/292, block size @296/304), dblbnd.adf
    (LLX, LLY, URX, URY doubles), w001001x.adf block index."""
    h = open(_aig_file(cover_dir, "hdr.adf"), "rb").read(308)
    cell_type = struct.unpack_from(">i", h, 16)[0]
    # gridlib.c:856 inverts the raw flag: 0 on disk means COMPRESSED
    compressed = not struct.unpack_from(">i", h, 20)[0]
    csx, csy = struct.unpack_from(">2d", h, 256)
    bx = struct.unpack_from(">i", h, 296)[0]
    by = struct.unpack_from(">i", h, 304)[0]
    llx, lly, urx, ury = struct.unpack(
        ">4d", open(_aig_file(cover_dir, "dblbnd.adf"), "rb").read(32))
    w = int((urx - llx + 0.5 * csx) / csx)
    hgt = int((ury - lly + 0.5 * csy) / csy)
    return {"driver": "AIG", "width": w, "height": hgt, "bands": 1,
            "dtype": "float32" if cell_type == 2 else "int32",
            "cell_type": cell_type, "compressed": compressed,
            "block_w": bx, "block_h": by,
            "geotransform": (llx, csx, 0.0, ury, 0.0, -csy)}


def _aig_runlength(cur: bytes, magic: int, nmin: int, ntot: int,
                   out: np.ndarray):
    """The marker-based run family (gridlib.c AIGProcessBlock)."""
    pos = 0
    n = 0
    I32 = 1 << 32
    while n < ntot and pos < len(cur):
        marker = cur[pos]
        pos += 1
        if magic == 0xE0:
            v = (struct.unpack_from(">i", cur, pos)[0] + nmin + I32) % I32
            pos += 4
            out[n:n + marker] = np.int64(v).astype(np.int64)
            n += marker
        elif magic == 0xF0:
            v = cur[pos] * 256 + cur[pos + 1] + nmin
            pos += 2
            out[n:n + marker] = v
            n += marker
        elif magic in (0xFC, 0xF8):
            v = cur[pos] + nmin
            pos += 1
            out[n:n + marker] = v
            n += marker
        elif magic == 0xDF and marker < 128:
            out[n:n + marker] = nmin
            n += marker
        elif magic == 0xD7 and marker < 128:
            vals = np.frombuffer(cur, np.uint8, marker, pos).astype(
                np.int64) + nmin
            pos += marker
            out[n:n + marker] = vals
            n += marker
        elif magic == 0xCF and marker < 128:
            vals = np.frombuffer(cur, ">u2", marker, pos).astype(
                np.int64) + nmin
            pos += 2 * marker
            out[n:n + marker] = vals
            n += marker
        elif marker > 128:
            cnt = 256 - marker
            out[n:n + cnt] = AIG_NODATA
            n += cnt
        else:
            raise ValueError(f"AIG run magic {magic:#x} marker {marker}")


def _aig_block(raw: bytes, m: dict) -> np.ndarray:
    bw, bh = m["block_w"], m["block_h"]
    ntot = bw * bh
    if m["cell_type"] == 2:  # float
        return np.frombuffer(raw, ">f4", ntot).astype(
            np.float32).reshape(bh, bw)
    out = np.full(ntot, AIG_NODATA, dtype=np.int64)
    if not m["compressed"]:
        out[:] = np.frombuffer(raw, ">i4", ntot)
        return out.reshape(bh, bw).astype(np.int32)
    magic = raw[0]
    min_size = raw[1]
    pos = 2
    nmin = 0
    if min_size == 4:
        nmin = struct.unpack_from(">i", raw, pos)[0]
    else:
        for i in range(min_size):
            nmin = nmin * 256 + raw[pos + i]
        if min_size and raw[pos] >= 128:  # sign-extend short mins
            nmin -= 1 << (8 * min_size)
    pos += min_size
    cur = raw[pos:]
    if magic == 0x00:
        out[:] = nmin
    elif magic == 0x08:
        out[:] = np.frombuffer(cur, np.uint8, ntot).astype(
            np.int64) + nmin
    elif magic == 0x04:
        b = np.frombuffer(cur, np.uint8, (ntot + 1) // 2)
        nib = np.empty(len(b) * 2, np.int64)
        nib[0::2] = b >> 4
        nib[1::2] = b & 0xF
        out[:] = nib[:ntot] + nmin
    elif magic == 0x01:
        bits = np.unpackbits(np.frombuffer(
            cur, np.uint8, (ntot + 7) // 8))[:ntot]
        out[:] = bits.astype(np.int64) + nmin
    elif magic == 0x10:
        out[:] = np.frombuffer(cur, ">u2", ntot).astype(np.int64) + nmin
    elif magic == 0x20:
        v = np.frombuffer(cur, ">i4", ntot).astype(np.int64)
        out[:] = (v + nmin + (1 << 32)) % (1 << 32)
    elif magic == 0xFF:
        raise NotImplementedError("AIG CCITT-RLE (0xFF) block")
    else:
        _aig_runlength(cur, magic, nmin, ntot, out)
    out = ((out + (1 << 31)) % (1 << 32)) - (1 << 31)  # int32 rollover
    return out.reshape(bh, bw).astype(np.int32)


def read_aig_array(cover_dir: str) -> np.ndarray:
    m = aig_meta(cover_dir)
    w, h = m["width"], m["height"]
    bw, bh = m["block_w"], m["block_h"]
    idx = open(_aig_file(cover_dir, "w001001x.adf"), "rb").read()
    n_blocks = (len(idx) - 100) // 8
    entries = np.frombuffer(idx, ">i4", n_blocks * 2, 100)
    tiles_per_row = (w - 1) // bw + 1
    dt = np.float32 if m["cell_type"] == 2 else np.int32
    fill = np.nan if m["cell_type"] == 2 else AIG_NODATA
    out = np.full((((h - 1) // bh + 1) * bh, tiles_per_row * bw), fill,
                  dtype=dt)
    data = open(_aig_file(cover_dir, "w001001.adf"), "rb").read()
    for i in range(n_blocks):
        off = int(entries[2 * i]) * 2
        size = int(entries[2 * i + 1]) * 2
        if size <= 0:
            continue
        blk = _aig_block(data[off + 2:off + 2 + size], m)
        ty, tx = divmod(i, tiles_per_row)
        out[ty * bh:(ty + 1) * bh, tx * bw:(tx + 1) * bw] = blk
    return out[:h, :w]


# ----------------------------------------------------------- USGS DOQ2

def doq2_meta(path: str) -> dict:
    """USGS DOQ (keyword header, frmts/raw/doq2dataset.cpp): '*'-
    terminated keyword records; BYTE_COUNT = header length, data is
    BIP/BIL/BSQ bytes after it."""
    head = open(path, "rb").read(65536).decode("latin-1", "replace")
    kv = {}
    n_contents = 0
    for line in head.split("*"):
        toks = line.split()
        if not toks:
            continue
        if toks[0] == "BAND_CONTENT":
            n_contents += 1
        elif len(toks) > 1:
            kv.setdefault(toks[0], toks[1:])
    w, h = int(kv["SAMPLES_AND_LINES"][0]), int(kv["SAMPLES_AND_LINES"][1])
    x0, y0 = (float(v) for v in kv["XY_ORIGIN"][:2])
    res = float(kv.get("HORIZONTAL_RESOLUTION", ["1"])[0])
    bpp = int(kv.get("BITS_PER_PIXEL", ["8"])[0]) // 8
    return {"driver": "DOQ2", "width": w, "height": h,
            "bands": max(n_contents, 1), "dtype": "uint8",
            "organization": kv.get("BAND_ORGANIZATION", ["BIP"])[0],
            "header_bytes": int(kv.get("BYTE_COUNT", ["0"])[0]),
            "bytes_per_pixel": bpp,
            "quadrangle": " ".join(kv.get("QUADRANGLE_NAME", [])),
            "geotransform": (x0, res, 0.0, y0, 0.0, -res)}


def read_doq2_array(path: str, *, max_rows: int | None = None
                    ) -> np.ndarray:
    """-> (h, w, bands) uint8; truncated files zero-fill the tail."""
    m = doq2_meta(path)
    w, h, nb = m["width"], m["height"], m["bands"]
    if max_rows is not None:
        h = min(h, max_rows)
    want = w * h * nb
    with open(path, "rb") as f:
        f.seek(m["header_bytes"])
        raw = f.read(want)
    raw = raw + b"\0" * (want - len(raw))
    a = np.frombuffer(raw, np.uint8)
    org = m["organization"].upper()
    if org == "BIP":
        return a.reshape(h, w, nb)
    if org == "BIL":
        return a.reshape(h, nb, w).transpose(0, 2, 1)
    return a.reshape(nb, h, w).transpose(1, 2, 0)


# ---------------------------------------------------------------- GSC

def gsc_meta(path: str) -> dict:
    """GSC geogrid (frmts/raw/gscdataset.cpp): Fortran records — int32
    LE record length / pixels / lines, second record holds 8 float32
    (dx, dy, x0, ?, ?, y0, ...); float32 rows with 4-byte markers."""
    h = open(path, "rb").read(20)
    rec_len = struct.unpack_from("<i", h, 0)[0]
    npix = struct.unpack_from("<i", h, 4)[0]
    nlin = struct.unpack_from("<i", h, 8)[0]
    if rec_len != npix * 4:
        raise ValueError("not a GSC file (record length mismatch)")
    rec = rec_len + 8
    with open(path, "rb") as f:
        f.seek(rec + 12)
        info = struct.unpack("<8f", f.read(32))
    return {"driver": "GSC", "width": npix, "height": nlin, "bands": 1,
            "dtype": "float32", "nodata": -1.0000000150474662199e+30,
            "record_bytes": rec,
            "geotransform": (info[2], info[0], 0.0, info[5], 0.0,
                             -info[1])}


def read_gsc_array(path: str) -> np.ndarray:
    m = gsc_meta(path)
    w, hgt = m["width"], m["height"]
    rec = m["record_bytes"]
    out = np.zeros((hgt, w), np.float32)
    with open(path, "rb") as f:
        for r in range(hgt):
            f.seek(rec * 2 + 4 + r * rec)
            out[r] = np.frombuffer(f.read(4 * w), "<f4")
    return out
