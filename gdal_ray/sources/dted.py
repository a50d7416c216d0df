"""DTED elevation driver — from the public MIL-PRF-89020B layout
(reference: frmts/dted/dted_api.c reads the same wire format).

File = 80-byte UHL (ASCII: origin DDDMMSSH lon / DDDMMSSH lat, data
intervals in tenths of arc-seconds, line/point counts) + 648-byte DSI +
2700-byte ACC, then one fixed-size data record per LONGITUDE COLUMN
(west→east): 0xAA sentinel, 3-byte block count, 2-byte lon index,
2-byte lat index, nlat big-endian SIGNED-MAGNITUDE elevations
(south→north), 4-byte checksum (u32 sum of the record's other bytes).

Scale shape: header parses driver-side; records are fixed size, so the
Ray reader fans out column ranges and each task seeks straight to its
byte range (the rawgrid/netcdf3 pattern).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

_DATA_START = 80 + 648 + 2700
DTED_NODATA = -32767


def _dms(value: float, is_lat: bool) -> bytes:
    hemi = ("N" if value >= 0 else "S") if is_lat else \
        ("E" if value >= 0 else "W")
    v = abs(value)
    d = int(v)
    m = int((v - d) * 60 + 1e-9)
    s = int(round(((v - d) * 60 - m) * 60))
    return f"{d:03d}{m:02d}{s:02d}{hemi}".encode()


def _parse_dms(field: bytes) -> float:
    t = field.decode().strip()
    hemi = t[-1]
    digits = t[:-1]
    s = int(digits[-2:])
    m = int(digits[-4:-2])
    d = int(digits[:-4])
    v = d + m / 60.0 + s / 3600.0
    return -v if hemi in ("S", "W") else v


def write_dted(path: str, arr: np.ndarray, *, lon0: float, lat0: float) -> None:
    """(nlat, nlon) int16 elevations (row 0 = SOUTH edge) covering the
    1°×1° cell with SW corner (lon0, lat0) -> DTED file (atomic)."""
    arr = np.asarray(arr, dtype=np.int64)
    nlat, nlon = arr.shape
    if np.abs(arr).max(initial=0) > 0x7FFF:
        raise ValueError("elevations exceed signed-magnitude 15-bit range")
    lon_int = round(3600.0 / (nlon - 1) * 10)  # tenths of arcsec
    lat_int = round(3600.0 / (nlat - 1) * 10)

    uhl = bytearray(b" " * 80)
    uhl[0:4] = b"UHL1"
    uhl[4:12] = _dms(lon0, False)
    uhl[12:20] = _dms(lat0, True)
    uhl[20:24] = f"{lon_int:04d}".encode()
    uhl[24:28] = f"{lat_int:04d}".encode()
    uhl[28:32] = b"NA  "
    uhl[32:35] = b"U  "
    uhl[47:51] = f"{nlon:04d}".encode()
    uhl[51:55] = f"{nlat:04d}".encode()
    uhl[55:56] = b"0"

    dsi = bytearray(b" " * 648)
    dsi[0:4] = b"DSI "
    acc = bytearray(b" " * 2700)
    acc[0:4] = b"ACC "

    # signed-magnitude encode
    mag = np.where(arr < 0, (-arr) | 0x8000, arr).astype(">u2")
    out = bytearray()
    out += uhl + dsi + acc
    for col in range(nlon):
        rec = bytearray()
        rec.append(0xAA)
        rec += struct.pack(">I", col)[1:]       # 3-byte block count
        rec += struct.pack(">HH", col, 0)       # lon / lat counts
        rec += mag[:, col].tobytes()            # south → north
        ck = int(np.frombuffer(bytes(rec), np.uint8).sum())
        rec += struct.pack(">I", ck)
        out += rec
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(out))
    os.replace(tmp, path)


def dted_meta(path: str) -> dict:
    with open(path, "rb") as f:
        uhl = f.read(80)
    if uhl[:4] != b"UHL1":
        raise ValueError("not a DTED file (no UHL1)")
    lon_f, lat_f = uhl[4:12], uhl[12:20]
    # hemisphere letters detect inverted headers (the reference swaps
    # them back; autotest dted/n43_coord_inverted.dt0)
    if lon_f[-1:] in b"NS" and lat_f[-1:] in b"EW":
        lon_f, lat_f = lat_f, lon_f
    lon0 = _parse_dms(lon_f)
    lat0 = _parse_dms(lat_f)
    lon_int = int(uhl[20:24]) / 10.0 / 3600.0   # degrees
    lat_int = int(uhl[24:28]) / 10.0 / 3600.0
    nlon = int(uhl[47:51])
    nlat = int(uhl[51:55])
    return {
        "format": "DTED", "width": nlon, "height": nlat,
        "dtype": "<i2", "nodata": DTED_NODATA,
        # north-up geotransform, pixel centers on the graticule
        "geotransform": [lon0 - lon_int / 2, lon_int, 0.0,
                         lat0 + (nlat - 1) * lat_int + lat_int / 2,
                         0.0, -lat_int],
    }


def _decode_record(rec: bytes, nlat: int, col: int) -> np.ndarray:
    if rec[0] != 0xAA:
        raise ValueError(f"DTED record {col}: bad sentinel 0x{rec[0]:02X}")
    ck = struct.unpack_from(">I", rec, len(rec) - 4)[0]
    if int(np.frombuffer(rec[:-4], np.uint8).sum()) != ck:
        raise ValueError(f"DTED record {col}: checksum mismatch")
    mag = np.frombuffer(rec, ">u2", count=nlat, offset=8).astype(np.int32)
    return np.where(mag & 0x8000, -(mag & 0x7FFF), mag).astype(np.int16)


def read_dted_array(path: str) -> np.ndarray:
    """Full read -> (nlat, nlon) int16, row 0 = SOUTH edge.  Columns
    place by their embedded longitude index (partial/sparse files per
    the reference, autotest checksums 56006/56369); absent columns fill
    with DTED_NODATA; present-but-corrupt records still raise."""
    m = dted_meta(path)
    nlat, nlon = m["height"], m["width"]
    rec_size = 12 + 2 * nlat
    out = np.full((nlat, nlon), DTED_NODATA, np.int16)
    with open(path, "rb") as f:
        f.seek(_DATA_START)
        data = f.read()
    for k in range(len(data) // rec_size):
        rec = data[k * rec_size:(k + 1) * rec_size]
        if rec[0] != 0xAA:
            raise ValueError(f"DTED record {k}: bad sentinel "
                             f"0x{rec[0]:02X}")
        col = struct.unpack_from(">H", rec, 4)[0]
        if col >= nlon:
            continue
        out[:, col] = _decode_record(rec, nlat, col)
    return out


def read_dted(path: str, *, cols_per_block: int = 256):
    """-> ray.data.Dataset of column-slab rows (col0, n_cols,
    data:binary little-endian int16, south→north within each column)."""
    import ray.data as rd

    m = dted_meta(path)
    nlat, nlon = m["height"], m["width"]
    rec_size = 12 + 2 * nlat
    items = [{"col0": c, "n_cols": min(cols_per_block, nlon - c)}
             for c in range(0, nlon, cols_per_block)]

    def load(t: pa.Table) -> pa.Table:
        rows = {"col0": [], "n_cols": [], "data": []}
        with open(path, "rb") as f:
            for it in t.to_pylist():
                f.seek(_DATA_START + it["col0"] * rec_size)
                raw = f.read(it["n_cols"] * rec_size)
                cols = [
                    _decode_record(raw[i * rec_size:(i + 1) * rec_size],
                                   nlat, it["col0"] + i)
                    for i in range(it["n_cols"])
                ]
                rows["col0"].append(it["col0"])
                rows["n_cols"].append(it["n_cols"])
                rows["data"].append(
                    np.stack(cols, axis=1).astype("<i2").tobytes())
        return pa.table({
            "col0": pa.array(rows["col0"], pa.int64()),
            "n_cols": pa.array(rows["n_cols"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    return rd.from_items(items).map_batches(load, batch_format="pyarrow")
