"""NTv2 datum-shift grid driver (.gsb) + grid-shift transform.

Format (public NTv2 specification, as read by the reference's
frmts/ntv2/ntv2dataset.cpp and by PROJ's hgridshift):

- 11 overview header records, 16 bytes each: 8-char ASCII key + 8-byte
  value (int32 for NUM_*, double for the rest; byte order detected from
  NUM_OREC's int32 field).
- Per subgrid: 11 header records (SUB_NAME, PARENT, CREATED, UPDATED,
  S_LAT, N_LAT, E_LONG, W_LONG, LAT_INC, LONG_INC, GS_COUNT) followed by
  GS_COUNT nodes of 4 float32s: lat shift, lon shift (arc-seconds; NTv2
  longitudes are POSITIVE WEST), lat/lon accuracy.
- Node order: rows south->north; within a row longitudes run E_LONG ->
  W_LONG in LONG_INC steps (i.e. increasing west longitude).

The reference exposes a .gsb as a 4-band raster (NTv2Dataset); here
`read_gsb` parses the headers driver-side and `gsb_dataset` yields one
chunk row per subgrid (shift rasters as in-row arrays) so the grids flow
through the same chunked-raster pipeline as every other store.  The
transform side (`ntv2_transform`) applies bilinear-interpolated shifts —
forward adds the shift (source->target datum), inverse iterates (the
standard fixed-point used by PROJ, converging in 2-4 rounds).

Subgrid selection: densest (finest LAT_INC) subgrid containing the
point, matching the parent/child refinement semantics.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np


@dataclass
class Subgrid:
    name: str
    parent: str
    s_lat: float   # arc-seconds
    n_lat: float
    e_long: float  # arc-seconds, positive WEST
    w_long: float
    lat_inc: float
    lon_inc: float
    # (nrows, ncols) float32 arrays, row 0 = southernmost
    lat_shift: np.ndarray = field(repr=False, default=None)
    lon_shift: np.ndarray = field(repr=False, default=None)
    lat_acc: np.ndarray = field(repr=False, default=None)
    lon_acc: np.ndarray = field(repr=False, default=None)

    @property
    def shape(self):
        nrows = int(round((self.n_lat - self.s_lat) / self.lat_inc)) + 1
        ncols = int(round((self.w_long - self.e_long) / self.lon_inc)) + 1
        return nrows, ncols

    def contains(self, lon_w_sec, lat_sec):
        return ((lat_sec >= self.s_lat) & (lat_sec <= self.n_lat)
                & (lon_w_sec >= self.e_long) & (lon_w_sec <= self.w_long))


def _hdr_records(buf: bytes, off: int, n: int):
    out = {}
    for i in range(n):
        rec = buf[off + 16 * i: off + 16 * (i + 1)]
        out[rec[:8].decode("ascii", "replace").strip()] = rec[8:]
    return out


def read_gsb(path_or_bytes) -> list[Subgrid]:
    """Parse a .gsb file -> list of subgrids (grids in memory; NTv2 files
    are small — the CONUS/Canada grids are a few MB)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            buf = f.read()
    over = _hdr_records(buf, 0, 11)
    if "NUM_OREC" not in over:
        raise ValueError("not an NTv2 .gsb file (missing NUM_OREC)")
    # byte order: NUM_OREC is the int32 11 in the file's endianness
    le = struct.unpack_from("<i", over["NUM_OREC"], 0)[0] == 11
    e = "<" if le else ">"
    num_file = struct.unpack(e + "i", over["NUM_FILE"][:4])[0]
    gs_type = over.get("GS_TYPE", b"SECONDS ").decode("ascii").strip()
    if gs_type != "SECONDS":
        raise NotImplementedError(f"NTv2 GS_TYPE={gs_type!r} (SECONDS only)")
    off = 11 * 16
    grids = []
    for _ in range(num_file):
        h = _hdr_records(buf, off, 11)
        off += 11 * 16
        cnt = struct.unpack(e + "i", h["GS_COUNT"][:4])[0]
        g = Subgrid(
            name=h["SUB_NAME"].decode("ascii").strip(),
            parent=h["PARENT"].decode("ascii").strip(),
            s_lat=struct.unpack(e + "d", h["S_LAT"])[0],
            n_lat=struct.unpack(e + "d", h["N_LAT"])[0],
            e_long=struct.unpack(e + "d", h["E_LONG"])[0],
            w_long=struct.unpack(e + "d", h["W_LONG"])[0],
            lat_inc=struct.unpack(e + "d", h["LAT_INC"])[0],
            lon_inc=struct.unpack(e + "d", h["LONG_INC"])[0],
        )
        nrows, ncols = g.shape
        if cnt != nrows * ncols:
            raise ValueError(f"GS_COUNT {cnt} != {nrows}x{ncols}")
        vals = np.frombuffer(buf, dtype=e + "f4", count=cnt * 4, offset=off)
        off += cnt * 16
        vals = vals.reshape(nrows, ncols, 4)
        g.lat_shift = vals[:, :, 0].copy()
        g.lon_shift = vals[:, :, 1].copy()
        g.lat_acc = vals[:, :, 2].copy()
        g.lon_acc = vals[:, :, 3].copy()
        grids.append(g)
    return grids


def write_gsb(path: str, grids: list[Subgrid], *,
              system_f: str = "NAD27", system_t: str = "NAD83") -> None:
    """Write an NTv2 .gsb (little-endian) — fixture/round-trip path and
    the exporter for engine-computed shift surfaces."""
    def rec(key: str, val: bytes) -> bytes:
        return key.encode("ascii").ljust(8)[:8] + val

    def drec(key: str, v: float) -> bytes:
        return rec(key, struct.pack("<d", v))

    def irec(key: str, v: int) -> bytes:
        return rec(key, struct.pack("<i", v) + b"\x00\x00\x00\x00")

    def srec(key: str, s: str) -> bytes:
        return rec(key, s.encode("ascii").ljust(8)[:8])

    out = bytearray()
    out += irec("NUM_OREC", 11)
    out += irec("NUM_SREC", 11)
    out += irec("NUM_FILE", len(grids))
    out += srec("GS_TYPE", "SECONDS")
    out += srec("VERSION", "NTv2.0")
    out += srec("SYSTEM_F", system_f)
    out += srec("SYSTEM_T", system_t)
    out += drec("MAJOR_F", 6378206.4)
    out += drec("MINOR_F", 6356583.8)
    out += drec("MAJOR_T", 6378137.0)
    out += drec("MINOR_T", 6356752.314)
    for g in grids:
        nrows, ncols = g.shape
        out += srec("SUB_NAME", g.name)
        out += srec("PARENT", g.parent or "NONE")
        out += srec("CREATED", "2026")
        out += srec("UPDATED", "2026")
        out += drec("S_LAT", g.s_lat)
        out += drec("N_LAT", g.n_lat)
        out += drec("E_LONG", g.e_long)
        out += drec("W_LONG", g.w_long)
        out += drec("LAT_INC", g.lat_inc)
        out += drec("LONG_INC", g.lon_inc)
        out += irec("GS_COUNT", nrows * ncols)
        node = np.stack([g.lat_shift, g.lon_shift,
                         g.lat_acc if g.lat_acc is not None
                         else np.zeros_like(g.lat_shift),
                         g.lon_acc if g.lon_acc is not None
                         else np.zeros_like(g.lat_shift)], axis=-1)
        out += node.astype("<f4").tobytes()
    out += b"END     " + b"\x00" * 8
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(out))
    import os
    os.replace(tmp, path)


def _interp_shift(g: Subgrid, lon_w_sec, lat_sec):
    """Bilinear shift interpolation inside subgrid g (vectorized)."""
    col = (lon_w_sec - g.e_long) / g.lon_inc
    row = (lat_sec - g.s_lat) / g.lat_inc
    nrows, ncols = g.lat_shift.shape
    c0 = np.clip(np.floor(col).astype(np.int64), 0, ncols - 2)
    r0 = np.clip(np.floor(row).astype(np.int64), 0, nrows - 2)
    fc = col - c0
    fr = row - r0
    out = []
    for plane in (g.lat_shift, g.lon_shift):
        p = plane.astype(np.float64)
        v = (p[r0, c0] * (1 - fr) * (1 - fc)
             + p[r0, c0 + 1] * (1 - fr) * fc
             + p[r0 + 1, c0] * fr * (1 - fc)
             + p[r0 + 1, c0 + 1] * fr * fc)
        out.append(v)
    return out[0], out[1]


def ntv2_transform(grids_or_path):
    """-> (fwd, inv) transforms in degrees (lon positive EAST).

    fwd: source-datum lon/lat -> target datum (adds the grid shift);
    inv: fixed-point iteration (PROJ's hgridshift inverse).  Points
    outside every subgrid pass through unchanged (reference behavior:
    outside-grid points are not shifted)."""
    grids = (read_gsb(grids_or_path)
             if isinstance(grids_or_path, (str, bytes, bytearray))
             else list(grids_or_path))
    # densest first so the first containing grid is the refinement leaf
    order = sorted(grids, key=lambda g: g.lat_inc)

    def shift(lon_deg, lat_deg):
        lon = np.asarray(lon_deg, dtype=np.float64)
        lat = np.asarray(lat_deg, dtype=np.float64)
        lon_w = -lon * 3600.0  # east-positive degrees -> west-positive sec
        lat_s = lat * 3600.0
        dlat = np.zeros_like(lat_s)
        dlon_w = np.zeros_like(lon_w)
        todo = np.ones(lat_s.shape, dtype=bool)
        for g in order:
            m = todo & g.contains(lon_w, lat_s)
            if not m.any():
                continue
            a, o = _interp_shift(g, lon_w[m], lat_s[m])
            dlat[m] = a
            dlon_w[m] = o
            todo[m] = False
        return dlat / 3600.0, dlon_w / 3600.0

    def fwd(lon, lat):
        dlat, dlon_w = shift(lon, lat)
        return np.asarray(lon) - dlon_w, np.asarray(lat) + dlat

    def inv(lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        src_lon, src_lat = lon.copy(), lat.copy()
        for _ in range(10):
            flon, flat = fwd(src_lon, src_lat)
            err_lon = flon - lon
            err_lat = flat - lat
            src_lon -= err_lon
            src_lat -= err_lat
            if max(np.abs(err_lon).max(initial=0.0),
                   np.abs(err_lat).max(initial=0.0)) < 1e-12:
                break
        return src_lon, src_lat

    return fwd, inv


def read_ntv2(path: str, **kw):
    """.gsb -> Dataset of chunk rows (one row per subgrid), bands stacked
    (4, nrows, ncols) float32 like the reference's 4-band NTv2Dataset."""
    import ray.data as rd

    grids = read_gsb(path)
    rows = []
    for i, g in enumerate(grids):
        nrows, ncols = g.shape
        rows.append({
            "chunk_id": i,
            "name": g.name,
            "parent": g.parent,
            "width": ncols,
            "height": nrows,
            # degrees, east-positive bounding box
            "west": -g.w_long / 3600.0,
            "east": -g.e_long / 3600.0,
            "south": g.s_lat / 3600.0,
            "north": g.n_lat / 3600.0,
            "bands": 4,
            "data": np.stack([g.lat_shift, g.lon_shift,
                              g.lat_acc, g.lon_acc]).tobytes(),
            "dtype": "float32",
        })
    return rd.from_items(rows)
