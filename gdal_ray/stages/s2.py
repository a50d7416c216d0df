"""S2 cell index — the spherical quad-tree cell scheme the north star
names ("assign each image-footprint to H3/S2 cells", "explicit
H3-cell-keyed repartitioning").  Implemented from the PUBLIC s2geometry
spec (s2geometry.io; s2coords.h face/UV/ST tables, s2cellid.cc Hilbert
bit layout) in vectorized numpy — no external library.

Layout (64-bit cell id): 3 face bits | 2·level Hilbert position bits |
a trailing 1 bit marking the level; leaf = level 30.  The Hilbert
traversal uses the canonical S2 tables

    kPosToIJ[orient][pos]   (pos -> (i<<1 | j) within a quad)
    kPosToOrientation[pos]  (orientation delta: swap=1, invert=2)

with initial orientation `face & 1`, exactly the published scheme, so
ids are portable S2 ids (tokens match any S2 implementation).

Projection: lat/lng -> unit XYZ -> cube face (largest |component|) ->
(u,v) by the per-face division table -> (s,t) by the QUADRATIC
projection (u>=0: s = sqrt(1+3u)/2 else 1 - sqrt(1-3u)/2) -> 30-bit
(i,j).  All steps vectorized; the Hilbert walk is a numpy loop over
LEVELS (<=30 iterations of O(n) ops), never over points.

Scale shape: cell assignment is a pure per-batch kernel (shuffle-free);
cell-keyed repartitioning / aggregation then groups by a single int64 —
the "ONE partitioning key reused across stages" the brief asks for.
Parent extraction is two bit ops (`cell_parent`), so multi-resolution
rollups reuse the leaf assignment without re-projecting.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SWAP, INVERT = 1, 2
MAX_LEVEL = 30

# kPosToIJ / kPosToOrientation from s2coords.h (public spec tables).
POS_TO_IJ = np.array([
    [0, 1, 3, 2],   # canonical order
    [0, 2, 3, 1],   # axes swapped
    [3, 2, 0, 1],   # bits inverted
    [3, 1, 0, 2],   # swapped & inverted
], dtype=np.int64)
POS_TO_ORIENT = np.array([SWAP, 0, 0, INVERT | SWAP], dtype=np.int64)

# inverse: IJ_TO_POS[orient][ij] -> pos
IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _o in range(4):
    for _p in range(4):
        IJ_TO_POS[_o, POS_TO_IJ[_o, _p]] = _p


def _lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray):
    phi, lam = np.radians(lat), np.radians(lon)
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    """Cube face (0-5) + per-face (u, v) — s2coords.h ValidFaceXYZtoUV."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= np.maximum(ay, az), 0,
                    np.where(ay >= az, 1, 2)).astype(np.int64)
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face)
    # np.choose evaluates every branch; off-face divisions may hit 0.
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.choose(face, [y / x, -x / y, -x / z, z / x, z / y, -y / z])
        v = np.choose(face, [z / x, z / y, -y / z, y / x, -x / y, -x / z])
    return face, u, v


def _face_uv_to_xyz(face, u, v):
    """Canonical FaceUVtoXYZ table (s2coords.h)."""
    one = np.ones_like(u)
    x = np.choose(face, [one, -u, -u, -one, v, v])
    y = np.choose(face, [u, one, -v, -v, -one, u])
    z = np.choose(face, [v, v, one, -u, -u, -one])
    return x, y, z


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    # S2_QUADRATIC_PROJECTION; np.where evaluates both branches, so one
    # sqrt argument is negative whenever |u| > 1/3 — mask the warning.
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0),
                    (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip((s * (1 << MAX_LEVEL)).astype(np.int64),
                   0, (1 << MAX_LEVEL) - 1)


def face_ij_to_id(face: np.ndarray, i: np.ndarray, j: np.ndarray,
                  level: int = MAX_LEVEL) -> np.ndarray:
    """Vectorized FromFaceIJ: Hilbert walk over the top `level` bit pairs
    of 30-bit (i, j).  id = face(3b) . pos(2*level b) . 1 . zeros."""
    face = np.asarray(face, np.int64)
    i = np.asarray(i, np.int64)
    j = np.asarray(j, np.int64)
    n = face << np.int64(61)
    orient = face & SWAP
    pos = np.zeros_like(n)
    for k in range(MAX_LEVEL - 1, MAX_LEVEL - 1 - level, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = IJ_TO_POS[orient, ij]
        pos = (pos << 2) | p
        orient = orient ^ POS_TO_ORIENT[p]
    shift = np.int64(2 * (MAX_LEVEL - level) + 1)
    return n | (pos << shift) | (np.int64(1) << (shift - 1))


def _trailing_zeros(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, np.int64)
    tz = np.zeros(v.shape, np.int64)
    cur = v.copy()
    for width in (32, 16, 8, 4, 2, 1):
        mask = (cur & ((np.int64(1) << width) - 1)) == 0
        tz[mask] += width
        cur = np.where(mask, cur >> np.int64(width), cur)
    return tz


def cell_level(cid: np.ndarray) -> np.ndarray:
    """Level from the trailing-1 marker: leaf=30 has lsb at bit 0."""
    return MAX_LEVEL - (_trailing_zeros(np.asarray(cid, np.int64)) >> 1)


def id_to_face_ij(cid: np.ndarray):
    """Inverse Hilbert walk -> (face, i, j at `level` resolution, level)."""
    cid = np.asarray(cid, np.int64)
    level = cell_level(cid)
    face = (cid >> np.int64(61)) & 7
    orient = face & SWAP
    i = np.zeros_like(cid)
    j = np.zeros_like(cid)
    for lv in range(1, MAX_LEVEL + 1):
        active = lv <= level
        shift = np.int64(2 * (MAX_LEVEL - lv) + 1)
        p = np.where(active, (cid >> shift) & 3, 0)
        ij = POS_TO_IJ[orient, p]
        i = np.where(active, (i << 1) | ((ij >> 1) & 1), i)
        j = np.where(active, (j << 1) | (ij & 1), j)
        orient = np.where(active, orient ^ POS_TO_ORIENT[p], orient)
    return face, i, j, level


def lonlat_to_cell(lon, lat, *, level: int = MAX_LEVEL) -> np.ndarray:
    """lon/lat degrees -> S2 cell id at `level` (vectorized)."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    x, y, z = _lonlat_to_xyz(lon, lat)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    return face_ij_to_id(face, i, j, level=level)


def cell_parent(cid: np.ndarray, level: int) -> np.ndarray:
    """Parent at `level` — two bit ops, no re-projection."""
    cid = np.asarray(cid, np.int64)
    lsb = np.int64(1) << np.int64(2 * (MAX_LEVEL - level))
    return (cid & -lsb) | lsb


def cell_range(cid: np.ndarray):
    """(range_min, range_max) of leaf ids under each cell — the key to
    range-partitioning a corpus by coarse cell without re-projecting."""
    cid = np.asarray(cid, np.int64)
    lsb = cid & -cid
    return cid - lsb + 1, cid + lsb - 1


def cell_center_lonlat(cid: np.ndarray):
    """Cell center (lon, lat) degrees — inverse of the full chain."""
    face, i, j, level = id_to_face_ij(cid)
    scale = (np.int64(1) << level).astype(np.float64)
    s = (i.astype(np.float64) + 0.5) / scale
    t = (j.astype(np.float64) + 0.5) / scale
    u, v = _st_to_uv(s), _st_to_uv(t)
    x, y, z = _face_uv_to_xyz(face, u, v)
    r = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(z / r))
    lon = np.degrees(np.arctan2(y, x))
    return lon, lat


def cell_children(cid: np.ndarray) -> np.ndarray:
    """The 4 children of each cell, shape (n, 4) — pure bit arithmetic
    (children of `base|lsb` sit at base + (2k+1)*(lsb>>2) + (lsb>>2))."""
    cid = np.asarray(cid, np.int64)
    lsb = cid & -cid
    q = lsb >> 2
    k = np.arange(4, dtype=np.int64)
    return cid[:, None] - lsb[:, None] + (2 * k + 1)[None, :] * q[:, None]


def cell_corners_lonlat(cid: np.ndarray):
    """(lon, lat) of the 4 cell corners, each shape (n, 4) degrees."""
    face, i, j, level = id_to_face_ij(cid)
    scale = (np.int64(1) << level).astype(np.float64)
    di = np.array([0.0, 1.0, 0.0, 1.0])
    dj = np.array([0.0, 0.0, 1.0, 1.0])
    s = (i.astype(np.float64)[:, None] + di[None, :]) / scale[:, None]
    t = (j.astype(np.float64)[:, None] + dj[None, :]) / scale[:, None]
    u, v = _st_to_uv(s), _st_to_uv(t)
    x, y, z = _face_uv_to_xyz(face[:, None], u, v)
    r = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(z / r))
    lon = np.degrees(np.arctan2(y, x))
    return lon, lat


def _cell_bbox_conservative(cid: np.ndarray):
    """Conservative lat/lon AABB per cell: corner extremes expanded by
    half the max great-circle edge length (S2 cell edges ARE great-circle
    arcs — u=const / v=const are central planes — and latitude changes at
    most 1 rad per rad of arc, so an interior latitude extremum exceeds
    the nearest endpoint by at most half the arc).  Near-polar cells get
    the full longitude range (longitude rate 1/cos(lat) is unbounded).
    Returns (lon0, lon1, lat0, lat1, full_lon) — full_lon marks cells
    whose longitude span is conservative-wrapped."""
    lon, lat = cell_corners_lonlat(cid)
    # max corner-to-corner angular distance (degrees) as the edge bound
    clat = np.radians(lat)
    clon = np.radians(lon)
    xs = np.cos(clat) * np.cos(clon)
    ys = np.cos(clat) * np.sin(clon)
    zs = np.sin(clat)
    # max chord among the 4 corners -> arc
    dmax = np.zeros(len(cid))
    for a in range(4):
        for b in range(a + 1, 4):
            chord = np.sqrt((xs[:, a] - xs[:, b]) ** 2
                            + (ys[:, a] - ys[:, b]) ** 2
                            + (zs[:, a] - zs[:, b]) ** 2)
            dmax = np.maximum(dmax, 2.0 * np.arcsin(np.minimum(1.0, chord / 2.0)))
    pad = np.degrees(dmax) / 2.0
    lat0 = np.maximum(lat.min(axis=1) - pad, -90.0)
    lat1 = np.minimum(lat.max(axis=1) + pad, 90.0)
    lon0, lon1 = lon.min(axis=1), lon.max(axis=1)
    # longitude changes at rate 1/cos(lat) per unit arc, so the lon pad
    # must scale by the worst cos over the (lat-padded) cell; cells that
    # straddle the antimeridian or reach near-polar latitudes get the
    # full longitude range (still conservative).
    maxabslat = np.maximum(np.abs(lat0), np.abs(lat1))
    full_lon = (lon1 - lon0 > 180.0) | (maxabslat >= 89.9)
    lon_pad = pad / np.cos(np.radians(np.minimum(maxabslat, 89.9)))
    lon0 = lon0 - lon_pad
    lon1 = lon1 + lon_pad
    return lon0, lon1, lat0, lat1, full_lon


def cover_bbox(lon0: float, lat0: float, lon1: float, lat1: float,
               *, level: int) -> np.ndarray:
    """All level-`level` cells whose conservative bbox intersects the
    lat/lon rectangle — hierarchical descend from the 6 face cells
    (S2RegionCoverer-style, fixed level).  COMPLETE by construction
    (the per-cell AABB is conservative, so no intersecting cell is
    pruned); near-minimal (boundary cells may over-admit by the pad).
    Vectorized per level: one numpy pass over all surviving candidates."""
    def keep(c):
        clon0, clon1, clat0, clat1, full = _cell_bbox_conservative(c)
        lat_ok = (clat1 >= lat0) & (clat0 <= lat1)
        lon_ok = full | ((clon1 >= lon0) & (clon0 <= lon1))
        return c[lat_ok & lon_ok]

    cand = face_ij_to_id(np.arange(6), np.zeros(6, np.int64),
                         np.zeros(6, np.int64), level=0)
    for _ in range(level):
        cand = keep(cand)
        if not len(cand):
            return cand
        cand = cell_children(cand).ravel()
    return np.sort(keep(cand))


def cover_bboxes_batch(lon0, lat0, lon1, lat1, *, level: int):
    """Vectorized multi-bbox covering: one descend over the UNION of all
    rows' candidate frontiers, carrying (row, cell) pairs — the
    map_batches form of `cover_bbox` (no per-row Python loop; each level
    is one numpy pass over every surviving candidate of every row).
    Returns (row_idx, cell_id) int64 arrays, sorted by (row, cell)."""
    lon0 = np.asarray(lon0, np.float64)
    lat0 = np.asarray(lat0, np.float64)
    lon1 = np.asarray(lon1, np.float64)
    lat1 = np.asarray(lat1, np.float64)
    n = len(lon0)
    faces = face_ij_to_id(np.arange(6), np.zeros(6, np.int64),
                          np.zeros(6, np.int64), level=0)
    row = np.repeat(np.arange(n, dtype=np.int64), 6)
    cand = np.tile(faces, n)

    def keep(row, cand):
        clon0, clon1, clat0, clat1, full = _cell_bbox_conservative(cand)
        lat_ok = (clat1 >= lat0[row]) & (clat0 <= lat1[row])
        lon_ok = full | ((clon1 >= lon0[row]) & (clon0 <= lon1[row]))
        m = lat_ok & lon_ok
        return row[m], cand[m]

    for _ in range(level):
        row, cand = keep(row, cand)
        if not len(cand):
            return row, cand
        row = np.repeat(row, 4)
        cand = cell_children(cand).ravel()
    row, cand = keep(row, cand)
    order = np.lexsort((cand, row))
    return row[order], cand[order]


def cell_token(cid: np.ndarray) -> list[str]:
    """Canonical S2 token: 16-hex-digit id with trailing zeros stripped."""
    out = []
    for v in np.asarray(cid, np.int64).view(np.uint64):
        h = format(int(v), "016x").rstrip("0")
        out.append(h if h else "X")
    return out


def assign_cells_batch(batch: pa.Table, *, lon_col: str, lat_col: str,
                       level: int, out: str = "s2_cell") -> pa.Table:
    """map_batches kernel: append the S2 cell id column at `level`."""
    lon = batch.column(lon_col).to_numpy(zero_copy_only=False)
    lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
    cid = lonlat_to_cell(lon, lat, level=level)
    return batch.append_column(out, pa.array(cid, pa.int64()))
