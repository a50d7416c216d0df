"""Tile-matrix math (WebMercatorQuad + WorldCRS84Quad), vectorized numpy.

Semantics follow the reference's ``gdal2tiles.py`` classes
``GlobalMercator`` (swig/python/gdal-utils/osgeo_utils/gdal2tiles.py:315)
and ``GlobalGeodetic`` (:534), and ``gcore/tilematrixset.cpp`` (OGC TMS).
Key conventions reproduced exactly:

- spherical mercator, R = 6378137, origin shift 20037508.342789244
  (gdal2tiles.py:424-429);
- ``PixelsToTile``: ``tx = ceil(px / tile_size) - 1`` (gdal2tiles.py:479)
  — a point exactly on a tile boundary belongs to the *lower* tile;
- TMS y origin bottom-left; XYZ ("Google") y = 2**z - 1 - ty
  (``GoogleTile``, gdal2tiles.py:511);
- ``ZoomForPixelSize``: largest z with resolution(z) >= pixel_size, never
  scaling up (gdal2tiles.py:503-509);
- quadkey digit encoding per ``QuadTree`` (gdal2tiles.py:517-531).

All functions accept scalars or numpy arrays (float64 / int64) and are
fully vectorized — these run inside ``map_batches`` hot loops.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS = 6378137.0
ORIGIN_SHIFT = 2.0 * np.pi * EARTH_RADIUS / 2.0  # 20037508.342789244
TILE_SIZE = 256
INITIAL_RESOLUTION = 2.0 * np.pi * EARTH_RADIUS / TILE_SIZE  # 156543.03392804097
MAX_ZOOM = 32
MAX_LATITUDE = 85.05112877980659  # atan(sinh(pi)) in degrees


# ---------------------------------------------------------------------------
# Spherical mercator (EPSG:4326 <-> EPSG:3857)

def lonlat_to_meters(lon, lat):
    """WGS84 lon/lat -> spherical-mercator meters (gdal2tiles LatLonToMeters)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    mx = lon * ORIGIN_SHIFT / 180.0
    my = np.log(np.tan((90.0 + lat) * np.pi / 360.0)) / (np.pi / 180.0)
    my = my * ORIGIN_SHIFT / 180.0
    return mx, my


def meters_to_lonlat(mx, my):
    """Spherical-mercator meters -> WGS84 lon/lat (gdal2tiles MetersToLatLon)."""
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    lon = (mx / ORIGIN_SHIFT) * 180.0
    lat = (my / ORIGIN_SHIFT) * 180.0
    lat = 180.0 / np.pi * (2.0 * np.arctan(np.exp(lat * np.pi / 180.0)) - np.pi / 2.0)
    return lon, lat


def resolution(zoom):
    """Meters/pixel at equator for a zoom level (gdal2tiles Resolution)."""
    return INITIAL_RESOLUTION / np.power(2.0, np.asarray(zoom, dtype=np.float64))


def zoom_for_pixel_size(pixel_size):
    """Max zoom not scaling up (gdal2tiles ZoomForPixelSize:503).

    Reference: first i in [0,32) with pixel_size > resolution(i) returns
    max(0, i-1); if none, 31.  Closed form: the largest z such that
    resolution(z) >= pixel_size, clipped to [0, 31].
    """
    ps = np.asarray(pixel_size, dtype=np.float64)
    with np.errstate(divide="ignore"):
        z = np.floor(np.log2(INITIAL_RESOLUTION / ps)).astype(np.int64)
    # Exact-power edge: if resolution(z+1) >= ps (log2 rounding), bump up.
    z = np.where(INITIAL_RESOLUTION / np.power(2.0, z + 1) >= ps, z + 1, z)
    # And if resolution(z) < ps (other rounding direction), bump down.
    z = np.where(INITIAL_RESOLUTION / np.power(2.0, np.maximum(z, 0)) < ps, z - 1, z)
    return np.clip(z, 0, MAX_ZOOM - 1)


# ---------------------------------------------------------------------------
# Pixels / tiles

def _pixels_to_tile(p):
    """ceil(p / TILE_SIZE) - 1, boundary in lower tile (gdal2tiles PixelsToTile)."""
    return np.ceil(np.asarray(p, dtype=np.float64) / float(TILE_SIZE)).astype(np.int64) - 1


def meters_to_tile_tms(mx, my, zoom):
    """Mercator meters -> TMS tile (tx, ty_tms) at zoom."""
    res = resolution(zoom)
    px = (np.asarray(mx, dtype=np.float64) + ORIGIN_SHIFT) / res
    py = (np.asarray(my, dtype=np.float64) + ORIGIN_SHIFT) / res
    return _pixels_to_tile(px), _pixels_to_tile(py)


def tms_to_xyz_y(ty_tms, zoom):
    """TMS y -> XYZ/Google y (gdal2tiles GoogleTile)."""
    return (np.int64(1) << np.asarray(zoom, dtype=np.int64)) - 1 - np.asarray(ty_tms, dtype=np.int64)


def lonlat_to_tile_xyz(lon, lat, zoom):
    """lon/lat -> XYZ tile (x, y) at zoom, mercator pyramid, clipped to matrix."""
    mx, my = lonlat_to_meters(lon, np.clip(lat, -MAX_LATITUDE, MAX_LATITUDE))
    tx, ty_tms = meters_to_tile_tms(mx, my, zoom)
    n = np.int64(1) << np.asarray(zoom, dtype=np.int64)
    tx = np.clip(tx, 0, n - 1)
    ty_tms = np.clip(ty_tms, 0, n - 1)
    return tx, tms_to_xyz_y(ty_tms, zoom)


def tile_bounds_meters(tx, ty_tms, zoom):
    """TMS tile -> (minx, miny, maxx, maxy) in mercator meters (TileBounds)."""
    res = resolution(zoom)
    tx = np.asarray(tx, dtype=np.float64)
    ty = np.asarray(ty_tms, dtype=np.float64)
    minx = tx * TILE_SIZE * res - ORIGIN_SHIFT
    miny = ty * TILE_SIZE * res - ORIGIN_SHIFT
    maxx = (tx + 1) * TILE_SIZE * res - ORIGIN_SHIFT
    maxy = (ty + 1) * TILE_SIZE * res - ORIGIN_SHIFT
    return minx, miny, maxx, maxy


def tile_bounds_lonlat_xyz(x, y, zoom):
    """XYZ tile -> (lon_min, lat_min, lon_max, lat_max)."""
    ty_tms = tms_to_xyz_y(np.asarray(y, dtype=np.int64), zoom)  # involution
    minx, miny, maxx, maxy = tile_bounds_meters(x, ty_tms, zoom)
    lon0, lat0 = meters_to_lonlat(minx, miny)
    lon1, lat1 = meters_to_lonlat(maxx, maxy)
    return lon0, lat0, lon1, lat1


def quadkey_int(x, y, zoom):
    """XYZ tile -> packed int64 quadkey with zoom prefix.

    Bit-interleaves (x, y) like gdal2tiles QuadTree (:517) digit encoding
    (digit = bit(x) + 2*bit(y), MSB first) and prepends the zoom so keys of
    different zooms never collide: key = (z << 58) | interleave(x, y).
    Valid for z <= 29.
    """
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    z = np.asarray(zoom, dtype=np.int64)
    key = np.zeros_like(x)
    zmax = int(np.max(z)) if z.size else 0
    for i in range(zmax):
        bit = np.int64(i)
        key |= ((x >> bit) & 1) << (2 * bit)
        key |= ((y >> bit) & 1) << (2 * bit + 1)
    return (z << np.int64(58)) | key


def quadkey_decode(key):
    """Inverse of quadkey_int: packed int64 quadkey -> (x, y, zoom).
    Vectorized bit de-interleave."""
    key = np.asarray(key, dtype=np.int64)
    z = key >> np.int64(58)
    body = key & ((np.int64(1) << np.int64(58)) - 1)
    x = np.zeros_like(key)
    y = np.zeros_like(key)
    zmax = int(np.max(z)) if z.size else 0
    for i in range(zmax):
        bit = np.int64(i)
        x |= ((body >> (2 * bit)) & 1) << bit
        y |= ((body >> (2 * bit + 1)) & 1) << bit
    return x, y, z


def quadkey_str(x, y, zoom: int) -> str:
    """XYZ tile -> Microsoft quadkey string (gdal2tiles QuadTree semantics)."""
    out = []
    for i in range(int(zoom), 0, -1):
        digit = 0
        mask = 1 << (i - 1)
        if int(x) & mask:
            digit += 1
        if int(y) & mask:
            digit += 2
        out.append(str(digit))
    return "".join(out)


def parent_tile(x, y, zoom):
    """XYZ tile -> its parent at zoom-1 (pyramid 4->1 reduction key)."""
    return np.asarray(x, dtype=np.int64) >> 1, np.asarray(y, dtype=np.int64) >> 1, np.asarray(zoom, dtype=np.int64) - 1


# ---------------------------------------------------------------------------
# Geodetic (plate carrée) pyramid — gdal2tiles GlobalGeodetic (:534).
# Two 256px tiles across at z=0 (WorldCRS84Quad): res0 = 180/256 deg/px.

GEODETIC_RES0 = 180.0 / TILE_SIZE


def lonlat_to_tile_geodetic(lon, lat, zoom):
    """lon/lat -> geodetic XYZ tile (x, y top-left origin) at zoom.

    GlobalGeodetic.LonLatToPixels (gdal2tiles.py:570): px = (180+lon)/res,
    py = (90+lat)/res, res = 180/256/2**z; tile = ceil(p/256)-1 (TMS y),
    then y-flip with matrix height 2**z.
    """
    res = GEODETIC_RES0 / np.power(2.0, np.asarray(zoom, dtype=np.float64))
    px = (180.0 + np.asarray(lon, dtype=np.float64)) / res
    py = (90.0 + np.asarray(lat, dtype=np.float64)) / res
    tx = _pixels_to_tile(px)
    ty_tms = _pixels_to_tile(py)
    z = np.asarray(zoom, dtype=np.int64)
    tx = np.clip(tx, 0, (np.int64(2) << z) - 1)       # 2*2**z tiles across
    ty_tms = np.clip(ty_tms, 0, (np.int64(1) << z) - 1)
    y = (np.int64(1) << z) - 1 - ty_tms
    return tx, y


def bbox_to_tile_range_xyz(lon_min, lat_min, lon_max, lat_max, zoom):
    """Covering XYZ mercator tile range for a lon/lat bbox.

    Returns (x0, x1, y0, y1) inclusive int64 arrays; y in XYZ convention so
    y0 (from lat_max) <= y1 (from lat_min).  Mirrors gdal2tiles
    generate_base_tiles' corner-to-tile clamping (:2831-2844).
    """
    x0, y0 = lonlat_to_tile_xyz(lon_min, lat_max, zoom)  # top-left
    x1, y1 = lonlat_to_tile_xyz(lon_max, lat_min, zoom)  # bottom-right
    return x0, np.maximum(x0, x1), y0, np.maximum(y0, y1)


# ------------------------------------------------------------------ geohash

_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lons, lats, precision: int = 9):
    """Vectorized Geohash encode (public spec, Niemeyer 2008 / the
    Wikipedia reference algorithm): interleave longitude/latitude
    bisection bits, 5 bits per base-32 character, even bit = longitude.

    Returns a list of `precision`-char strings.  Complements the XYZ /
    quadkey / S2 indexes: geohash is the common key in ElasticSearch /
    Redis geo pipelines, so crawl joins against such corpora need it."""
    import numpy as np

    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    n = lons.shape[0]
    nbits = precision * 5
    bits = np.zeros((n, nbits), dtype=np.uint8)
    lo_x = np.full(n, -180.0)
    hi_x = np.full(n, 180.0)
    lo_y = np.full(n, -90.0)
    hi_y = np.full(n, 90.0)
    for b in range(nbits):
        if b % 2 == 0:           # even bit: longitude
            mid = (lo_x + hi_x) / 2.0
            hit = lons >= mid
            bits[:, b] = hit
            lo_x = np.where(hit, mid, lo_x)
            hi_x = np.where(hit, hi_x, mid)
        else:                    # odd bit: latitude
            mid = (lo_y + hi_y) / 2.0
            hit = lats >= mid
            bits[:, b] = hit
            lo_y = np.where(hit, mid, lo_y)
            hi_y = np.where(hit, hi_y, mid)
    vals = bits.reshape(n, precision, 5)
    chars = (vals * np.array([16, 8, 4, 2, 1], dtype=np.uint8)).sum(axis=2)
    lut = np.frombuffer(_GH32.encode(), dtype=np.uint8)
    raw = lut[chars]  # (n, precision) ascii codes
    return [bytes(row).decode() for row in raw]


def geohash_decode_bounds(gh: str):
    """Geohash → (lon_min, lat_min, lon_max, lat_max) cell bounds."""
    lo_x, hi_x, lo_y, hi_y = -180.0, 180.0, -90.0, 90.0
    even = True
    for ch in gh:
        v = _GH32.index(ch)
        for m in (16, 8, 4, 2, 1):
            if even:
                mid = (lo_x + hi_x) / 2.0
                if v & m:
                    lo_x = mid
                else:
                    hi_x = mid
            else:
                mid = (lo_y + hi_y) / 2.0
                if v & m:
                    lo_y = mid
                else:
                    hi_y = mid
            even = not even
    return lo_x, lo_y, hi_x, hi_y


def hexbin_axial(x, y, size: float):
    """Pointy-top hexagonal binning: planar (x, y) → axial (q, r) cell
    ids at the given hex size (circumradius), via fractional axial
    coordinates + cube rounding (the published hex-grid algorithm the
    H3-style cell schemes build on; aperture-k parent rollups reuse the
    same kernel at size*sqrt(k)).

    Every operation (multiply/divide/add, floor, abs, sqrt) is an IEEE
    correctly-rounded double op evaluated in the same order as the SQL
    twin in queries.py, so cell assignment is bit-identical in numpy and
    DuckDB — the oracle contract."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    q = (np.sqrt(3.0) / 3.0 * x - y / 3.0) / size
    r = (2.0 * y / 3.0) / size
    rx = np.floor(q + 0.5)
    ry = np.floor(-q - r + 0.5)
    rz = np.floor(r + 0.5)
    dx = np.abs(rx - q)
    dy = np.abs(ry - (-q - r))
    dz = np.abs(rz - r)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & ~(dy > dz)
    hq = np.where(fix_x, -ry - rz, rx)
    hr = np.where(fix_z, -rx - ry, rz)
    return hq.astype(np.int64), hr.astype(np.int64)


def hexbin_center(hq, hr, size: float):
    """Axial hex cell → planar center (inverse of hexbin_axial's lattice)."""
    hq = np.asarray(hq, dtype=np.float64)
    hr = np.asarray(hr, dtype=np.float64)
    x = size * (np.sqrt(3.0) * hq + np.sqrt(3.0) / 2.0 * hr)
    y = size * (3.0 / 2.0 * hr)
    return x, y
