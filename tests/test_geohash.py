"""Geohash (tilemath): published test vectors + encode/decode consistency."""

import numpy as np

from gdal_ray.tilemath import geohash_decode_bounds, geohash_encode


def test_published_vectors():
    # the canonical example from the public geohash documentation
    assert geohash_encode([10.40744], [57.64911], 11) == ["u4pruydqqvj"]
    # well-known city prefixes (widely published lookup tables)
    assert geohash_encode([-0.1278], [51.5074], 5) == ["gcpvj"]
    assert geohash_encode([2.3522], [48.8566], 5) == ["u09tv"]


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(4)
    lons = rng.uniform(-180, 180, 200)
    lats = rng.uniform(-90, 90, 200)
    for p in (1, 5, 9):
        ghs = geohash_encode(lons, lats, p)
        for gh, lon, lat in zip(ghs, lons, lats):
            x0, y0, x1, y1 = geohash_decode_bounds(gh)
            assert x0 <= lon < x1 or x1 == 180.0 and lon <= x1
            assert y0 <= lat < y1 or y1 == 90.0 and lat <= y1
    # neighbors in a 5-char cell share the prefix
    base = geohash_encode([10.0], [50.0], 7)[0]
    x0, y0, x1, y1 = geohash_decode_bounds(base[:5])
    inner = geohash_encode([(x0 + x1) / 2], [(y0 + y1) / 2], 7)[0]
    assert inner[:5] == base[:5]
