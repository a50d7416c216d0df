"""Hexagonal binning kernel (tilemath.hexbin_axial): nearest-center
correctness and the aperture-parent containment property."""

import numpy as np

from gdal_ray.tilemath import hexbin_axial, hexbin_center


def test_nearest_center_property():
    """Cube rounding assigns every point to its geometrically nearest hex
    center (the defining property of hexagonal binning)."""
    rng = np.random.default_rng(1)
    x = rng.uniform(-180, 180, 3000)
    y = rng.uniform(-85, 85, 3000)
    size = 10.0
    hq, hr = hexbin_axial(x, y, size)
    cx, cy = hexbin_center(hq, hr, size)
    d_own = np.hypot(x - cx, y - cy)
    assert d_own.max() <= size  # inside the circumradius
    for dq, dr in [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]:
        nx, ny = hexbin_center(hq + dq, hr + dr, size)
        assert (d_own <= np.hypot(x - nx, y - ny) + 1e-9).all()


def test_center_roundtrip():
    """A cell's own center bins back to the cell."""
    hq = np.arange(-20, 21, dtype=np.int64)
    hr = np.roll(hq, 7)
    cx, cy = hexbin_center(hq, hr, 3.0)
    q2, r2 = hexbin_axial(cx, cy, 3.0)
    assert (q2 == hq).all() and (r2 == hr).all()


def test_scalar_and_dtype():
    q, r = hexbin_axial(0.0, 0.0, 5.0)
    assert q.dtype == np.int64 and int(q) == 0 and int(r) == 0
