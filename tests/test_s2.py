"""S2 cell index invariants (stages/s2.py, from the public s2geometry
spec).  These pin the spec tables structurally: wrong kPosToIJ /
kPosToOrientation entries break Hilbert continuity almost everywhere,
wrong face tables break the leaf round-trip."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages import s2


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(42)
    return rng.uniform(-180, 180, 5000), rng.uniform(-89.9, 89.9, 5000)


def test_leaf_roundtrip(pts):
    # leaf cells are ~1 cm; center must land within one leaf diagonal
    lon, lat = pts
    cid = s2.lonlat_to_cell(lon, lat)
    clon, clat = s2.cell_center_lonlat(cid)
    assert np.abs(clat - lat).max() < 5e-7
    assert (np.abs(clon - lon) * np.cos(np.radians(lat))).max() < 5e-7


def test_levels_parent_range(pts):
    lon, lat = pts
    cid = s2.lonlat_to_cell(lon, lat)
    assert (s2.cell_level(cid) == 30).all()
    for level in (0, 5, 12, 29):
        par = s2.cell_parent(cid, level)
        assert (s2.cell_level(par) == level).all()
        lo, hi = s2.cell_range(par)
        assert ((cid >= lo) & (cid <= hi)).all()
        # parent of the leaf == direct assignment at that level
        assert (par == s2.lonlat_to_cell(lon, lat, level=level)).all()


def test_face_cell_tokens():
    # the six face cells have the canonical tokens 1,3,5,7,9,b
    lon = np.array([0.0, 90.0, 10.0, 180.0, -90.0, 10.0])
    lat = np.array([0.0, 0.0, 89.99, 0.0, 0.0, -89.99])
    tok = s2.cell_token(s2.cell_parent(s2.lonlat_to_cell(lon, lat), 0))
    assert tok == ["1", "3", "5", "7", "9", "b"]


def test_hilbert_continuity():
    # consecutive leaf ids along the curve are 4-adjacent in (i, j):
    # the defining property of a correct Hilbert table pair
    pos = np.arange(100000, dtype=np.int64)
    ids = (np.int64(2) << 61) | (pos << 1) | 1
    f, i, j, lvl = s2.id_to_face_ij(ids)
    assert (f == 2).all() and (lvl == 30).all()
    assert (np.abs(np.diff(i)) + np.abs(np.diff(j)) == 1).all()
    # and the decode inverts the encode exactly
    assert (s2.face_ij_to_id(f, i, j, level=30) == ids).all()


def test_children_parent_inverse(pts):
    lon, lat = pts
    c8 = s2.lonlat_to_cell(lon[:500], lat[:500], level=8)
    ch = s2.cell_children(c8)
    assert ch.shape == (500, 4)
    assert (s2.cell_level(ch.ravel()) == 9).all()
    assert (s2.cell_parent(ch.ravel(), 8).reshape(-1, 4) == c8[:, None]).all()
    # children partition the parent's leaf range exactly
    lo, hi = s2.cell_range(c8)
    clo, chi = s2.cell_range(ch.ravel())
    assert (clo.reshape(-1, 4)[:, 0] == lo).all()
    assert (chi.reshape(-1, 4)[:, 3] == hi).all()


BOXES = [(2.0, 48.0, 5.5, 50.5), (-179.5, -10.0, -175.0, -5.0),
         (170.0, 60.0, 179.0, 65.0), (-1.0, -0.5, 1.0, 0.5),
         (100.0, 80.0, 140.0, 86.0)]


@pytest.mark.parametrize("level", [4, 8])
def test_cover_bbox_complete(level):
    # every densely-sampled point's cell is in the covering, and the
    # covering is not wildly larger than the true intersecting set
    for lon0, lat0, lon1, lat1 in BOXES:
        cover = set(s2.cover_bbox(lon0, lat0, lon1, lat1, level=level).tolist())
        gx, gy = np.meshgrid(np.linspace(lon0, lon1, 60),
                             np.linspace(lat0, lat1, 60))
        cells = set(s2.lonlat_to_cell(gx.ravel(), gy.ravel(), level=level).tolist())
        assert cells <= cover
        assert len(cover) < 8 * len(cells) + 40


def test_cover_polar_cap():
    cover = set(s2.cover_bbox(-180.0, 88.0, 180.0, 90.0, level=6).tolist())
    gx, gy = np.meshgrid(np.linspace(-180, 180, 400), np.linspace(88, 89.999, 50))
    cells = s2.lonlat_to_cell(gx.ravel(), gy.ravel(), level=6)
    assert set(cells.tolist()) <= cover


def test_cover_batch_matches_scalar():
    lon0 = np.array([b[0] for b in BOXES])
    lat0 = np.array([b[1] for b in BOXES])
    lon1 = np.array([b[2] for b in BOXES])
    lat1 = np.array([b[3] for b in BOXES])
    row, cell = s2.cover_bboxes_batch(lon0, lat0, lon1, lat1, level=6)
    for r, (a, b, c, d) in enumerate(BOXES):
        got = cell[row == r]
        exp = s2.cover_bbox(a, b, c, d, level=6)
        assert (got == exp).all()


def test_assign_cells_batch():
    t = pa.table({"lon": [2.35, -74.0], "lat": [48.85, 40.71]})
    out = s2.assign_cells_batch(t, lon_col="lon", lat_col="lat", level=10)
    assert out.column("s2_cell").type == pa.int64()
    cid = out.column("s2_cell").to_numpy()
    assert (s2.cell_level(cid) == 10).all()
    # Paris and NYC land on different faces' subtrees
    assert cid[0] != cid[1]
