"""Physical z/x/y tile-tree sink: layout, atomicity leftovers, resume
(delete-half + rerun completes with byte-identical tree), alpha-drop."""

import hashlib
import os
import shutil

import numpy as np
import pytest


@pytest.fixture(scope="module")
def levels(ray_session):
    from gdal_ray.sources import synth_images
    from gdal_ray.stages.render import render_pyramid

    return render_pyramid(synth_images(120), base_zoom=4, min_zoom=3, tile_size=32)


def _tree_digest(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for fn in files:
            p = os.path.join(dirpath, fn)
            out[os.path.relpath(p, root)] = hashlib.sha1(open(p, "rb").read()).hexdigest()
    return out


def test_tile_tree_write_and_resume(tmp_path, levels):
    from gdal_ray.state.tilesink import write_tile_tree

    root = str(tmp_path / "tree")
    n_written = 0
    for lv in levels:
        res = write_tile_tree(lv, root, tile_size=32).to_pandas()
        n_written += int(res["written"].sum())
    digest = _tree_digest(root)
    assert n_written == len(digest) > 0
    assert not any(".tmp" in p for p in digest)  # atomic publish, no leftovers
    # layout: every path is z/x/y.png
    for rel in digest:
        parts = rel.split(os.sep)
        assert len(parts) == 3 and parts[2].endswith(".png")

    # simulate a killed run: delete every other file, rerun, tree must be
    # byte-identical and only the deleted tiles rewritten
    victims = sorted(digest)[::2]
    for rel in victims:
        os.remove(os.path.join(root, rel))
    rewritten = 0
    for lv in levels:
        res = write_tile_tree(lv, root, tile_size=32).to_pandas()
        rewritten += int(res["written"].sum())
    assert rewritten == len(victims)
    assert _tree_digest(root) == digest


def test_tile_tree_alpha_drop(tmp_path, levels):
    """Fully-opaque tiles are written as RGB (3 channels), partial ones
    keep their alpha plane (gdalalg_raster_tile.cpp:412-421)."""
    from gdal_ray.codecs.png import decode_png
    from gdal_ray.state.tilesink import write_tile_tree

    import pyarrow as pa
    import ray.data as rd

    root = str(tmp_path / "tree2")
    ts = 32
    rgb = (np.arange(ts * ts * 3) % 251).astype(np.uint8).tobytes()
    opaque = np.full(ts * ts, 255, np.uint8)
    partial = opaque.copy()
    partial[: ts * ts // 2] = 0
    hand = rd.from_arrow(
        pa.table(
            {
                "z": pa.array([1, 1], pa.int64()),
                "x": pa.array([0, 1], pa.int64()),
                "y": pa.array([0, 0], pa.int64()),
                "rgb": pa.array([rgb, rgb], pa.binary()),
                "alpha": pa.array([opaque.tobytes(), partial.tobytes()], pa.binary()),
            }
        )
    )
    write_tile_tree(hand, root, tile_size=ts).to_pandas()
    img_o = decode_png(open(os.path.join(root, "1", "0", "0.png"), "rb").read())
    assert img_o.ndim == 3 and img_o.shape[2] == 3  # alpha dropped
    img_p = decode_png(open(os.path.join(root, "1", "1", "0.png"), "rb").read())
    assert img_p.shape[2] == 4
    assert (img_p[:, :, 3].ravel() == partial).all()

    # real fixture tiles round-trip their alpha plane too
    tiles = levels[0].to_pandas()
    troot = str(tmp_path / "tree3")
    write_tile_tree(levels[0], troot, tile_size=ts).to_pandas()
    r = tiles.iloc[0]
    p = os.path.join(troot, str(r["z"]), str(r["x"]), f"{r['y']}.png")
    img = decode_png(open(p, "rb").read())
    a = np.frombuffer(r["alpha"], dtype=np.uint8)
    if (a == 255).all():
        assert img.shape[2] == 3
    else:
        assert (img[:, :, 3].ravel() == a).all()


def test_tile_sidecars(tmp_path):
    """gdal2tiles viewer sidecars: TMS 1.0 tilemapresource.xml with one
    TileSet per zoom at mercator units-per-pixel, and a leaflet.html
    wired to the XYZ tree."""
    import xml.etree.ElementTree as ET

    from gdal_ray.state.tilesink import write_tile_sidecars

    paths = write_tile_sidecars(str(tmp_path), min_zoom=2, max_zoom=5,
                                bounds_lonlat=(-10.0, 35.0, 30.0, 60.0),
                                tile_size=256, title="t")
    root = ET.parse(paths[0]).getroot()
    assert root.find("SRS").text == "EPSG:3857"
    sets = root.find("TileSets").findall("TileSet")
    assert [s.attrib["order"] for s in sets] == ["2", "3", "4", "5"]
    # units-per-pixel halves per zoom
    upp = [float(s.attrib["units-per-pixel"]) for s in sets]
    for a, b in zip(upp, upp[1:]):
        assert a / b == 2.0
    assert float(upp[0]) == 2 * 20037508.342789244 / 256 / 4
    bb = root.find("BoundingBox").attrib
    assert float(bb["minx"]) < 0 < float(bb["maxx"])
    html = open(paths[1]).read()
    assert "{z}/{x}/{y}.png" in html and "tms: false" in html
    # idempotent overwrite (atomic publish)
    write_tile_sidecars(str(tmp_path), min_zoom=2, max_zoom=5,
                        bounds_lonlat=(-10.0, 35.0, 30.0, 60.0))
