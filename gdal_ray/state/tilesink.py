"""Physical z/x/y tile-tree sink — the file layout of `gdal raster tile`
(apps/gdalalg_raster_tile.cpp) and gdal2tiles:

    out_dir/<z>/<x>/<y>.png

Semantics mirrored from the reference:
- atomic publish: write `<y>.png.tmp.<pid>` then os.replace
  (gdalalg_raster_tile.cpp:476-493);
- resume: a tile whose final file exists is skipped
  (gdalalg_raster_tile.cpp:377-382, gdal2tiles --resume);
- alpha dropped when fully opaque (gdalalg_raster_tile.cpp:412-421).

The write runs inside map_batches, so tiles stream from the mosaic
groupby straight to disk on whatever node rendered them — only the tiny
(z, x, y, written) summary returns to the driver.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from gdal_ray.codecs.png import encode_png


def write_tile_tree(tiles_ds, out_dir: str, *, tile_size: int, resume: bool = True):
    """Write a rendered-tiles Dataset (z, x, y, rgb, alpha raw bytes) as a
    z/x/y PNG tree.  Returns the summary Dataset (z, x, y, written) —
    consume it (e.g. .to_pandas()) to drive the write."""
    ts = tile_size

    def write_batch(b: pa.Table) -> pa.Table:
        zs = b.column("z").to_numpy()
        xs = b.column("x").to_numpy()
        ys = b.column("y").to_numpy()
        rgbs = b.column("rgb").to_pylist()
        alphas = b.column("alpha").to_pylist()
        written = np.zeros(len(zs), dtype=bool)
        for i in range(len(zs)):
            d = os.path.join(out_dir, str(int(zs[i])), str(int(xs[i])))
            final = os.path.join(d, f"{int(ys[i])}.png")
            if resume and os.path.exists(final):
                continue
            os.makedirs(d, exist_ok=True)
            rgb = np.frombuffer(rgbs[i], dtype=np.uint8).reshape(ts, ts, 3)
            a = np.frombuffer(alphas[i], dtype=np.uint8).reshape(ts, ts)
            img = rgb if (a == 255).all() else np.dstack([rgb, a])
            data = encode_png(img)
            tmp = f"{final}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, final)
            written[i] = True
        return pa.table(
            {
                "z": b.column("z"),
                "x": b.column("x"),
                "y": b.column("y"),
                "written": pa.array(written),
            }
        )

    return tiles_ds.map_batches(write_batch, batch_format="pyarrow")
