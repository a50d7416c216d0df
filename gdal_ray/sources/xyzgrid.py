"""XYZ ASCII driver — frmts/xyz/xyzdataset.cpp + apps/gdal2xyz.py
analogues: "x y z" lines <-> point Dataset / raster chunk rows.

Read is fully parallel via ``ray.data.read_text`` (Ray splits the file;
each task parses its own lines vectorized).  ``raster_to_xyz`` is the
gdal2xyz direction: chunk rows -> per-pixel (x, y, value) point rows at
pixel centers, a pure flat map with no shuffle.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def read_xyz(path: str, *, column_names=("x", "y", "z")):
    """-> Dataset(x: float64, y: float64, z: float64); '#' comment lines
    and blank lines skipped (the reference tolerates both)."""
    import ray.data as rd

    names = list(column_names)

    def parse(b: pa.Table) -> pa.Table:
        lines = [s for s in b.column("text").to_pylist()
                 if s and not s.lstrip().startswith("#")]
        if not lines:
            return pa.table({n: pa.array([], pa.float64()) for n in names})
        arr = np.array(" ".join(lines).split(), dtype=np.float64)
        arr = arr.reshape(-1, len(names))
        return pa.table({n: pa.array(arr[:, i], pa.float64())
                         for i, n in enumerate(names)})

    return rd.read_text(path).map_batches(parse, batch_format="pyarrow")


def write_xyz(ds, path: str, *, fmt: str = "%.10g") -> int:
    """Point Dataset (x, y, z) -> one .xyz file (driver-side streaming
    iterator over batches — single-file ASCII is inherently one writer;
    use partitioned parquet for the scale path).  Returns rows written."""
    n = 0
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for b in ds.iter_batches(batch_format="pyarrow"):
            cols = [b.column(c).to_numpy() for c in ("x", "y", "z")]
            block = np.column_stack(cols)
            np.savetxt(f, block, fmt=fmt, delimiter=" ")
            n += len(block)
    os.replace(tmp, path)
    return n


def raster_to_xyz(chunks_ds, geotransform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                  *, band: int = 0, spp: int = 1, dtype="f8",
                  skip_nodata: float | None = None):
    """gdal2xyz: Dataset of chunk rows (row0, col0, h, w, data) ->
    Dataset of (x, y, z) pixel-center points."""
    gt = geotransform
    dt = np.dtype(dtype)

    def explode(b: pa.Table) -> pa.Table:
        xs, ys, zs = [], [], []
        for it in b.to_pylist():
            blk = np.frombuffer(it["data"], dtype=dt)
            blk = blk.reshape(it["h"], it["w"], spp)[:, :, band]
            rr, cc = np.meshgrid(
                np.arange(it["h"], dtype=np.float64) + it["row0"],
                np.arange(it["w"], dtype=np.float64) + it["col0"],
                indexing="ij")
            x = gt[0] + (cc + 0.5) * gt[1]
            y = gt[3] + (rr + 0.5) * gt[5]
            z = blk.astype(np.float64)
            if skip_nodata is not None:
                keep = z != skip_nodata
                x, y, z = x[keep], y[keep], z[keep]
            xs.append(x.ravel())
            ys.append(y.ravel())
            zs.append(z.ravel())
        cat = (np.concatenate(v) if v else np.empty(0) for v in (xs, ys, zs))
        return pa.table({n: pa.array(v, pa.float64())
                         for n, v in zip(("x", "y", "z"), cat)})

    return chunks_ds.map_batches(explode, batch_format="pyarrow")
