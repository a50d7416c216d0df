"""Distributed COG writer — the reference's COG-creation workload
(frmts/gtiff/cogdriver.cpp layout; perftests/cog.py measures exactly
this) with the expensive parts on the cluster:

1. overview pyramid: per-level 4->1 tile reduce as a Ray groupby
   (each output tile assembles its <=2x2 input neighbors and runs the
   same ``_2x_reduce`` kernel the single-process writer uses — per-tile
   reduction is bit-identical to whole-array reduction because odd
   dimensions only occur at level edges, which are tile edges);
2. tile compression (the CPU cost) inside ``map_batches``;
3. the driver only runs the layout pass over compressed bytes
   (:func:`gdal_ray.codecs.tiff._cog_assemble`) and streams one file —
   a single-file container is inherently one writer; at fleet scale
   write one COG per partition through the manifest sink instead.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from gdal_ray.codecs.tiff import _2x_reduce, _cog_assemble, compress_cog_tile


def _level_dims(W: int, H: int, tile: int) -> list[tuple[int, int]]:
    dims = [(H, W)]
    while max(dims[-1]) > tile:
        h, w = dims[-1]
        dims.append(((h + 1) // 2, (w + 1) // 2))
    return dims


def _reduce_level(ds, tile: int, spp: int, dtype, resampler: str):
    """Chunk rows of level L -> chunk rows of level L+1 (4->1 groupby)."""
    dt = np.dtype(dtype)
    span = 2 * tile

    def key(b: pa.Table) -> pa.Table:
        r = b.column("row0").to_numpy()
        c = b.column("col0").to_numpy()
        return b.append_column(
            "grp", pa.array((r // span) * (1 << 32) + (c // span), pa.int64()))

    def reduce_group(g: pa.Table) -> pa.Table:
        rows = g.to_pylist()
        base_r = (rows[0]["row0"] // span) * span
        base_c = (rows[0]["col0"] // span) * span
        h_tot = max(r["row0"] + r["h"] for r in rows) - base_r
        w_tot = max(r["col0"] + r["w"] for r in rows) - base_c
        big = np.zeros((h_tot, w_tot, spp), dtype=dt)
        for r in rows:
            blk = np.frombuffer(r["data"], dtype=dt).reshape(
                r["h"], r["w"], spp)
            big[r["row0"] - base_r:r["row0"] - base_r + r["h"],
                r["col0"] - base_c:r["col0"] - base_c + r["w"]] = blk
        red = _2x_reduce(big, resampler)
        return pa.table({
            "row0": pa.array([base_r // 2], pa.int64()),
            "col0": pa.array([base_c // 2], pa.int64()),
            "h": pa.array([red.shape[0]], pa.int64()),
            "w": pa.array([red.shape[1]], pa.int64()),
            "data": pa.array([np.ascontiguousarray(red).tobytes()],
                             pa.binary()),
        })

    return (ds.map_batches(key, batch_format="pyarrow")
            .groupby("grp")
            .map_groups(lambda g: reduce_group(g.drop_columns(["grp"])),
                        batch_format="pyarrow"))


def write_cog_distributed(chunks_ds, path: str, *, width: int, height: int,
                          spp: int = 1, dtype="u1", tile_size: int = 256,
                          compression: str = "deflate", resampler: str = "average",
                          geotransform=None, epsg: int | None = None,
                          nodata: float | None = None) -> dict:
    """Dataset of TILE-ALIGNED chunk rows (row0, col0, h, w, data) at full
    resolution -> one Cloud-Optimized GeoTIFF.  Pyramid + compression run
    on the cluster; the driver assembles the layout.  Returns
    {levels, tiles, bytes}."""
    dt = np.dtype(dtype)
    comp_id = {"none": 1, "deflate": 8, "lzw": 5, "packbits": 32773,
               "jpeg": 7, "zstd": 50000, "lerc": 34887}[compression]
    if comp_id == 7 and (dt != np.uint8 or spp not in (1, 3)):
        raise NotImplementedError("JPEG COG needs uint8, 1 or 3 bands")
    dims = _level_dims(width, height, tile_size)

    def compress(b: pa.Table) -> pa.Table:
        idxs, blobs = [], []
        for r in b.to_pylist():
            blk = np.frombuffer(r["data"], dtype=dt).reshape(
                r["h"], r["w"], spp)
            pad = np.zeros((tile_size, tile_size, spp), dtype=dt)
            pad[:r["h"], :r["w"]] = blk
            idxs.append((r["row0"], r["col0"]))
            blobs.append(compress_cog_tile(pad, compression))
        return pa.table({
            "row0": pa.array([i[0] for i in idxs], pa.int64()),
            "col0": pa.array([i[1] for i in idxs], pa.int64()),
            "blob": pa.array(blobs, pa.binary()),
        })

    level_chunks: list[list[bytes]] = []
    ds = chunks_ds
    for li, (h, w) in enumerate(dims):
        ds = ds.materialize()  # level barrier: reused by compress + reduce
        tx = (w + tile_size - 1) // tile_size
        ty = (h + tile_size - 1) // tile_size
        tiles: dict[int, bytes] = {}
        comp = ds.map_batches(compress, batch_format="pyarrow")
        for b in comp.iter_batches(batch_format="pyarrow"):
            for r0, c0, blob in zip(b.column("row0").to_pylist(),
                                    b.column("col0").to_pylist(),
                                    b.column("blob").to_pylist()):
                tiles[(r0 // tile_size) * tx + c0 // tile_size] = blob
        if len(tiles) != tx * ty:
            raise ValueError(
                f"level {li}: {len(tiles)} tiles != expected {tx * ty} "
                "(input chunks must be tile-aligned and complete)")
        level_chunks.append([tiles[i] for i in range(tx * ty)])
        if li + 1 < len(dims):
            ds = _reduce_level(ds, tile_size, spp, dt, resampler)

    out = _cog_assemble(
        [(h, w, spp) for h, w in dims], [dt] * len(dims), level_chunks,
        tile_size=tile_size, comp_id=comp_id, geotransform=geotransform,
        epsg=epsg, nodata=nodata)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out)
    os.replace(tmp, path)
    return {"levels": len(dims), "tiles": sum(len(c) for c in level_chunks),
            "bytes": len(out)}


def write_ovr_distributed(chunks_ds, ovr_path: str, *, width: int,
                          height: int, spp: int = 1, dtype="u1",
                          tile_size: int = 256,
                          compression: str = "deflate",
                          resampler: str = "average") -> dict:
    """gdaladdo -ro analogue: full-resolution tile-aligned chunk rows →
    an EXTERNAL `.ovr` sidecar (a TIFF holding only the overview IFDs,
    the layout GDAL's gtiff driver writes for read-only datasets —
    frmts/gtiff/geotiff.cpp CreateOverviewsFromSrcOverviews /
    gdaladdo -ro).  Reduction + compression run on the cluster; the
    driver assembles the (small) overview layout only."""
    dt = np.dtype(dtype)
    comp_id = {"none": 1, "deflate": 8, "lzw": 5, "packbits": 32773,
               "jpeg": 7, "zstd": 50000, "lerc": 34887}[compression]
    dims = _level_dims(width, height, tile_size)[1:]
    if not dims:
        raise ValueError("raster too small for any overview level")

    def compress(b: pa.Table) -> pa.Table:
        idxs, blobs = [], []
        for r in b.to_pylist():
            blk = np.frombuffer(r["data"], dtype=dt).reshape(
                r["h"], r["w"], spp)
            pad = np.zeros((tile_size, tile_size, spp), dtype=dt)
            pad[:r["h"], :r["w"]] = blk
            idxs.append((r["row0"], r["col0"]))
            blobs.append(compress_cog_tile(pad, compression))
        return pa.table({
            "row0": pa.array([i[0] for i in idxs], pa.int64()),
            "col0": pa.array([i[1] for i in idxs], pa.int64()),
            "blob": pa.array(blobs, pa.binary()),
        })

    level_chunks: list[list[bytes]] = []
    ds = _reduce_level(chunks_ds, tile_size, spp, dt, resampler)
    for li, (h, w) in enumerate(dims):
        ds = ds.materialize()
        tx = (w + tile_size - 1) // tile_size
        ty = (h + tile_size - 1) // tile_size
        tiles: dict[int, bytes] = {}
        comp = ds.map_batches(compress, batch_format="pyarrow")
        for b in comp.iter_batches(batch_format="pyarrow"):
            for r0, c0, blob in zip(b.column("row0").to_pylist(),
                                    b.column("col0").to_pylist(),
                                    b.column("blob").to_pylist()):
                tiles[(r0 // tile_size) * tx + c0 // tile_size] = blob
        if len(tiles) != tx * ty:
            raise ValueError(f"ovr level {li}: incomplete tile set")
        level_chunks.append([tiles[i] for i in range(tx * ty)])
        if li + 1 < len(dims):
            ds = _reduce_level(ds, tile_size, spp, dt, resampler)

    out = _cog_assemble(
        [(h, w, spp) for h, w in dims], [dt] * len(dims), level_chunks,
        tile_size=tile_size, comp_id=comp_id, geotransform=None,
        epsg=None, nodata=None)
    tmp = ovr_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out)
    os.replace(tmp, ovr_path)
    return {"levels": len(dims), "tiles": sum(len(c) for c in level_chunks),
            "bytes": len(out)}
