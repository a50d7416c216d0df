"""MBTiles raster tile sink/source over stdlib sqlite3 — no GDAL.

Reference semantics: frmts/mbtiles/mbtilesdataset.cpp — an MBTiles file
is an SQLite database with

    metadata (name TEXT, value TEXT)          -- name/format/bounds/zooms
    tiles (zoom_level INTEGER, tile_column INTEGER,
           tile_row INTEGER, tile_data BLOB)  -- tile_row is TMS (y-up),
                                              -- i.e. flipped vs XYZ

plus a unique index on (zoom_level, tile_column, tile_row).  Tiles are
PNG-encoded with this engine's from-spec codec.

Scale shape: SQLite is single-writer, so the *write* is a driver-side
streaming sink — tiles are PNG-encoded in parallel on the cluster
(map_batches), and only the encoded blobs stream to the driver through
`iter_batches` for insertion (bounded memory; the blobs of one batch at
a time).  For web-scale output use `state/tilesink.write_tile_tree`
(z/x/y file tree, fully parallel) or per-shard .mbtiles via
`write_mbtiles` over partition slices.  The *read* scales: rowid ranges
are enumerated driver-side and each Ray task opens the database
read-only/immutable and SELECTs only its range.
"""

from __future__ import annotations

import os
import sqlite3

import numpy as np
import pyarrow as pa

from gdal_ray.codecs.png import decode_png, encode_png


def _encode_batch(b: pa.Table, tile_size: int) -> pa.Table:
    """(z,x,y,rgb,alpha) -> (z,x,y,png) — runs in parallel on the cluster."""
    ts = tile_size
    zs = b.column("z").to_numpy()
    rgbs = b.column("rgb").to_pylist()
    alphas = b.column("alpha").to_pylist()
    blobs = []
    for i in range(len(zs)):
        rgb = np.frombuffer(rgbs[i], dtype=np.uint8).reshape(ts, ts, 3)
        a = np.frombuffer(alphas[i], dtype=np.uint8).reshape(ts, ts)
        img = rgb if (a == 255).all() else np.dstack([rgb, a])
        blobs.append(encode_png(img))
    return pa.table(
        {
            "z": b.column("z"),
            "x": b.column("x"),
            "y": b.column("y"),
            "png": pa.array(blobs, pa.binary()),
        }
    )


def write_mbtiles(
    tiles_ds,
    path: str,
    *,
    tile_size: int,
    name: str = "gdal_ray tiles",
    already_encoded: bool = False,
    fmt: str = "png",
    blob_col: str = "png",
) -> int:
    """Rendered-tiles Dataset (z, x, y, rgb, alpha — or z, x, y, png when
    `already_encoded`) -> one .mbtiles file, atomic tmp+rename.  XYZ y is
    flipped to TMS tile_row per the MBTiles spec.  Returns tile count."""
    if not already_encoded:
        tiles_ds = tiles_ds.map_batches(
            lambda b: _encode_batch(b, tile_size), batch_format="pyarrow"
        )
        blob_col = "png"
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        os.remove(tmp)
    con = sqlite3.connect(tmp)
    n = 0
    zmin, zmax = 1 << 30, -1
    try:
        cur = con.cursor()
        cur.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
        cur.execute(
            "CREATE TABLE tiles (zoom_level INTEGER, tile_column INTEGER,"
            " tile_row INTEGER, tile_data BLOB)"
        )
        cur.execute(
            "CREATE UNIQUE INDEX tile_index ON tiles"
            " (zoom_level, tile_column, tile_row)"
        )
        for b in tiles_ds.iter_batches(batch_format="pyarrow"):
            zs = b.column("z").to_numpy()
            xs = b.column("x").to_numpy()
            ys = b.column("y").to_numpy()
            blobs = b.column(blob_col).to_pylist()
            rows = [
                (int(zs[i]), int(xs[i]), (1 << int(zs[i])) - 1 - int(ys[i]),
                 blobs[i])
                for i in range(len(zs))
            ]
            if rows:
                cur.executemany("INSERT INTO tiles VALUES (?,?,?,?)", rows)
                n += len(rows)
                zmin = min(zmin, int(zs.min()))
                zmax = max(zmax, int(zs.max()))
        meta = [
            ("name", name),
            ("type", "overlay"),
            ("version", "1.1"),
            ("description", name),
            ("format", fmt),
        ]
        if n:
            meta += [("minzoom", str(zmin)), ("maxzoom", str(zmax))]
        cur.executemany("INSERT INTO metadata VALUES (?,?)", meta)
        con.commit()
    finally:
        con.close()
    os.replace(tmp, path)
    return n


def read_metadata(path: str) -> dict[str, str]:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        return dict(con.execute("SELECT name, value FROM metadata"))
    finally:
        con.close()


def read_mbtiles(path: str, *, rows_per_block: int = 4096,
                 decode: bool = False):
    """-> ray.data.Dataset of (z, x, y, png) with XYZ y (flipped back from
    TMS).  With decode=True adds rgb/alpha raw-byte columns via the PNG
    codec.  Parallel: rowid ranges split driver-side, each task reads
    only its range read-only/immutable."""
    import ray.data as rd

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        lo, hi = con.execute("SELECT min(rowid), max(rowid) FROM tiles").fetchone()
    finally:
        con.close()
    lo, hi = (lo or 0), (hi if hi is not None else -1)
    ranges = [
        {"lo": s, "hi": min(s + rows_per_block - 1, int(hi))}
        for s in range(int(lo), int(hi) + 1, rows_per_block)
    ] or [{"lo": 0, "hi": -1}]

    def load(batch: pa.Table) -> pa.Table:
        con = sqlite3.connect(f"file:{path}?mode=ro&immutable=1", uri=True)
        outs = []
        try:
            for row in batch.to_pylist():
                rows = con.execute(
                    "SELECT zoom_level, tile_column, tile_row, tile_data"
                    " FROM tiles WHERE rowid BETWEEN ? AND ? ORDER BY rowid",
                    (row["lo"], row["hi"]),
                ).fetchall()
                t = pa.table(
                    {
                        "z": pa.array([r[0] for r in rows], pa.int64()),
                        "x": pa.array([r[1] for r in rows], pa.int64()),
                        "y": pa.array(
                            [(1 << r[0]) - 1 - r[2] for r in rows], pa.int64()
                        ),
                        "png": pa.array([r[3] for r in rows], pa.binary()),
                    }
                )
                outs.append(t)
        finally:
            con.close()
        return pa.concat_tables(outs)

    ds = rd.from_items(ranges).map_batches(load, batch_format="pyarrow")
    if decode:

        def dec(b: pa.Table) -> pa.Table:
            rgbs, alphas = [], []
            for blob in b.column("png").to_pylist():
                img = decode_png(blob)
                if img.ndim == 3 and img.shape[2] == 4:
                    rgbs.append(img[:, :, :3].tobytes())
                    alphas.append(img[:, :, 3].tobytes())
                else:
                    if img.ndim == 2:
                        img = np.dstack([img] * 3)
                    rgbs.append(img[:, :, :3].tobytes())
                    alphas.append(
                        np.full(img.shape[:2], 255, np.uint8).tobytes()
                    )
            return b.append_column(
                "rgb", pa.array(rgbs, pa.binary())
            ).append_column("alpha", pa.array(alphas, pa.binary()))

        ds = ds.map_batches(dec, batch_format="pyarrow")
    return ds
