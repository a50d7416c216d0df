"""Sources & sinks for the engine.

The north-star input is a **Lance table** of image+caption pairs
(BASELINE.json input_hint).  This sandbox has no `lance` package, so
:func:`read_images` tries `ray.data.read_lance` first and falls back to
parquet with the identical schema — the pipeline code is source-agnostic
(everything downstream sees the same Arrow schema).  The reference
equivalently dispatches by driver (frmts/gdalallregister.cpp); here the
"driver registry" is this one function.

Sinks: `ray.data.Dataset.write_parquet` for plain output;
:func:`gdal_ray.state.manifest.write_partitioned` for the resumable
per-partition manifest sink (north rule: per-partition lineage+metrics).
"""

from __future__ import annotations

IMAGE_SCHEMA_COLUMNS = [
    "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
    "lon_min", "lat_min", "lon_max", "lat_max",
]


def read_images(path: str, *, columns: list[str] | None = None):
    """Read the image+caption table from a Lance dataset directory or a
    parquet file/directory, returning a ray.data.Dataset with the
    input_hint schema (image_id, bytes, w, h, fmt, caption, phash [+
    footprint columns])."""
    import ray.data as rd

    def strip_meta(b):
        # drop parquet `pandas` schema metadata (dict) — it makes schemas
        # unhashable and Ray warns on every block unification
        return b.replace_schema_metadata(None)

    if path.endswith(".lance"):
        try:
            return rd.read_lance(path, columns=columns)
        except (ImportError, ModuleNotFoundError) as e:  # no lance in sandbox
            raise NotImplementedError(
                "lance reader unavailable in this environment; materialize the "
                "table as parquet and pass that path instead"
            ) from e
    return rd.read_parquet(path, columns=columns).map_batches(
        strip_meta, batch_format="pyarrow"
    )


def synth_images(n: int, *, parallelism: int = -1):
    """Deterministic in-pipeline generator of the image table (tests/bench:
    generation runs inside map_batches, never on the driver)."""
    from gdal_ray.synth import synth_images_dataset

    return synth_images_dataset(n, parallelism=parallelism)


# -------------------------------------------------------- driver registry
#
# GDALOpen / OGROpen analogue (gcore/gdal_priv.h:2621 GDALDriverManager,
# frmts/gdalallregister.cpp): extension-dispatched open over every vector
# and raster store driver this engine implements.  Each opener returns a
# ray.data.Dataset; vector drivers share the (fid, wkb, attrs…) schema,
# raster/chunk drivers the (row0/col0 or cy/cx, h, w, data) chunk schema.


def open_vector(path: str, **kw):
    """Vector table -> Dataset (fid:int64, wkb:binary, + attributes)."""
    low = path.lower()
    if low.rstrip("/").endswith(".gdb"):
        from gdal_ray.sources.openfilegdb import read_gdb

        return read_gdb(path, **kw)
    if low.endswith(".gpkg"):
        from gdal_ray.sources.gpkg import read_gpkg

        return read_gpkg(path, **kw)
    if low.endswith(".shp"):
        from gdal_ray.sources.shapefile import read_shapefile

        return read_shapefile(path, **kw)
    if low.endswith(".fgb"):
        from gdal_ray.sources.flatgeobuf import read_flatgeobuf

        return read_flatgeobuf(path, **kw)
    if low.endswith((".geojsonl", ".ndjson")):
        from gdal_ray.sources.geojson import read_geojsonseq

        return read_geojsonseq(path, **kw)
    if low.endswith((".geojson", ".json")):
        from gdal_ray.sources.geojson import read_geojson

        return read_geojson(path, **kw)
    if low.endswith(".dxf"):
        from gdal_ray.sources.dxf import read_dxf

        return read_dxf(path, **kw)
    if low.endswith(".csv"):
        from gdal_ray.sources.csvwkt import read_csv_wkt

        return read_csv_wkt(path, **kw)
    if low.endswith(".kml"):
        from gdal_ray.sources.kmlgpx import read_kml

        return read_kml(path, **kw)
    if low.endswith(".gpx"):
        from gdal_ray.sources.kmlgpx import read_gpx

        return read_gpx(path, **kw)
    if low.endswith(".mif"):
        from gdal_ray.sources.mifmid import read_mifmid

        return read_mifmid(path, **kw)
    if low.endswith(".gml"):
        from gdal_ray.sources.gml import read_gml

        return read_gml(path, **kw)
    if low.endswith((".osm.pbf", ".pbf")):
        from gdal_ray.sources.osmpbf import read_osm

        return read_osm(path, **kw)
    if low.endswith(".000"):
        from gdal_ray.sources.s57 import read_s57

        return read_s57(path, **kw)
    raise ValueError(f"no vector driver for {path}")


def _looks_pds3(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            head = f.read(256)
        return b"PDS_VERSION_ID" in head or head.lstrip().startswith(b"PDS3")
    except OSError:
        return False


def _head_has_txt(path: str, token: bytes) -> bool:
    try:
        with open(path, "rb") as f:
            return token in f.read(256)
    except OSError:
        return False


def _looks_hfa(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(15) == b"EHFA_HEADER_TAG"
    except OSError:
        return False


def _looks_isis3(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            head = f.read(512)
        return b"IsisCube" in head
    except OSError:
        return False


def open_raster(path: str, **kw):
    """Chunked raster store -> Dataset of decoded chunk rows."""
    import os as _os

    low = path.lower()
    base = _os.path.basename(path).upper()
    if low.endswith("manifest.safe") or low.endswith(".safe") or \
            base.startswith(("DIM_", "VOL_")):
        from gdal_ray.sources.products import read_product

        return read_product(path, **kw)
    if _os.path.isdir(path) and any(
            f.upper().startswith(("DIM_", "VOL_"))
            for f in _os.listdir(path)[:64]):
        from gdal_ray.sources.products import read_product

        return read_product(path, **kw)
    if low.endswith((".tif", ".tiff")):
        from gdal_ray.sources.gtiff_reader import read_geotiff_tiles

        return read_geotiff_tiles(path, **kw)
    if low.endswith(".vrt"):
        from gdal_ray.sources.vrt import read_vrt

        return read_vrt(path, **kw)
    if low.endswith(".asc"):
        from gdal_ray.sources.aaigrid import read_aaigrid

        return read_aaigrid(path, **kw)
    if low.endswith(".xyz"):
        from gdal_ray.sources.xyzgrid import read_xyz

        return read_xyz(path, **kw)
    if low.endswith(".pds") or (
            low.endswith((".lbl", ".img")) and _looks_pds3(path)):
        from gdal_ray.sources.pds3 import read_pds3

        return read_pds3(path, **kw)
    if low.endswith((".img", ".aux")) and _looks_hfa(path):
        from gdal_ray.sources.hfa import read_hfa

        return read_hfa(path, **kw)
    if low.endswith((".hgt", ".bil", ".bip", ".bsq", ".img", ".dat")):
        from gdal_ray.sources.rawgrid import read_rawgrid

        return read_rawgrid(path, **kw)
    if low.endswith((".fits", ".fit")):
        from gdal_ray.sources.fits import read_fits

        return read_fits(path, **kw)
    if low.endswith(".gsb"):
        from gdal_ray.sources.ntv2 import read_ntv2

        return read_ntv2(path, **kw)
    if low.endswith(".gtx"):
        from gdal_ray.sources.gtx import read_gtx_dataset

        return read_gtx_dataset(path, **kw)
    if low.endswith(".mrf"):
        from gdal_ray.sources.mixedrasters import read_mrf_array
        import ray.data as rd
        import numpy as _np

        arr = read_mrf_array(path)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return rd.from_items(
            [{"row0": 0, "n_rows": arr.shape[0], "band": b,
              "data": _np.ascontiguousarray(arr[:, :, b]).tobytes()}
             for b in range(arr.shape[2])])
    if low.endswith(".lcp") or low.endswith(".los") or \
            (low.endswith(".cub") and _head_has_txt(path, b"^QUBE")):
        from gdal_ray.sources.mixedrasters import (lcp_meta,
                                                   read_isis2_array,
                                                   read_lcp_array,
                                                   read_loslas_array)
        import ray.data as rd
        import numpy as _np

        if low.endswith(".lcp"):
            arr = read_lcp_array(path)
        elif low.endswith(".los"):
            arr = read_loslas_array(path)[:, :, None]
        else:
            arr = read_isis2_array(path)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return rd.from_items(
            [{"row0": 0, "n_rows": arr.shape[0], "band": b,
              "data": _np.ascontiguousarray(arr[:, :, b]).tobytes()}
             for b in range(arr.shape[2])])
    if low.endswith((".dt0", ".dt1", ".dt2")):
        from gdal_ray.sources.dted import read_dted

        return read_dted(path, **kw)
    if low.endswith((".ntf", ".nitf")):
        from gdal_ray.sources.nitf import read_nitf

        return read_nitf(path, **kw)
    if low.endswith((".jp2", ".j2k", ".j2c")):
        from gdal_ray.sources.jp2 import read_jp2

        return read_jp2(path, **kw)
    if low.endswith(".ers"):
        from gdal_ray.sources.ers import read_ers

        return read_ers(path, **kw)
    if low.endswith((".vic", ".vicar")):
        from gdal_ray.sources.vicar import read_vicar

        return read_vicar(path, **kw)
    if low.endswith((".cub", ".lbl")) and _looks_isis3(path):
        from gdal_ray.sources.isis3 import read_isis3

        return read_isis3(path, **kw)
    if low.endswith(".xml"):
        from gdal_ray.sources.pds4 import read_pds4

        return read_pds4(path, **kw)
    if low.endswith(".mrf"):
        from gdal_ray.sources.mixedrasters import read_mrf_array
        import ray.data as rd
        import numpy as _np

        arr = read_mrf_array(path)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return rd.from_items(
            [{"row0": 0, "n_rows": arr.shape[0], "band": b,
              "data": _np.ascontiguousarray(arr[:, :, b]).tobytes()}
             for b in range(arr.shape[2])])
    if low.endswith(".lcp") or low.endswith(".los") or \
            (low.endswith(".cub") and _head_has_txt(path, b"^QUBE")):
        from gdal_ray.sources.mixedrasters import (lcp_meta,
                                                   read_isis2_array,
                                                   read_lcp_array,
                                                   read_loslas_array)
        import ray.data as rd
        import numpy as _np

        if low.endswith(".lcp"):
            arr = read_lcp_array(path)
        elif low.endswith(".los"):
            arr = read_loslas_array(path)[:, :, None]
        else:
            arr = read_isis2_array(path)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return rd.from_items(
            [{"row0": 0, "n_rows": arr.shape[0], "band": b,
              "data": _np.ascontiguousarray(arr[:, :, b]).tobytes()}
             for b in range(arr.shape[2])])
    if low.endswith(".dem"):
        import os as _os

        if _os.path.exists(path + ".rsc"):  # JPL ROI_PAC companion header
            from gdal_ray.sources.mixedrasters import read_roipac_array
            import ray.data as rd
            import numpy as _np

            arr = read_roipac_array(path)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return rd.from_items(
                [{"row0": 0, "n_rows": arr.shape[0], "band": b,
                  "data": _np.ascontiguousarray(arr[:, :, b]).tobytes()}
                 for b in range(arr.shape[2])])
        from gdal_ray.sources.usgsdem import read_usgsdem

        return read_usgsdem(path, **kw)
    if low.endswith(".gxf"):
        from gdal_ray.sources.gxf import read_gxf

        return read_gxf(path, **kw)
    if low.endswith((".sgrd", ".sdat", ".sg-grd-z")):
        from gdal_ray.sources.simplegrids import read_saga

        return read_saga(path, **kw)
    if low.endswith((".lan", ".gis")):
        from gdal_ray.sources.simplegrids import read_lan

        return read_lan(path, **kw)
    if low.endswith(".mpr"):
        from gdal_ray.sources.simplegrids import read_ilwis

        return read_ilwis(path, **kw)
    if low.endswith((".kap", ".nos")):
        from gdal_ray.sources.bsb import read_bsb

        return read_bsb(path, **kw)
    if low.endswith((".gen", ".thf")):
        from gdal_ray.sources.adrg import read_adrg_array, read_srp_array
        import ray.data as rd
        import numpy as _np

        try:
            arr = read_adrg_array(path)
        except (ValueError, KeyError, TypeError):
            arr = read_srp_array(path)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        rows = [{"row0": 0, "n_rows": arr.shape[0], "band": b,
                 "data": _np.ascontiguousarray(arr[:, :, b]).tobytes()}
                for b in range(arr.shape[2])]
        return rd.from_items(rows)
    if low.endswith(".isg") or low.endswith((".h1", ".h2", ".h3", ".h4")) \
            or "grid_cell" in _os.path.basename(low) \
            or (low.endswith(".txt") and _head_has_txt(path, b"north:")):
        from gdal_ray.sources.asciigrids import (read_ctg_array,
                                                 read_grass_array,
                                                 read_isg_array,
                                                 read_ndf_array)
        import ray.data as rd
        import numpy as _np

        if low.endswith(".isg"):
            arr = read_isg_array(path)
        elif low.endswith((".h1", ".h2", ".h3", ".h4")):
            arr = read_ndf_array(path)
        elif "grid_cell" in _os.path.basename(low):
            arr = read_ctg_array(path)
        else:
            arr = read_grass_array(path)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        rows = [{"row0": 0, "n_rows": arr.shape[0], "band": b,
                 "data": _np.ascontiguousarray(arr[:, :, b]).tobytes()}
                for b in range(arr.shape[2])]
        return rd.from_items(rows)
    if low.endswith(".grd") and _head_has_txt(path, b"HGPC"):
        # Northwood/Vertical Mapper classified grid
        from gdal_ray.sources.mixedrasters import (nwt_grd_meta,
                                                   read_nwt_grd_band)
        import ray.data as rd
        import numpy as _np

        n_bands = int(nwt_grd_meta(path).get("bands", 1))
        rows = []
        for b in range(n_bands):
            arr = read_nwt_grd_band(path, b)
            rows.append({"row0": 0, "n_rows": arr.shape[0], "band": b,
                         "data": _np.ascontiguousarray(arr).tobytes()})
        return rd.from_items(rows)
    if low.endswith(".grd") and _head_has_txt(path, b"ncols="):
        from gdal_ray.sources.mixedrasters import read_rraster_array
        import ray.data as rd
        import numpy as _np

        arr = read_rraster_array(path)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return rd.from_items(
            [{"row0": 0, "n_rows": arr.shape[0], "band": b,
              "data": _np.ascontiguousarray(arr[:, :, b]).tobytes()}
             for b in range(arr.shape[2])])
    if low.endswith(".grd"):
        from gdal_ray.sources.simplegrids import (read_surfer_array,
                                                  surfer_meta)
        import ray.data as rd
        import numpy as _np

        arr = read_surfer_array(path)
        return rd.from_items([{"row0": 0, "n_rows": arr.shape[0],
                               "band": 0,
                               "data": _np.ascontiguousarray(arr).tobytes()}])
    if low.endswith(".byn"):
        from gdal_ray.sources.simplegrids import read_byn_array
        import ray.data as rd
        import numpy as _np

        arr = read_byn_array(path)
        return rd.from_items([{"row0": 0, "n_rows": arr.shape[0],
                               "band": 0,
                               "data": _np.ascontiguousarray(arr).tobytes()}])
    if low.endswith(".ter"):
        from gdal_ray.sources.simplegrids import (read_leveller_array,
                                                  read_terragen_array)
        import ray.data as rd
        import numpy as _np

        try:
            arr = read_terragen_array(path)
        except ValueError:
            arr = read_leveller_array(path)
        rows = [{"row0": 0, "n_rows": arr.shape[0], "band": 0,
                 "data": _np.ascontiguousarray(arr).tobytes()}]
        return rd.from_items(rows)
    import os as _os

    if _os.path.isdir(path) and (_os.path.exists(_os.path.join(path, ".zarray"))
                             or _os.path.exists(_os.path.join(path, "zarr.json"))):
        from gdal_ray.sources.zarr import read_zarr

        return read_zarr(path, **kw)
    if low.endswith(".nc"):
        # magic sniff (netcdfdataset.cpp Identify): CDF → classic,
        # \x89HDF → netCDF-4 (an HDF5 file) through the HDF5 chunk reader
        with open(path, "rb") as f:
            magic = f.read(8)
        if magic.startswith(b"\x89HDF"):
            from gdal_ray.sources.hdf5 import read_hdf5

            return read_hdf5(path, **kw)
        from gdal_ray.sources.netcdf3 import read_netcdf

        return read_netcdf(path, **kw)
    if low.endswith((".grib2", ".grb2", ".grib")):
        from gdal_ray.sources.grib2 import read_grib2

        return read_grib2(path, **kw)
    if low.endswith((".h5", ".hdf5", ".he5")):
        from gdal_ray.sources.hdf5 import read_hdf5

        return read_hdf5(path, **kw)
    if low.endswith(".mbtiles"):
        from gdal_ray.state.mbtiles import read_mbtiles

        return read_mbtiles(path, **kw)
    if low.endswith(".pmtiles"):
        from gdal_ray.state.pmtiles import read_pmtiles

        return read_pmtiles(path, **kw)
    raise ValueError(f"no raster driver for {path}")


def read_image_dir(paths, *, decode: bool = False, concurrency=(1, 8)):
    """Directory/glob of image FILES (.png/.jpg/.webp/.tif) -> Dataset with
    the input_hint column shape (image_id from the file path, bytes, w, h,
    fmt; full pixel payload kept as 'pixels' only when decode=True).
    The file-per-image ingest door (gdal_translate batch idiom); Ray
    splits files across tasks, decode runs in an actor pool."""
    import os as _os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    _EXT_FMT = {".png": "png", ".jpg": "jpeg", ".jpeg": "jpeg",
                ".webp": "webp", ".tif": "gtiff", ".tiff": "gtiff",
                ".gif": "gif", ".bmp": "bmp"}

    class Decode:
        def __init__(self):
            from gdal_ray.codecs import decode as _dec

            self._dec = _dec

        def __call__(self, b: pa.Table) -> pa.Table:
            ids, fmts, ws, hs, pix = [], [], [], [], []
            blobs = b.column("bytes").to_pylist()
            for path, blob in zip(b.column("path").to_pylist(), blobs):
                ids.append(_os.path.splitext(_os.path.basename(path))[0])
                fmts.append(_EXT_FMT.get(
                    _os.path.splitext(path)[1].lower(), "unknown"))
                arr = self._dec(bytes(blob))
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
                if decode:
                    pix.append(np.ascontiguousarray(arr).tobytes())
            cols = {
                "image_id": pa.array(ids, pa.string()),
                "bytes": b.column("bytes").cast(pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(fmts, pa.string()),
            }
            if decode:
                cols["pixels"] = pa.array(pix, pa.binary())
            return pa.table(cols)

    return rd.read_binary_files(paths, include_paths=True).map_batches(
        Decode, batch_format="pyarrow", concurrency=concurrency)


def save_vector(ds_or_table, path: str, **kw) -> None:
    """Inverse of open_vector: write a vector table/Dataset to the driver
    the extension names.  Single-file containers (gpkg/shp/fgb/kml/gpx/
    geojson/parquet) are inherently one writer — a Dataset input is
    collected to one Arrow table first (use the *_parts sinks or
    write_geojsonseq for the partitioned scale path)."""
    import pyarrow as pa

    t = ds_or_table
    if not isinstance(t, pa.Table):
        t = pa.concat_tables(
            [b.replace_schema_metadata(None)
             for b in t.iter_batches(batch_format="pyarrow")],
            promote_options="default")
    low = path.lower()
    if low.rstrip("/").endswith(".gdb"):
        from gdal_ray.sources.openfilegdb import write_gdb

        return write_gdb(t, path, **kw)
    if low.endswith(".gpkg"):
        from gdal_ray.sources.gpkg import write_gpkg

        return write_gpkg(t, path, **kw)
    if low.endswith(".shp"):
        from gdal_ray.sources.shapefile import write_shapefile

        return write_shapefile(t, path[:-4], **kw)
    if low.endswith(".fgb"):
        from gdal_ray.sources.flatgeobuf import write_flatgeobuf

        return write_flatgeobuf(t, path, **kw)
    if low.endswith(".kml"):
        from gdal_ray.sources.kmlgpx import write_kml

        return write_kml(t, path, **kw)
    if low.endswith(".mif"):
        from gdal_ray.sources.mifmid import write_mifmid

        return write_mifmid(t, path, **kw)
    if low.endswith(".gml"):
        from gdal_ray.sources.gml import write_gml

        return write_gml(path, t, **kw)
    if low.endswith(".gpx"):
        from gdal_ray.sources.kmlgpx import write_gpx

        return write_gpx(t, path, **kw)
    if low.endswith(".parquet"):
        from gdal_ray.sources.geoparquet import write_geoparquet_table

        return write_geoparquet_table(t, path, **kw)
    if low.endswith((".geojson", ".json")):
        import json as _json
        import os as _os

        from gdal_ray.sources.geojson import wkb_to_geometry

        feats = []
        attrs = [c for c in t.column_names if c != "wkb"]
        cols = {c: t.column(c).to_pylist() for c in attrs}
        for i, w in enumerate(t.column("wkb").to_pylist()):
            feats.append({"type": "Feature",
                          "geometry": wkb_to_geometry(w),
                          "properties": {c: cols[c][i] for c in attrs}})
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({"type": "FeatureCollection", "features": feats}, f)
        _os.replace(tmp, path)
        return None
    raise ValueError(f"no vector sink for {path}")
