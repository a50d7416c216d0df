"""`gdalinfo` / `ogrinfo` analogue: one inspection door over every
format this engine reads (reference: apps/gdalinfo_lib.cpp,
apps/ogrinfo_lib.cpp — both emit a structured summary; ours is a JSON-
ready dict).  Driver-side by design: inspection reads headers and
metadata, not data (except small raster stats, mirroring gdalinfo
-stats' explicit opt-in)."""

from __future__ import annotations

import json
import os
import struct

import numpy as np


def _head_has(path: str, token: bytes, n: int = 512) -> bool:
    try:
        with open(path, "rb") as f:
            return token in f.read(n)
    except OSError:
        return False


def describe(path: str, *, stats: bool = False) -> dict:
    """-> format-tagged summary dict for any supported file/store."""
    low = path.lower()
    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, ".zarray")) or \
                os.path.exists(os.path.join(path, "zarr.json")):
            return _zarr(path)
        if low.rstrip("/").endswith(".gdb") or os.path.exists(
                os.path.join(path, "a00000001.gdbtable")):
            from gdal_ray.sources.openfilegdb import gdb_meta

            return gdb_meta(path)
        if os.path.exists(os.path.join(path, "conf.xml")):
            from gdal_ray.sources.esric import esric_meta

            return esric_meta(path)
        if os.path.exists(os.path.join(path, "hdr.adf")) or \
                os.path.exists(os.path.join(path, "HDR.ADF")):
            from gdal_ray.sources.mixedrasters import aig_meta

            return aig_meta(path)
        raise ValueError(f"unrecognized directory store: {path}")
    if low.endswith((".tif", ".tiff")):
        return _tiff(path, stats)
    if low.endswith((".png", ".jpg", ".jpeg", ".webp", ".gif", ".bmp")):
        return _image(path, stats)
    if low.endswith((".jp2", ".j2k", ".j2c", ".jpx")):
        from gdal_ray.sources.jp2 import jp2_info

        out = jp2_info(path)
        out.pop("tile_parts", None)  # index is for readers, not info text
        return out
    if low.endswith(".ers"):
        from gdal_ray.sources.ers import ers_meta

        return ers_meta(path)
    if low.endswith((".vic", ".vicar")):
        from gdal_ray.sources.vicar import vicar_meta

        out = vicar_meta(path)
        out.pop("label", None)
        return out
    if low.endswith((".cub",)) or (low.endswith(".lbl") and
                                   _head_has(path, b"IsisCube")):
        from gdal_ray.sources.isis3 import isis3_meta

        return isis3_meta(path)
    if low.endswith(".xml") and _head_has(path, b"Product_Observational",
                                          4096):
        from gdal_ray.sources.pds4 import pds4_meta

        out = pds4_meta(path)
        out.pop("arrays", None)
        return out
    if low.endswith(".json") and _head_has(path, b"tiled-assets", 2048):
        from gdal_ray.sources.stacta import stacta_meta

        return stacta_meta(path)
    if low.endswith(".xml") and "mtd" in os.path.basename(low) and \
            _head_has(path, b"Level-1C_User_Product", 512):
        from gdal_ray.sources.sentinel2 import sentinel2_meta

        return sentinel2_meta(path)
    if low.endswith((".gti.gpkg", ".gti.fgb", ".gti")):
        from gdal_ray.sources.gti import gti_meta

        out = gti_meta(path)
        out.pop("tiles", None)
        return out
    if low.endswith((".nws", ".doq")) and _head_has(
            path, b"BEGIN_USGS_DOQ_HEADER", 80):
        from gdal_ray.sources.mixedrasters import doq2_meta

        return doq2_meta(path)
    if low.endswith(".gsc"):
        from gdal_ray.sources.mixedrasters import gsc_meta

        return gsc_meta(path)
    if low.endswith(".slc") and os.path.exists(path + ".xml"):
        from gdal_ray.sources.mixedrasters import isce_meta

        return isce_meta(path)
    if low.endswith((".fits", ".fit")):
        from gdal_ray.sources.fits import fits_meta

        return fits_meta(path)
    if low.endswith(".tpkx"):
        from gdal_ray.sources.esric import esric_meta

        return esric_meta(path)
    if low.endswith(".mrf"):
        from gdal_ray.sources.mixedrasters import mrf_meta

        return mrf_meta(path)
    if low.endswith(".lcp"):
        from gdal_ray.sources.mixedrasters import lcp_meta

        return lcp_meta(path)
    if low.endswith((".los", ".las")) and not _head_has(path, b"LASF", 4):
        from gdal_ray.sources.mixedrasters import loslas_meta

        return loslas_meta(path)
    if low.endswith(".cub") and _head_has(path, b"^QUBE", 4096):
        from gdal_ray.sources.mixedrasters import isis2_meta

        return isis2_meta(path)
    if low.endswith(".dem") and not os.path.exists(path + ".rsc"):
        # a companion .rsc means JPL ROI_PAC, handled further down
        from gdal_ray.sources.usgsdem import usgsdem_meta

        return usgsdem_meta(path)
    if low.endswith((".img", ".aux")) and _head_has(path, b"EHFA_HEADER_TAG",
                                                    16):
        from gdal_ray.sources.hfa import hfa_meta

        return hfa_meta(path)
    if low.endswith(".gxf"):
        from gdal_ray.sources.gxf import gxf_meta

        out = gxf_meta(path)
        out.pop("grid_lines", None)
        return out
    if low.endswith((".sgrd", ".sdat", ".sg-grd-z")):
        from gdal_ray.sources.simplegrids import saga_meta

        return saga_meta(path)
    if low.endswith((".lan", ".gis")):
        from gdal_ray.sources.simplegrids import lan_meta

        return lan_meta(path)
    if low.endswith(".mpr"):
        from gdal_ray.sources.simplegrids import ilwis_meta

        return ilwis_meta(path)
    if low.endswith("manifest.safe") or low.endswith(".safe"):
        from gdal_ray.sources.products import safe_meta

        return safe_meta(path)
    if os.path.basename(path).upper().startswith(("DIM_", "VOL_")):
        from gdal_ray.sources.products import dimap_meta

        out = dimap_meta(path)
        out.pop("products", None)
        return out
    if low.endswith(".fst") or (low[-4:-1] in (".1a", ".0f", ".01")
                                and _head_has(path, b"ACQUISITION DATE",
                                              4096)):
        from gdal_ray.sources.fast import fast_meta

        return fast_meta(path)
    if low.endswith(".isg"):
        from gdal_ray.sources.asciigrids import isg_meta

        return {k: v for k, v in isg_meta(path).items()
                if not k.startswith("_")}
    if low.endswith((".h1", ".h2", ".h3", ".h4")):
        from gdal_ray.sources.asciigrids import ndf_meta

        return ndf_meta(path)
    if "grid_cell" in os.path.basename(low):
        from gdal_ray.sources.asciigrids import ctg_meta

        return {k: v for k, v in ctg_meta(path).items()
                if not k.startswith("_")}
    if low.endswith(".grd") and _head_has(path, b"HGPC", 8):
        from gdal_ray.sources.mixedrasters import nwt_grd_meta

        out = nwt_grd_meta(path)
        out.pop("inflections", None)
        return out
    if low.endswith(".grd") and _head_has(path, b"ncols="):
        from gdal_ray.sources.mixedrasters import rraster_meta

        return rraster_meta(path)
    if low.endswith(".til"):
        from gdal_ray.sources.mixedrasters import til_meta

        return til_meta(path)
    if low.endswith(".aux") and _head_has(path, b"AuxilaryTarget"):
        from gdal_ray.sources.mixedrasters import paux_meta

        return paux_meta(path)
    if low.endswith(".000"):
        from gdal_ray.sources.s57 import s57_meta

        return s57_meta(path)
    if low.endswith((".gen", ".thf")):
        from gdal_ray.sources.adrg import adrg_meta, srp_meta

        try:
            out = adrg_meta(path)
        except (ValueError, KeyError, TypeError):
            out = srp_meta(path)
        out.pop("tile_index", None)
        return out
    if low.endswith((".kap", ".nos")):
        from gdal_ray.sources.bsb import bsb_meta

        out = bsb_meta(path)
        out.pop("line_offsets", None)
        return out
    if low.endswith(".grd"):
        from gdal_ray.sources.simplegrids import surfer_meta

        return surfer_meta(path)
    if low.endswith(".byn"):
        from gdal_ray.sources.simplegrids import byn_meta

        return byn_meta(path)
    if low.endswith(".ter"):
        from gdal_ray.sources.simplegrids import (leveller_meta,
                                                  terragen_meta)

        try:
            return terragen_meta(path)
        except ValueError:
            return leveller_meta(path)
    if low.endswith(".gsb"):
        from gdal_ray.sources.ntv2 import read_gsb

        grids = read_gsb(path)
        return {
            "driver": "NTv2",
            "n_subgrids": len(grids),
            "subgrids": [{
                "name": g.name, "parent": g.parent,
                "size": list(g.shape),
                "bbox_deg": [-g.w_long / 3600.0, g.s_lat / 3600.0,
                             -g.e_long / 3600.0, g.n_lat / 3600.0],
                "inc_sec": [g.lat_inc, g.lon_inc],
            } for g in grids],
        }
    if low.endswith(".gtx"):
        from gdal_ray.sources.gtx import read_gtx

        ll_lat, ll_lon, dlat, dlon, grid = read_gtx(path)
        return {
            "driver": "GTX",
            "size": [grid.shape[1], grid.shape[0]],
            "origin": [ll_lon, ll_lat],
            "pixel_size": [dlon, dlat],
            "n_nodata": int(np.isnan(grid).sum()),
        }
    if low.endswith((".osm.pbf", ".pbf")):
        from gdal_ray.sources.osmpbf import osm_info

        return osm_info(path)
    if low.endswith(".hgt"):
        from gdal_ray.sources.rawgrid import hgt_meta

        return hgt_meta(path)
    if low.endswith(".json") and _head_has(path, b"tiled-assets", 2048):
        from gdal_ray.sources.stacta import stacta_meta

        return stacta_meta(path)
    if low.endswith(".xml") and "mtd" in os.path.basename(low) and \
            _head_has(path, b"Level-1C_User_Product", 512):
        from gdal_ray.sources.sentinel2 import sentinel2_meta

        return sentinel2_meta(path)
    if low.endswith((".gti.gpkg", ".gti.fgb", ".gti")):
        from gdal_ray.sources.gti import gti_meta

        out = gti_meta(path)
        out.pop("tiles", None)
        return out
    if low.endswith((".nws", ".doq")) and _head_has(
            path, b"BEGIN_USGS_DOQ_HEADER", 80):
        from gdal_ray.sources.mixedrasters import doq2_meta

        return doq2_meta(path)
    if low.endswith(".gsc"):
        from gdal_ray.sources.mixedrasters import gsc_meta

        return gsc_meta(path)
    if low.endswith(".slc") and os.path.exists(path + ".xml"):
        from gdal_ray.sources.mixedrasters import isce_meta

        return isce_meta(path)
    if low.endswith((".fits", ".fit")):
        from gdal_ray.sources.fits import fits_meta

        return fits_meta(path)
    if low.endswith(".tpkx"):
        from gdal_ray.sources.esric import esric_meta

        return esric_meta(path)
    if low.endswith(".mrf"):
        from gdal_ray.sources.mixedrasters import mrf_meta

        return mrf_meta(path)
    if low.endswith(".lcp"):
        from gdal_ray.sources.mixedrasters import lcp_meta

        return lcp_meta(path)
    if low.endswith((".los", ".las")) and not _head_has(path, b"LASF", 4):
        from gdal_ray.sources.mixedrasters import loslas_meta

        return loslas_meta(path)
    if low.endswith(".cub") and _head_has(path, b"^QUBE", 4096):
        from gdal_ray.sources.mixedrasters import isis2_meta

        return isis2_meta(path)
    if low.endswith((".dt0", ".dt1", ".dt2")):
        from gdal_ray.sources.dted import dted_meta

        return dted_meta(path)
    if low.endswith((".ntf", ".nitf")):
        from gdal_ray.sources.nitf import nitf_meta

        return nitf_meta(path)
    if low.endswith((".lbl", ".pds")) or (low.endswith(".img")
                                          and _is_pds3(path)):
        from gdal_ray.sources.pds3 import read_pds3_meta

        m = read_pds3_meta(path)
        return {
            "driver": "PDS3",
            "size": [m["samples"], m["lines"]],
            "bands": m["bands"],
            "dtype": str(np.dtype(m["dtype"])),
            "target": m["label"].get("TARGET_NAME"),
        }
    if low.endswith((".bil", ".bip", ".bsq", ".img", ".dat")):
        from gdal_ray.sources.rawgrid import ehdr_meta, envi_meta

        try:
            return envi_meta(path)
        except ValueError:
            return ehdr_meta(path)
    if low.endswith(".gpkg"):
        return _gpkg(path)
    if low.endswith(".shp"):
        return _shapefile(path)
    if low.endswith((".geojson", ".json", ".geojsonl", ".ndjson")):
        return _geojson(path)
    if low.endswith(".parquet"):
        return _parquet(path)
    if low.endswith(".mbtiles"):
        return _mbtiles(path)
    if low.endswith(".pmtiles"):
        return _pmtiles(path)
    if low.endswith(".fgb"):
        return _flatgeobuf(path)
    if low.endswith(".nc"):
        return _netcdf(path)
    if low.endswith((".grib2", ".grb2", ".grib")):
        return _grib2(path)
    if low.endswith((".h5", ".hdf5", ".he5")):
        return _hdf5(path)
    if low.endswith((".pgm", ".ppm", ".pnm")):
        from gdal_ray.sources.mixedrasters import pnm_meta

        return pnm_meta(path)
    if low.endswith(".mem"):
        from gdal_ray.sources.mixedrasters import jdem_meta

        return jdem_meta(path)
    if low.endswith(".pix"):
        from gdal_ray.sources.mixedrasters import pcidsk_meta

        return pcidsk_meta(path)
    if low.endswith((".rst", ".rdc")):
        from gdal_ray.sources.mixedrasters import rst_meta

        return rst_meta(path)
    if low.endswith(".b") or low.endswith(".map") or \
            (low.endswith(".dem") and os.path.exists(path + ".rsc")):
        from gdal_ray.sources.mixedrasters import (noaa_b_meta,
                                                   pcraster_meta,
                                                   roipac_meta)

        if low.endswith(".map"):
            return pcraster_meta(path)
        if low.endswith(".b"):
            return noaa_b_meta(path)
        return roipac_meta(path)
    if os.path.isdir(path) and os.path.exists(
            os.path.join(path, "attrib")):
        from gdal_ray.sources.mixedrasters import mff2_meta

        return mff2_meta(path)
    if low.endswith(".kro"):
        from gdal_ray.sources.mixedrasters import kro_meta

        return kro_meta(path)
    if low.endswith(".bag"):
        from gdal_ray.sources.mixedrasters import bag_meta

        return bag_meta(path)
    if low.endswith(".csv"):
        return _csv(path)
    if low.endswith(".vrt"):
        return _vrt(path)
    if low.endswith(".asc"):
        return _aaigrid(path)
    if low.endswith(".kml"):
        return _kml(path)
    if low.endswith(".gpx"):
        return _gpx(path)
    if low.endswith(".gml"):
        from gdal_ray.sources.gml import read_gml_meta

        return {"driver": "GML", **{k: v for k, v in
                                    read_gml_meta(path).items()
                                    if k != "format"}}
    if low.endswith(".dxf"):
        from gdal_ray.sources.dxf import dxf_info

        return dxf_info(path)
    if low.endswith(".tga"):
        from gdal_ray.codecs.tga import tga_info

        return tga_info(path)
    if low.endswith(".json") and _head_has(path, b"tiled-assets", 2048):
        from gdal_ray.sources.stacta import stacta_meta

        return stacta_meta(path)
    if low.endswith(".xml") and "mtd" in os.path.basename(low) and \
            _head_has(path, b"Level-1C_User_Product", 512):
        from gdal_ray.sources.sentinel2 import sentinel2_meta

        return sentinel2_meta(path)
    if low.endswith((".gti.gpkg", ".gti.fgb", ".gti")):
        from gdal_ray.sources.gti import gti_meta

        out = gti_meta(path)
        out.pop("tiles", None)
        return out
    if low.endswith((".nws", ".doq")) and _head_has(
            path, b"BEGIN_USGS_DOQ_HEADER", 80):
        from gdal_ray.sources.mixedrasters import doq2_meta

        return doq2_meta(path)
    if low.endswith(".gsc"):
        from gdal_ray.sources.mixedrasters import gsc_meta

        return gsc_meta(path)
    if low.endswith(".slc") and os.path.exists(path + ".xml"):
        from gdal_ray.sources.mixedrasters import isce_meta

        return isce_meta(path)
    if low.endswith((".fits", ".fit")):
        from gdal_ray.sources.fits import fits_meta

        m = fits_meta(path)
        return {"driver": "FITS",
                "size": [m["width"], m["height"]], "bands": m["bands"],
                "bitpix": m["bitpix"], "dtype": m["dtype"],
                "geotransform": m.get("geotransform"),
                "ctype": m.get("ctype"), "nodata": m.get("nodata"),
                "n_extensions": len(m["extensions"])}
    if low.endswith(".mif"):
        from gdal_ray.sources.mifmid import read_mif_meta

        m = read_mif_meta(path)
        return {"driver": "MapInfo File", "n_features": m["n_features"],
                "fields": [{"name": n, "type": t} for n, t in m["columns"]]}
    raise ValueError(f"unrecognized format: {path}")


def _vrt(path: str) -> dict:
    from gdal_ray.sources.vrt import parse_vrt

    with open(path) as f:
        doc = parse_vrt(f.read())
    return {"format": "VRT", "width": doc["width"], "height": doc["height"],
            "bands": doc["spp"], "dtype": doc["dtype"],
            "geotransform": list(doc["geotransform"]),
            "nodata": doc["nodata"], "n_sources": len(doc["sources"]),
            "sources": [s["path"] for s in doc["sources"]]}


def _aaigrid(path: str) -> dict:
    from gdal_ray.sources.aaigrid import aaigrid_header

    h = aaigrid_header(path)
    return {"format": "AAIGrid", "width": h["ncols"], "height": h["nrows"],
            "bands": 1, "dtype": "float64",
            "geotransform": [h["xll"], h["cellsize"], 0.0,
                             h["yll"] + h["nrows"] * h["cellsize"], 0.0,
                             -h["cellsize"]],
            "nodata": h["nodata"]}


def _kml(path: str) -> dict:
    from gdal_ray.sources.kmlgpx import _element_spans

    return {"format": "KML",
            "n_features": len(_element_spans(path, "Placemark"))}


def _gpx(path: str) -> dict:
    from gdal_ray.sources.kmlgpx import _element_spans

    return {"format": "GPX",
            "layers": {"waypoints": len(_element_spans(path, "wpt")),
                       "tracks": len(_element_spans(path, "trk"))}}


def _raster_common(arr: np.ndarray, stats: bool) -> dict:
    if arr.ndim == 2:
        arr = arr[:, :, None]
    out = {
        "width": int(arr.shape[1]),
        "height": int(arr.shape[0]),
        "bands": int(arr.shape[2]),
        "dtype": str(arr.dtype),
    }
    if stats:
        from gdal_ray.stages.stats import checksum_plane

        out["stats"] = [
            {
                "band": b + 1,
                "min": float(arr[:, :, b].min()),
                "max": float(arr[:, :, b].max()),
                "mean": float(arr[:, :, b].mean()),
                "checksum": int(checksum_plane(
                    np.ascontiguousarray(arr[:, :, b]))),
            }
            for b in range(arr.shape[2])
        ]
    return out


def _tiff(path: str, stats: bool) -> dict:
    from gdal_ray.codecs.tiff import read_cog

    data = open(path, "rb").read()
    levels = read_cog(data)
    arr, info = levels[0]
    out = {"driver": "GTiff" if len(levels) == 1 else "COG",
           **_raster_common(arr, stats)}
    gt = info.get("geotransform")
    if gt is None:
        # GDAL world-file fallback (gdal_misc.cpp GDALReadWorldFile)
        from gdal_ray.sources.pam import read_world_file

        gt = read_world_file(path)
        if gt is not None:
            out["georef_source"] = "worldfile"
    out["geotransform"] = list(gt) if gt else None
    out["epsg"] = info.get("epsg")
    out["nodata"] = info.get("nodata")
    if info.get("palette") is not None:
        out["palette_entries"] = int(len(info["palette"]))
    if stats:
        # PAM cache: read <path>.aux.xml when present, else persist the
        # freshly computed stats there (gdalpamdataset.cpp behavior)
        from gdal_ray.sources.pam import read_pam_stats, write_pam_stats

        pam = read_pam_stats(path)
        if pam:
            out["stats_source"] = "pam"
            for s in out.get("stats", []):
                cached = pam.get(s["band"])
                if cached:
                    s.update(cached)
        else:
            a3 = arr[:, :, None] if arr.ndim == 2 else arr
            write_pam_stats(path, {
                b + 1: {"min": float(a3[:, :, b].min()),
                        "max": float(a3[:, :, b].max()),
                        "mean": float(a3[:, :, b].mean()),
                        "stddev": float(a3[:, :, b].std())}
                for b in range(a3.shape[2])})
            out["stats_source"] = "computed+pam-written"
    out["overviews"] = [
        {"width": a.shape[1], "height": a.shape[0]} for a, _ in levels[1:]
    ]
    return out


def _image(path: str, stats: bool) -> dict:
    from gdal_ray.codecs import decode

    ext = path.rsplit(".", 1)[-1].lower().replace("jpeg", "jpg")
    arr = decode(open(path, "rb").read(), ext)
    return {"driver": {"png": "PNG", "jpg": "JPEG", "webp": "WEBP",
                       "gif": "GIF", "bmp": "BMP"}[ext],
            **_raster_common(arr, stats)}


def _gpkg(path: str) -> dict:
    import sqlite3

    from gdal_ray.sources.gpkg import list_layers

    layers = list_layers(path)
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        for l in layers:
            row = con.execute(
                "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents"
                " WHERE table_name = ?", (l["name"],)).fetchone()
            l["extent"] = list(row) if row and row[0] is not None else None
    finally:
        con.close()
    return {"driver": "GPKG", "layers": layers}


def _shapefile(path: str) -> dict:
    from gdal_ray.sources.shapefile import read_dbf_bytes, read_shx_offsets

    base = path[:-4]
    with open(path, "rb") as f:
        hdr = f.read(100)
    stype = struct.unpack("<i", hdr[32:36])[0]
    bbox = struct.unpack("<4d", hdr[36:68])
    n = 0
    if os.path.exists(base + ".shx"):
        n = len(read_shx_offsets(open(base + ".shx", "rb").read()))
    fields = []
    if os.path.exists(base + ".dbf"):
        t = read_dbf_bytes(open(base + ".dbf", "rb").read(), rows=np.array([], np.int64))
        fields = [{"name": nm, "type": str(t.schema.field(nm).type)}
                  for nm in t.schema.names]
    names = {0: "Null", 1: "Point", 3: "PolyLine", 5: "Polygon", 8: "MultiPoint"}
    out = {"driver": "ESRI Shapefile", "shape_type": names.get(stype, str(stype)),
           "features": n, "extent": list(bbox), "fields": fields}
    from gdal_ray.sources.shapefile import read_prj

    crs = read_prj(base)
    if crs:
        out["crs_proj"] = crs
    return out


def _geojson(path: str) -> dict:
    seq = path.lower().endswith((".geojsonl", ".ndjson"))
    with open(path) as f:
        types: dict[str, int] = {}
        n = 0
        if not seq:
            doc = json.load(f)
            feats = doc.get("features", [doc])
            for ft in feats:
                g = (ft.get("geometry") or {}).get("type", "None")
                types[g] = types.get(g, 0) + 1
                n += 1
            drv = "GeoJSON"
        else:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                ft = json.loads(line)
                g = (ft.get("geometry") or {}).get("type", "None")
                types[g] = types.get(g, 0) + 1
                n += 1
            drv = "GeoJSONSeq"
    return {"driver": drv, "features": n, "geometry_types": types}


def _parquet(path: str) -> dict:
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    return {
        "driver": "Parquet",
        "rows": f.metadata.num_rows,
        "row_groups": f.metadata.num_row_groups,
        "columns": [{"name": c, "type": str(f.schema_arrow.field(c).type)}
                    for c in f.schema_arrow.names],
    }


def _mbtiles(path: str) -> dict:
    import sqlite3

    from gdal_ray.state.mbtiles import read_metadata

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        n, zmin, zmax = con.execute(
            "SELECT count(*), min(zoom_level), max(zoom_level) FROM tiles"
        ).fetchone()
    finally:
        con.close()
    return {"driver": "MBTiles", "metadata": read_metadata(path),
            "tiles": n, "min_zoom": zmin, "max_zoom": zmax}


def _pmtiles(path: str) -> dict:
    from gdal_ray.state.pmtiles import read_header, read_metadata

    h = read_header(path)
    return {"driver": "PMTiles", "metadata": read_metadata(path),
            "tiles": h["n_entries"], "min_zoom": h["min_zoom"],
            "max_zoom": h["max_zoom"], "clustered": h["clustered"]}


def _zarr(path: str) -> dict:
    from gdal_ray.sources.zarr import read_zarr_meta

    m = read_zarr_meta(path)
    return {"driver": "Zarr", "zarr_format": m.get("zarr_format", 2),
            "shape": m["shape"], "chunks": m["chunks"],
            "dtype": m["dtype"],
            "compressor": (m["compressor"] or {}).get("id") if m["compressor"] else None,
            "fill_value": m.get("fill_value")}


def _flatgeobuf(path: str) -> dict:
    from gdal_ray.sources.flatgeobuf import read_header

    h = read_header(path)
    return {"driver": "FlatGeobuf", "name": h["name"],
            "features": h["features_count"],
            "geometry_type": h["geometry_type"],
            "envelope": h["envelope"],
            "fields": [{"name": c["name"], "type": c["type"]}
                       for c in h["columns"]]}


def _is_pds3(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return b"PDS_VERSION_ID" in f.read(256)
    except OSError:
        return False


def _netcdf(path: str) -> dict:
    from gdal_ray.sources.netcdf3 import read_netcdf_meta

    with open(path, "rb") as f:
        if f.read(4) == b"\x89HDF":  # netCDF-4 = HDF5 container
            from gdal_ray.sources.hdf5 import netcdf4_meta

            m4 = netcdf4_meta(path)
            return {
                "driver": "netCDF",
                "version": "netCDF-4 (HDF5)",
                "dimensions": dict(m4["dims"]),
                "variables": {
                    k: {"dims": v["dims"], "shape": v["shape"],
                        "dtype": v["dtype"]}
                    for k, v in m4["vars"].items()
                },
                "global_attributes": {
                    k: (v if isinstance(v, str)
                        else list(np.asarray(v).tolist()))
                    for k, v in m4["gatts"].items()
                },
            }

    m = read_netcdf_meta(path)
    return {
        "driver": "netCDF",
        "version": f"CDF-{m['version']}",
        "dimensions": {k: (v if v else f"UNLIMITED ({m['numrecs']})")
                       for k, v in m["dims"]},
        "variables": {
            k: {"dims": v["dims"], "shape": list(v["shape"])}
            for k, v in m["vars"].items()
        },
        "global_attributes": {k: (v if isinstance(v, str) else list(np.asarray(v).tolist()))
                              for k, v in m["gatts"].items()},
    }


def _grib2(path: str) -> dict:
    from gdal_ray.sources.grib2 import read_grib2_meta

    m = read_grib2_meta(path)
    return {
        "driver": "GRIB2",
        "n_messages": m["n_messages"],
        "messages": [
            {
                "discipline": msg["discipline"], "category": msg["category"],
                "number": msg["number"], "size": [msg["nj"], msg["ni"]],
                "grid": [msg["lat0"], msg["lon0"], msg["dlat"], msg["dlon"]],
                "packing": {"nbits": msg["nbits"], "E": msg["E"], "D": msg["D"]},
                "ref_time": list(msg["ref_time"]),
            }
            for msg in m["messages"]
        ],
    }


def _hdf5(path: str) -> dict:
    from gdal_ray.sources.hdf5 import read_hdf5_meta

    m = read_hdf5_meta(path)
    return {
        "driver": "HDF5",
        "superblock_version": m["superblock_version"],
        "datasets": {
            k: {"shape": list(v["shape"]), "dtype": v["dtype"],
                "layout": v["layout"],
                **({"nbytes": v["nbytes"]} if v["layout"] == "contiguous"
                   else {"chunk_shape": list(v["chunk_shape"]),
                         "n_chunks": len(v["chunks"]),
                         "filters": [f[0] for f in v["filters"]]})}
            for k, v in m["datasets"].items()
        },
    }


def _csv(path: str) -> dict:
    with open(path) as f:
        header = f.readline().rstrip("\n").split(",")
        n = sum(1 for _ in f)
    return {"driver": "CSV", "features": n, "fields": header}
