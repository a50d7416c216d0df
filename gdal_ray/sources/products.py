"""Satellite product composite drivers: DIMAP v2 (SPOT 6/7, Pléiades —
frmts/dimap/dimapdataset.cpp) and Sentinel-1 SAFE
(frmts/safe/safedataset.cpp).

Both are XML manifests referencing component rasters this engine
already decodes (GeoTIFF / JPEG 2000):

- DIMAP2: a product directory holds ``VOL_*.XML`` (components list),
  one or more ``DIM_*.XML`` raster products (Raster_Dimensions,
  Raster_Encoding NBITS/SIGN, Data_Files with tile_R/tile_C mosaic
  positions and Regular_Tiling geometry) + per-component TIFF/JP2
  tiles.  Open accepts the directory, the VOL or a DIM; multiple DIMs
  surface as subdatasets (first = default, matching the reference).
- SAFE: ``manifest.safe`` references ``./measurement/*.tiff`` GRD
  images (one per polarisation); bands stack in manifest order
  (s1Level1MeasurementSchema dataObjects).

Scale shape: manifests parse driver-side; the component rasters fan
out through the existing tiled readers (read_geotiff_tiles / read_jp2)
— a Pléiades strip's R{r}C{c} tiles each become independent Ray tasks.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np


def _local(tag):
    return tag.rsplit("}", 1)[-1]


# ------------------------------------------------------------------ DIMAP2


def _find_dim_xmls(path: str):
    """Resolve a product dir / VOL_*.XML / DIM_*.XML to DIM paths."""
    if os.path.isdir(path):
        vols = [f for f in os.listdir(path) if f.upper().startswith("VOL_")
                and f.upper().endswith(".XML")]
        if vols:
            return _find_dim_xmls(os.path.join(path, vols[0]))
        dims = sorted(f for f in os.listdir(path)
                      if f.upper().startswith("DIM_")
                      and f.upper().endswith(".XML"))
        return [os.path.join(path, f) for f in dims]
    base = os.path.basename(path).upper()
    if base.startswith("DIM_") or base.endswith(".DIM"):
        return [path]
    # VOL: Component hrefs of DIMAP type
    tree = ET.parse(path)
    out = []
    for comp in tree.iter():
        if _local(comp.tag) != "Component":
            continue
        ctype = None
        href = None
        for e in comp.iter():
            if _local(e.tag) == "COMPONENT_TYPE":
                ctype = (e.text or "").strip()
            elif _local(e.tag) == "COMPONENT_PATH":
                href = e.get("href")
        if href and href.upper().startswith("DIM_"):
            out.append(os.path.join(os.path.dirname(path), href))
    return out


def dimap_meta(path: str) -> dict:
    dims = _find_dim_xmls(path)
    if not dims:
        raise ValueError("DIMAP2: no DIM_*.XML found")
    prods = []
    for dim in dims:
        tree = ET.parse(dim)
        root = tree.getroot()

        def t(name, default=None):
            for e in root.iter():
                if _local(e.tag) == name:
                    return e.text
            return default

        nrows = int(t("NROWS", 0))
        ncols = int(t("NCOLS", 0))
        nbands = int(t("NBANDS", 1))
        nbits = int(t("NBITS", 8))
        sign = (t("SIGN") or "UNSIGNED").strip()
        tiles = []
        for df in root.iter():
            if _local(df.tag) != "Data_File":
                continue
            r = int(df.get("tile_R", 1))
            c = int(df.get("tile_C", 1))
            href = None
            for e in df.iter():
                if _local(e.tag) == "DATA_FILE_PATH":
                    # DIMAP v1 uses an xlink:href attribute
                    href = e.get("href") or next(
                        (v for k, v in e.attrib.items()
                         if k.endswith("href")), None) or                         (e.text or "").strip() or None
            if href:
                tiles.append({"R": r, "C": c,
                              "path": os.path.join(
                                  os.path.dirname(dim), href)})
        tw = th = None
        for e in root.iter():
            if _local(e.tag) == "NTILES_SIZE":
                th = int(e.get("nrows"))
                tw = int(e.get("ncols"))
        if nbits <= 8:
            dtype = "uint8" if sign == "UNSIGNED" else "int8"
        elif nbits <= 16:
            dtype = "uint16" if sign == "UNSIGNED" else "int16"
        else:
            dtype = "uint32" if sign == "UNSIGNED" else "int32"
        epsg = None
        m = re.search(r"EPSG::(\d+)", t("GEODETIC_CRS_CODE") or "")
        if m:
            epsg = int(m.group(1))
        prods.append({
            "dim": dim, "width": ncols, "height": nrows, "bands": nbands,
            "nbits": nbits, "dtype": dtype, "tiles": tiles,
            "tile_width": tw or ncols, "tile_height": th or nrows,
            "epsg": epsg,
            "mission": t("MISSION"),
        })
    p0 = prods[0]
    return {
        "driver": "DIMAP2",
        "width": p0["width"], "height": p0["height"],
        "bands": p0["bands"], "dtype": p0["dtype"], "nbits": p0["nbits"],
        "epsg": p0["epsg"], "mission": p0["mission"],
        "n_subdatasets": len(prods),
        "subdatasets": [p["dim"] for p in prods],
        "products": prods,
    }


def read_dimap_array(path: str, subdataset: int = 0) -> np.ndarray:
    """Mosaic the component tiles of one DIM product -> (h, w, bands)."""
    from gdal_ray.codecs.tiff import decode_tiff
    m = dimap_meta(path)
    p = m["products"][subdataset]
    out = np.zeros((p["height"], p["width"], p["bands"]),
                   dtype=np.dtype(p["dtype"]))
    for tile in p["tiles"]:
        tp = tile["path"]
        if tp.lower().endswith((".jp2", ".j2k")):
            from gdal_ray.codecs.j2k import decode_jp2_bytes

            with open(tp, "rb") as f:
                arr = decode_jp2_bytes(f.read())
        else:
            with open(tp, "rb") as f:
                head = f.read(16)
            if head.lstrip().startswith(b"<VRT"):
                # DIMAP v1 sometimes ships a VRT in TIFF clothing
                # (autotest METADATA.DIM); compose its SimpleSources
                arr = _compose_vrt(tp, (p["height"], p["width"]),
                                   np.dtype(p["dtype"]))
            else:
                with open(tp, "rb") as f:
                    arr = decode_tiff(f.read())
        arr = np.asarray(arr)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        y0 = (tile["R"] - 1) * p["tile_height"]
        x0 = (tile["C"] - 1) * p["tile_width"]
        hh = min(arr.shape[0], p["height"] - y0)
        ww = min(arr.shape[1], p["width"] - x0)
        out[y0:y0 + hh, x0:x0 + ww] = arr[:hh, :ww]
    return out


# -------------------------------------------------------------------- SAFE


def safe_meta(path: str) -> dict:
    """`path` = manifest.safe or the .SAFE directory."""
    if os.path.isdir(path):
        path = os.path.join(path, "manifest.safe")
    tree = ET.parse(path)
    root = tree.getroot()
    base = os.path.dirname(path)
    measurements = []
    for obj in root.iter():
        if _local(obj.tag) != "dataObject":
            continue
        rep = obj.get("repID") or ""
        if "Measurement" not in rep:
            continue
        for e in obj.iter():
            if _local(e.tag) == "fileLocation":
                href = e.get("href") or ""
                if href.lower().endswith((".tif", ".tiff")):
                    measurements.append(os.path.normpath(
                        os.path.join(base, href)))
    if not measurements:
        raise ValueError("SAFE: no measurement rasters in manifest")
    from gdal_ray.sources.gtiff_reader import tiff_levels

    m0 = tiff_levels(measurements[0])[0]
    pols = []
    for p in measurements:
        mm = re.search(r"-(v[vh]|h[vh])-", os.path.basename(p))
        pols.append(mm.group(1).upper() if mm else "?")
    return {
        "driver": "SAFE",
        "width": m0["width"], "height": m0["height"],
        "bands": len(measurements),
        "dtype": m0["dtype"],
        "measurements": measurements,
        "polarisations": pols,
    }


def read_safe_array(path: str) -> np.ndarray:
    from gdal_ray.codecs.tiff import decode_tiff

    m = safe_meta(path)
    bands = []
    for p in m["measurements"]:
        with open(p, "rb") as f:
            bands.append(np.squeeze(decode_tiff(f.read())))
    return bands[0] if len(bands) == 1 else np.stack(bands, axis=-1)


def read_product(path: str, **kw):
    """-> Dataset of component-raster chunks: each DIMAP tile / SAFE
    measurement routes through the existing tiled readers (one Ray task
    per internal TIFF tile/strip)."""
    import ray.data as rd

    low = path.lower()
    if low.endswith("manifest.safe") or low.endswith(".safe"):
        from gdal_ray.sources.gtiff_reader import read_geotiff_tiles

        m = safe_meta(path)
        parts = []
        for b, mp in enumerate(m["measurements"]):
            def tag(bb):
                def f(t):
                    import pyarrow as pa

                    return t.append_column(
                        "band", pa.array([bb] * len(t), pa.int64()))
                return f
            parts.append(read_geotiff_tiles(mp).map_batches(
                tag(b), batch_format="pyarrow"))
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        return ds
    from gdal_ray.sources.gtiff_reader import read_geotiff_tiles

    m = dimap_meta(path)
    p0 = m["products"][0]
    parts = [read_geotiff_tiles(t["path"]) for t in p0["tiles"]]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def _compose_vrt(path, shape, dtype):
    """Minimal SimpleSource composition for VRTs referenced as DIMAP
    data files."""
    import xml.etree.ElementTree as _ET

    from gdal_ray.codecs.tiff import decode_tiff

    tree = _ET.parse(path)
    out = np.zeros(shape, dtype)
    for src in tree.iter():
        if _local(src.tag) not in ("SimpleSource", "ComplexSource"):
            continue
        fn = None
        band = 1
        sr = dr = None
        for e in src.iter():
            tag = _local(e.tag)
            if tag == "SourceFilename":
                fn = e.text.strip()
                if e.get("relativeToVRT") == "1":
                    fn = os.path.join(os.path.dirname(path), fn)
            elif tag == "SourceBand":
                band = int(e.text)
            elif tag == "SrcRect":
                sr = {k: int(float(e.get(k))) for k in
                      ("xOff", "yOff", "xSize", "ySize")}
            elif tag == "DstRect":
                dr = {k: int(float(e.get(k))) for k in
                      ("xOff", "yOff", "xSize", "ySize")}
        if fn is None:
            continue
        with open(fn, "rb") as f:
            arr = np.asarray(decode_tiff(f.read()))
        if arr.ndim == 3:
            arr = arr[:, :, band - 1]
        if sr:
            arr = arr[sr["yOff"]:sr["yOff"] + sr["ySize"],
                      sr["xOff"]:sr["xOff"] + sr["xSize"]]
        if dr is None:
            dr = {"xOff": 0, "yOff": 0, "xSize": arr.shape[1],
                  "ySize": arr.shape[0]}
        out[dr["yOff"]:dr["yOff"] + arr.shape[0],
            dr["xOff"]:dr["xOff"] + arr.shape[1]] = arr
    return out
