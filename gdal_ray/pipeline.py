"""Named-step raster pipeline: the `gdal raster pipeline` surface
(apps/gdalalg_raster_pipeline.cpp — step registry at :360-387, `!`-chained
CLI form "read [opts] ( ! <step> [opts] )* ! write [opts]" at :711-722)
re-expressed as a registry of Ray Data stages.

Each step is a named transform over a stream of RASTER ROWS — an Arrow
batch with columns (image_id, data, w, h, bands, dtype, gt, crs) where
``data`` is the C-order ndarray payload.  `read` decodes the image table
into raster rows; interior steps are pure per-image numpy kernels wrapped
in one `map_batches`; `write` re-encodes to PNG and sinks to parquet.
The whole chain stays lazy — Ray's streaming executor pipelines and
spills; nothing materializes driver-side.

User extension (the GDALAlgorithmRegistry::Register analogue): decorate a
``f(img: np.ndarray, **opts) -> np.ndarray`` with ``@register_step(name)``
and it becomes addressable from the pipeline string.  ``kind="dataset"``
registers a ``f(ds, ctx, **opts) -> ds`` with full Dataset control.

Steps mirroring the reference registry: read, write, aspect, clip,
color-map, fill-nodata, hillshade, proximity, reclassify, reproject,
resize, rgb-to-palette, roughness, scale, select, set-type, sieve, slope,
tpi, tri, unscale, viewshed.  Multi-input steps (mosaic, stack,
pansharpen, color-merge) need a second stream and raise a clear
NotImplementedError naming the standalone API that covers them.
"""

from __future__ import annotations

import shlex

import numpy as np
import pyarrow as pa

_REGISTRY: dict[str, tuple[str, object]] = {}

_RASTER_SCHEMA = pa.schema([
    ("image_id", pa.int64()),
    ("data", pa.binary()),
    ("w", pa.int64()),
    ("h", pa.int64()),
    ("bands", pa.int64()),
    ("dtype", pa.string()),
    ("gt", pa.list_(pa.float64(), 6)),
    ("crs", pa.string()),
])


def register_step(name: str, kind: str = "raster"):
    """Register a pipeline step. kind='raster': f(img, **opts) -> img;
    kind='dataset': f(ds, ctx, **opts) -> ds."""
    def deco(fn):
        _REGISTRY[name] = (kind, fn)
        return fn
    return deco


def step_names() -> list[str]:
    return sorted(_REGISTRY)


def _unpack(row_data: bytes, w: int, h: int, bands: int, dtype: str) -> np.ndarray:
    arr = np.frombuffer(row_data, dtype=np.dtype(dtype))
    return arr.reshape((h, w) if bands == 1 else (h, w, bands))


def _pack_rows(ids, imgs, gts, crss) -> pa.Table:
    data, ws, hs, bs, dts = [], [], [], [], []
    for img in imgs:
        img = np.ascontiguousarray(img)
        h, w = img.shape[:2]
        data.append(img.tobytes())
        ws.append(w)
        hs.append(h)
        bs.append(1 if img.ndim == 2 else img.shape[2])
        dts.append(img.dtype.name)
    return pa.table({
        "image_id": pa.array(ids, pa.int64()),
        "data": pa.array(data, pa.binary()),
        "w": pa.array(ws, pa.int64()),
        "h": pa.array(hs, pa.int64()),
        "bands": pa.array(bs, pa.int64()),
        "dtype": pa.array(dts, pa.string()),
        "gt": pa.array(gts, pa.list_(pa.float64(), 6)),
        "crs": pa.array(crss, pa.string()),
    })


def _raster_map(fn, opts):
    """Wrap a per-image kernel into a pyarrow map_batches callable."""
    def apply(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _RASTER_SCHEMA.empty_table()
        ids = batch.column("image_id").to_pylist()
        gts = batch.column("gt").to_pylist()
        crss = batch.column("crs").to_pylist()
        out = []
        for i in range(batch.num_rows):
            img = _unpack(
                batch.column("data")[i].as_py(),
                batch.column("w")[i].as_py(), batch.column("h")[i].as_py(),
                batch.column("bands")[i].as_py(), batch.column("dtype")[i].as_py(),
            )
            res = fn(img, **opts)
            if isinstance(res, tuple):  # (img, gt) or (img, gt, crs)
                img = res[0]
                gts[i] = list(res[1])
                if len(res) > 2:
                    crss[i] = res[2]
            else:
                img = res
            out.append(img)
        return _pack_rows(ids, out, gts, crss)
    return apply


def _vector_map(fn, opts):
    """Wrap a per-feature geometry kernel into a map_batches callable over
    vector rows (wkb + attribute columns).  fn(parts, **opts) returns new
    parts, None (drop the feature), or a list of parts-lists (explode —
    one output feature per element, attributes duplicated)."""
    from gdal_ray.geometry.wkb import polygon_parts
    from gdal_ray.vector import _encode_parts

    def apply(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        attr_cols = [c for c in batch.column_names if c != "wkb"]
        idx, out_wkb = [], []
        for i in range(batch.num_rows):
            res = fn(polygon_parts(batch.column("wkb")[i].as_py()), **opts)
            if res is None:
                continue
            if isinstance(res, tuple) and res and res[0] == "explode":
                for parts in res[1]:
                    idx.append(i)
                    out_wkb.append(_encode_parts(parts))
            else:
                idx.append(i)
                out_wkb.append(_encode_parts(res))
        taken = batch.take(pa.array(idx, pa.int64()))
        cols = {"wkb": pa.array(out_wkb, pa.binary())}
        for c in attr_cols:
            cols[c] = taken.column(c)
        return pa.table(cols)
    return apply


# --- parsing ---------------------------------------------------------------

def _coerce(v: str):
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        return v


def parse_pipeline(text: str) -> list[tuple[str, list, dict]]:
    """'read --limit=64 ! hillshade --azimuth=315 ! write /tmp/out' ->
    [(name, positional_args, options), ...] (same grammar as the
    reference's `!` form; `--k=v` and `--k v` both accepted)."""
    stages = []
    for part in text.split("!"):
        toks = shlex.split(part.strip())
        if not toks:
            continue
        name, args, opts = toks[0], [], {}
        i = 1
        while i < len(toks):
            t = toks[i]
            if t.startswith("--"):
                if "=" in t:
                    k, v = t[2:].split("=", 1)
                else:
                    k = t[2:]
                    i += 1
                    if i >= len(toks):
                        raise ValueError(f"option --{k} missing a value in step {name!r}")
                    v = toks[i]
                opts[k.replace("-", "_")] = _coerce(v)
            else:
                args.append(_coerce(t))
            i += 1
        stages.append((name, args, opts))
    if not stages:
        raise ValueError("empty pipeline")
    return stages


def run_pipeline(text: str, sf_dir: str, **ctx_extra):
    """Build (lazily) the Ray Dataset for a `!`-chained pipeline string.
    Returns the final Dataset; a trailing `write` step appends the sink
    stage and returns the written-manifest dataset."""
    stages = parse_pipeline(text)
    if stages[0][0] not in ("read", "read-vector"):
        raise ValueError("pipeline must start with 'read' or 'read-vector'")
    ctx = {"sf_dir": sf_dir, **ctx_extra}
    ds = None
    for name, args, opts in stages:
        if name not in _REGISTRY:
            raise ValueError(f"unknown step {name!r}; known: {', '.join(step_names())}")
        kind, fn = _REGISTRY[name]
        if kind == "dataset":
            ds = fn(ds, ctx, *args, **opts)
        elif kind == "vector":
            ds = ds.map_batches(_vector_map(fn, opts), batch_format="pyarrow",
                                batch_size=opts.pop("batch_size", 1024))
        else:
            ds = ds.map_batches(_raster_map(fn, opts), batch_format="pyarrow",
                                batch_size=opts.pop("batch_size", 32))
    return ds


def save_gdalg(text: str, path: str) -> None:
    """Serialize a pipeline string as a .gdalg.json document — the GDALG
    driver idiom (frmts/gdalg/gdalgdriver.cpp: a whole CLI pipeline saved
    as JSON, re-executed lazily on open)."""
    import json
    import os

    stages = parse_pipeline(text)  # validate before persisting
    if stages[0][0] not in ("read", "read-vector"):
        raise ValueError("pipeline must start with 'read' or 'read-vector'")
    doc = {"type": "gdal_streamed_alg", "command_line": text,
           "relative_paths_relative_to_this_file": False}
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1)
    os.replace(tmp, path)


def open_gdalg(path: str, sf_dir: str, **ctx_extra):
    """Open a .gdalg.json document: re-parse the stored pipeline and
    return its lazy Dataset — nothing executes until consumed, exactly
    the reference's deferred-on-open semantics."""
    import json

    with open(path) as f:
        doc = json.load(f)
    if doc.get("type") != "gdal_streamed_alg":
        raise ValueError(f"{path}: not a gdal_streamed_alg document")
    return run_pipeline(doc["command_line"], sf_dir, **ctx_extra)


# --- reference-registry steps ----------------------------------------------

@register_step("read", kind="dataset")
def _read(ds, ctx, *args, limit: int = 256, kind: str = "images"):
    """Decode the synthesized image table (or DEM grids) into raster rows
    (GDALRasterReadAlgorithm).  Default gt/crs: unit pixel grid, 4326."""
    from gdal_ray.pipelines.queries import _read as read_table
    from gdal_ray.codecs import decode as _dec
    from gdal_ray.synth import make_image_batch
    from gdal_ray.stages.dem import elevation_grids

    docs = read_table(ctx["sf_dir"], "documents", columns=["doc_id"])

    def to_rasters(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"))
        ids = ids[ids < limit]  # in-batch filter: no schema-less empty blocks
        if len(ids) == 0:
            return _RASTER_SCHEMA.empty_table()
        if kind == "dem":
            imgs = [elevation_grids(np.array([i]))[0] for i in ids]
        else:
            enc = make_image_batch({"id": ids})
            imgs = [_dec(blob, fmt) for blob, fmt in
                    zip(enc.column("bytes").to_pylist(), enc.column("fmt").to_pylist())]
        gts = [[0.0, 1.0, 0.0, 0.0, 0.0, -1.0]] * len(ids)
        return _pack_rows(ids.tolist(), imgs, gts, ["EPSG:4326"] * len(ids))

    return docs.map_batches(to_rasters, batch_format="pyarrow", batch_size=64)


@register_step("write", kind="dataset")
def _write(ds, ctx, out: str | None = None, format: str = "png-parquet"):
    """Re-encode rasters to PNG and sink to partitioned parquet
    (GDALRasterWriteAlgorithm).  Without ``out``, returns per-image
    checksum rows instead of writing (dry-run/inspection form)."""
    from gdal_ray.codecs.png import encode_png
    from gdal_ray.stages.stats import checksum_plane

    def enc(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            fields = [("image_id", pa.int64()), ("checksum", pa.int64())]
            if out is not None:
                fields.append(("png", pa.binary()))
            return pa.schema(fields).empty_table()
        ids, blobs, sums = [], [], []
        for i in range(b.num_rows):
            img = _unpack(b.column("data")[i].as_py(), b.column("w")[i].as_py(),
                          b.column("h")[i].as_py(), b.column("bands")[i].as_py(),
                          b.column("dtype")[i].as_py())
            plane = img if img.ndim == 2 else img[:, :, 0]
            sums.append(int(checksum_plane(np.ascontiguousarray(plane))))
            if out is not None:
                u8 = np.clip(img, 0, 255).astype(np.uint8)
                blobs.append(encode_png(u8))
            ids.append(b.column("image_id")[i].as_py())
        cols = {"image_id": pa.array(ids, pa.int64()),
                "checksum": pa.array(sums, pa.int64())}
        if out is not None:
            cols["png"] = pa.array(blobs, pa.binary())
        return pa.table(cols)

    res = ds.map_batches(enc, batch_format="pyarrow", batch_size=32)
    if out is not None:
        res.write_parquet(out)
        import ray.data
        return ray.data.read_parquet(out, columns=["image_id", "checksum"])
    return res


def _first_band(img):
    return img if img.ndim == 2 else img[:, :, 0]


@register_step("hillshade")
def _hillshade(img, azimuth: float = 315.0, altitude: float = 45.0,
               z_factor: float = 1.0, variant: str = "regular"):
    """variant mirrors gdaldem hillshade -combined/-igor/-multidirectional
    (apps/gdaldem_lib.cpp:943,1140,1253)."""
    from gdal_ray.stages import dem
    band = _first_band(img).astype(np.float64)[None]
    if variant == "regular":
        return dem.hillshade(band, azimuth, altitude, z=z_factor)[0]
    if variant == "combined":
        return dem.hillshade_combined(band, azimuth, altitude, z=z_factor)[0]
    if variant == "igor":
        return dem.hillshade_igor(band, azimuth, z=z_factor)[0]
    if variant == "multidirectional":
        return dem.hillshade_multidirectional(band, altitude, z=z_factor)[0]
    raise ValueError(f"unknown hillshade variant {variant!r}")


@register_step("slope")
def _slope(img, z_factor: float = 1.0, scale: float = 1.0):
    from gdal_ray.stages.dem import slope_degrees
    return slope_degrees(_first_band(img).astype(np.float64)[None], z=z_factor,
                         scale=scale)[0]


@register_step("aspect")
def _aspect(img):
    from gdal_ray.stages.dem import aspect_degrees
    return aspect_degrees(_first_band(img).astype(np.float64)[None])[0]


@register_step("roughness")
def _roughness(img):
    from gdal_ray.stages.dem import window_metrics
    return window_metrics(_first_band(img).astype(np.int64)[None])[0][0]


@register_step("tri")
def _tri(img):
    from gdal_ray.stages.dem import window_metrics
    return window_metrics(_first_band(img).astype(np.int64)[None])[1][0]


@register_step("tpi")
def _tpi(img):
    from gdal_ray.stages.dem import window_metrics
    return window_metrics(_first_band(img).astype(np.int64)[None])[2][0]


@register_step("reclassify")
def _reclassify(img, bins: str | None = None):
    from gdal_ray.stages.dem import reclassify, RECLASS_BINS
    b = RECLASS_BINS if bins is None else tuple(float(x) for x in str(bins).split(","))
    return reclassify(_first_band(img), bins=b)


@register_step("fill-nodata")
def _fill(img, nodata: float = 0.0):
    from gdal_ray.stages.rasterops import fill_nodata
    band = _first_band(img)
    return fill_nodata(band, band == nodata)


@register_step("sieve")
def _sieve(img, threshold: int = 4, connect8: int = 0):
    from gdal_ray.stages.rasterops import sieve
    return sieve(_first_band(img).astype(np.int64), threshold=int(threshold),
                 connect8=bool(connect8)).astype(img.dtype if img.ndim == 2 else np.int64)


@register_step("proximity")
def _proximity(img, target: float = 255.0):
    from gdal_ray.stages.rasterops import proximity_sq
    return np.sqrt(proximity_sq(_first_band(img) == target))


@register_step("viewshed")
def _viewshed(img, row: int = 0, col: int = 0, height: int = 2):
    from gdal_ray.stages.dem import viewshed
    return viewshed(_first_band(img).astype(np.int64), int(row), int(col),
                    obs_height=int(height)).astype(np.uint8)


@register_step("reproject", kind="dataset")
def _reproject_ds(ds, ctx, dst_crs: str = "EPSG:3857",
                  resampling: str = "nearest", batch_size: int = 16):
    """GDALRasterReprojectAlgorithm: per-image warp with the row's own
    gt/crs, emitting the new grid + crs."""
    from gdal_ray.stages.warp import warp_image

    def rp(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _RASTER_SCHEMA.empty_table()
        ids, imgs, gts, crss = [], [], [], []
        for i in range(b.num_rows):
            img = _unpack(b.column("data")[i].as_py(), b.column("w")[i].as_py(),
                          b.column("h")[i].as_py(), b.column("bands")[i].as_py(),
                          b.column("dtype")[i].as_py())
            gt = tuple(b.column("gt")[i].as_py())
            crs = b.column("crs")[i].as_py()
            warped, dst_gt = warp_image(img, gt, crs, dst_crs, method=resampling)
            ids.append(b.column("image_id")[i].as_py())
            imgs.append(warped)
            gts.append(list(dst_gt))
            crss.append(dst_crs)
        return _pack_rows(ids, imgs, gts, crss)

    return ds.map_batches(rp, batch_format="pyarrow", batch_size=batch_size)


@register_step("resize")
def _resize(img, size: str = "32,32", resampling: str = "nearest"):
    from gdal_ray.stages.resample import resize
    w, h = (int(x) for x in str(size).split(","))
    return resize(_first_band(img), w, h, resampling)


@register_step("scale")
def _scale(img, src_min: float = 0.0, src_max: float = 255.0,
           dst_min: float = 0.0, dst_max: float = 255.0):
    """Linear rescale (GDALRasterScaleAlgorithm / -scale of translate)."""
    f = img.astype(np.float64)
    span = (src_max - src_min) or 1.0
    out = (f - src_min) * (dst_max - dst_min) / span + dst_min
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


@register_step("unscale")
def _unscale(img, scale: float = 1.0, offset: float = 0.0):
    """Apply band scale/offset: phys = raw * scale + offset."""
    return img.astype(np.float64) * scale + offset


@register_step("select")
def _select(img, bands: str = "1"):
    """Band select, 1-based (GDALRasterSelectAlgorithm)."""
    idx = [int(x) - 1 for x in str(bands).split(",")]
    if img.ndim == 2:
        if idx != [0]:
            raise ValueError("single-band raster has only band 1")
        return img
    sel = img[:, :, idx]
    return sel[:, :, 0] if sel.shape[2] == 1 else sel


@register_step("set-type")
def _set_type(img, ot: str = "float64"):
    dt = np.dtype(str(ot).lower())
    if np.issubdtype(dt, np.integer) and np.issubdtype(img.dtype, np.floating):
        info = np.iinfo(dt)
        return np.clip(np.floor(img + 0.5), info.min, info.max).astype(dt)
    return img.astype(dt)


@register_step("clip")
def _clip(img, bbox: str = "0,0,16,16"):
    """Pixel-space subwindow x0,y0,x1,y1 (GDALRasterClipAlgorithm's
    --bbox, expressed in the row's pixel grid)."""
    x0, y0, x1, y1 = (int(v) for v in str(bbox).split(","))
    return img[y0:y1, x0:x1]


@register_step("rgb-to-palette")
def _rgb2pct(img, colors: int = 16):
    from gdal_ray.stages.color import median_cut_palette, nearest_palette_index
    if img.ndim != 3:
        raise ValueError("rgb-to-palette needs an RGB raster")
    pal = median_cut_palette(img.reshape(-1, 3), n_colors=int(colors))
    return nearest_palette_index(img, pal).astype(np.uint8)


@register_step("pixfun")
def _pixfun(img, fn: str = "sum", **kwargs):
    """VRT pixel function over the raster's bands (derived-band semantics,
    frmts/vrt/vrtderivedrasterband.cpp; registry in
    gdal_ray/pixelfunctions.py).  A 2-D raster is a single source band;
    an (h, w, b) raster feeds each band as one source."""
    from gdal_ray.pixelfunctions import apply_pixel_function

    bands = [img] if img.ndim == 2 else [img[:, :, i] for i in range(img.shape[2])]
    return apply_pixel_function(str(fn), bands, **kwargs)


@register_step("color-map")
def _color_map(img, ramp: str = "0:0,0,0;255:255,255,255"):
    """gdaldem color-relief-style linear ramp gray -> RGB."""
    stops = []
    for part in str(ramp).split(";"):
        v, rgb = part.split(":")
        stops.append((float(v), tuple(int(c) for c in rgb.split(","))))
    stops.sort()
    band = _first_band(img).astype(np.float64)
    vals = np.array([s[0] for s in stops])
    cols = np.array([s[1] for s in stops], dtype=np.float64)
    out = np.empty(band.shape + (3,), dtype=np.uint8)
    for c in range(3):
        out[:, :, c] = np.clip(
            np.floor(np.interp(band, vals, cols[:, c]) + 0.5), 0, 255
        ).astype(np.uint8)
    return out


@register_step("equalize")
def _equalize(img, levels: int = 256):
    """Histogram equalization (gdalenhance -equalize)."""
    from gdal_ray.stages.stats import equalize

    band = _first_band(img).astype(np.int64)
    out = equalize(band[None], int(levels))[0]
    return out.astype(np.uint8) if levels <= 256 else out


# --- vector steps (gdalalg_vector_pipeline.cpp registry, :324-341) ---------

@register_step("read-vector", kind="dataset")
def _read_vector(ds, ctx, *args, n: int = 50, geojson: str | None = None,
                 csv: str | None = None):
    """Vector stream source: the synthetic polygon table by default, or a
    GeoJSON(-Seq)/CSV-WKT layer (GDALVectorReadAlgorithm)."""
    import ray.data

    if geojson is not None:
        from gdal_ray.sources.geojson import read_geojson, read_geojsonseq
        return (read_geojsonseq(geojson) if str(geojson).endswith("l")
                else read_geojson(geojson))
    if csv is not None:
        from gdal_ray.sources.csvwkt import read_csv_wkt
        return read_csv_wkt(csv)
    from gdal_ray.synth import make_polygon_table
    return ray.data.from_arrow(make_polygon_table(int(n)))


@register_step("write-vector", kind="dataset")
def _write_vector(ds, ctx, out: str | None = None, format: str = "geojsonseq"):
    """Vector sink (GDALVectorWriteAlgorithm): GeoJSONSeq or CSV/WKT; with
    no ``out``, returns per-feature area/vertex stats for inspection."""
    if out is not None:
        if format == "csv":
            from gdal_ray.sources.csvwkt import write_csv_wkt
            write_csv_wkt(ds, out)
        else:
            from gdal_ray.sources.geojson import write_geojsonseq
            write_geojsonseq(ds, out)
        import ray.data
        return ds

    from gdal_ray.geometry.wkb import polygon_parts
    from gdal_ray.geometry.ops import counts, ring_area2_float

    def stats(b: pa.Table) -> pa.Table:
        ids, nparts, nverts, area = [], [], [], []
        for i in range(b.num_rows):
            parts = polygon_parts(b.column("wkb")[i].as_py())
            p, r, v = counts(parts)
            ids.append(i)
            nparts.append(p)
            nverts.append(v)
            area.append(float(sum(abs(ring_area2_float(rr)) / 2.0
                                  for rs in parts for rr in rs[:1])))
        out_cols = {"n_parts": pa.array(nparts, pa.int64()),
                    "n_vertices": pa.array(nverts, pa.int64()),
                    "area": pa.array(area, pa.float64())}
        for c in b.column_names:
            if c != "wkb":
                out_cols[c] = b.column(c)
        return pa.table(out_cols)

    return ds.map_batches(stats, batch_format="pyarrow")


@register_step("filter", kind="dataset")
def _filter_vector(ds, ctx, where: str = "1 = 1"):
    """Attribute filter (GDALVectorFilterAlgorithm; swq WHERE string)."""
    from gdal_ray.vector import vector_translate
    return vector_translate(ds, where=str(where))


@register_step("select-fields", kind="dataset")
def _select_vector(ds, ctx, fields: str = ""):
    """Attribute projection (GDALVectorSelectAlgorithm)."""
    from gdal_ray.vector import vector_translate
    sel = [f for f in str(fields).split(",") if f]
    return vector_translate(ds, select=sel)


@register_step("reproject-vector", kind="dataset")
def _reproject_vector(ds, ctx, dst_crs: str = "EPSG:3857",
                      src_crs: str = "EPSG:4326"):
    """Per-vertex reprojection (GDALVectorReprojectAlgorithm)."""
    from gdal_ray.vector import vector_translate
    return vector_translate(ds, s_srs=src_crs, t_srs=dst_crs)


@register_step("clip-vector", kind="dataset")
def _clip_vector(ds, ctx, bbox: str = "-180,-90,180,90"):
    """Rectangle clip (GDALVectorClipAlgorithm); empty features drop."""
    from gdal_ray.vector import vector_translate
    x0, y0, x1, y1 = (float(v) for v in str(bbox).split(","))
    return vector_translate(ds, clip_bbox=(x0, y0, x1, y1))


@register_step("simplify", kind="vector")
def _simplify(parts, tolerance: float = 0.1):
    """Douglas-Peucker per ring (GDALVectorSimplifyAlgorithm /
    OGRGeometry::Simplify)."""
    from gdal_ray.geometry.ops import douglas_peucker
    out = []
    for rings in parts:
        new = [douglas_peucker(r, float(tolerance)) for r in rings]
        out.append([r for r in new if len(r) >= 3] or [new[0]])
    return out


@register_step("segmentize", kind="vector")
def _segmentize(parts, max_length: float = 1.0):
    """Densify edges to a max segment length (GDALVectorSegmentize /
    OGRGeometry::Segmentize)."""
    from gdal_ray.geometry.ops import segmentize
    return [[segmentize(r, float(max_length)) for r in rings] for rings in parts]


@register_step("swap-xy", kind="vector")
def _swap_xy(parts):
    """(GDALVectorSwapXYAlgorithm / OGRGeometry::swapXY)."""
    from gdal_ray.geometry.ops import swap_xy
    return [[swap_xy(r) for r in rings] for rings in parts]


@register_step("make-valid", kind="vector")
def _make_valid_step(parts):
    """Split self-touching rings into simple loops (GDALVectorMakeValid /
    OGRGeometry::MakeValid, pinch-point subset)."""
    from gdal_ray.geometry.ops import make_valid_pinch
    out = []
    for rings in parts:
        for r in rings:
            for loop in make_valid_pinch(r):
                out.append([loop])
    return out


@register_step("explode-collections", kind="vector")
def _explode(parts):
    """MultiPolygon -> one feature per part
    (GDALVectorExplodeCollectionsAlgorithm)."""
    if len(parts) <= 1:
        return parts
    return ("explode", [[p] for p in parts])


@register_step("buffer", kind="vector")
def _buffer(parts, distance: float = 1.0, quadrant_segments: int = 8):
    """Convex-polygon buffer (GDALVectorBufferAlgorithm scope note: the
    Minkowski-sum kernel in geometry/ops.py covers convex exteriors)."""
    from gdal_ray.geometry.ops import buffer_convex
    return [[buffer_convex(rings[0], float(distance), int(quadrant_segments))]
            for rings in parts]


@register_step("sql-vector", kind="dataset")
def _sql_vector(ds, ctx, query: str = "SELECT * FROM layer"):
    """Full SQL over the stream, table name `layer`
    (GDALVectorSQLAlgorithm / ExecuteSQL)."""
    from gdal_ray.sql import execute_sql
    return execute_sql(str(query), {"layer": ds})


for _multi in ("mosaic", "stack", "pansharpen", "color-merge"):
    def _needs_two(_img, _name=_multi, **_opts):
        raise NotImplementedError(
            f"step {_name!r} takes multiple input streams; use the standalone "
            "APIs (stages.render for mosaic, stages.color.pansharpen_brovey)"
        )
    _REGISTRY[_multi] = ("raster", _needs_two)
