"""Training-data image operators: patch extraction, augmentation, quality
statistics — the per-image stages of a vision-model data pipeline.

GDAL's analogues are gdal_translate -srcwin (patch/crop), gdal raster
pipeline's flip/rotate steps, and ComputeStatistics (apps/
gdal_translate_lib.cpp srcwin path; gcore/gdalrasterband.cpp stats); the
ML framing (fixed-stride ViT patches, deterministic augmentation,
sharpness/entropy quality filters) follows the public data-pipeline
literature (e.g. DataComp / LAION filtering recipes).

Shape: every operator is a vectorized function over a pyarrow batch with
a `bytes` image column — decode happens once per batch via the pooled
`decode_batch`, pixels never leave the task, and only small derived rows
(patch grids, stats, or re-encoded augmented blobs) flow on.  Use inside
`map_batches(fn, batch_format="pyarrow", batch_size=...)`; batch_size
bounds peak pixel memory (bytes × batch_size × decoded expansion).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from gdal_ray.codecs import decode_batch, encode_png


# ----------------------------------------------------------------- patches


def extract_patches(batch: pa.Table, *, patch: int = 64, stride: int = 64,
                    with_bytes: bool = False) -> pa.Table:
    """ViT-style fixed-grid patch rows: one row per (image, px, py) with
    the patch's mean luma (and optionally the raw patch bytes).  Images
    smaller than `patch` yield no rows — count semantics are exactly
    (1 + (w - patch) // stride) * (1 + (h - patch) // stride) for
    w, h >= patch, the SQL-oracle-checkable grid."""
    imgs = decode_batch(batch.column("bytes").to_pylist())
    ids = batch.column("image_id").to_pylist()
    out_id: list[str] = []
    out_px: list[int] = []
    out_py: list[int] = []
    out_luma: list[float] = []
    out_bytes: list[bytes] = []
    for img_id, img in zip(ids, imgs):
        if img.ndim == 2:
            img = img[:, :, None]
        h, w = img.shape[:2]
        if w < patch or h < patch:
            continue
        nx = 1 + (w - patch) // stride
        ny = 1 + (h - patch) // stride
        # strided view: all patches of the luma plane at once (no copy)
        luma = (0.299 * img[:, :, 0]
                + 0.587 * img[:, :, min(1, img.shape[2] - 1)]
                + 0.114 * img[:, :, min(2, img.shape[2] - 1)])
        sy, sx = luma.strides
        grid = np.lib.stride_tricks.as_strided(
            luma, shape=(ny, nx, patch, patch),
            strides=(sy * stride, sx * stride, sy, sx), writeable=False)
        means = grid.mean(axis=(2, 3))
        for py in range(ny):
            for px in range(nx):
                out_id.append(img_id)
                out_px.append(px)
                out_py.append(py)
                out_luma.append(float(means[py, px]))
                if with_bytes:
                    out_bytes.append(
                        np.ascontiguousarray(
                            img[py * stride:py * stride + patch,
                                px * stride:px * stride + patch]).tobytes())
    cols = {
        "image_id": pa.array(out_id, pa.string()),
        "px": pa.array(out_px, pa.int32()),
        "py": pa.array(out_py, pa.int32()),
        "mean_luma": pa.array(out_luma, pa.float64()),
    }
    if with_bytes:
        cols["patch"] = pa.array(out_bytes, pa.binary())
    return pa.table(cols)


# ------------------------------------------------------------ augmentation


_AUG_OPS = ("identity", "fliph", "flipv", "rot90", "rot180", "rot270")


def _apply_aug(img: np.ndarray, op: str) -> np.ndarray:
    if op == "identity":
        return img
    if op == "fliph":
        return img[:, ::-1]
    if op == "flipv":
        return img[::-1]
    if op == "rot90":
        return np.rot90(img, 1)
    if op == "rot180":
        return np.rot90(img, 2)
    if op == "rot270":
        return np.rot90(img, 3)
    raise ValueError(f"unknown augmentation {op!r}")


def augment_images(batch: pa.Table, *, ops: tuple[str, ...] = _AUG_OPS,
                   seed: int = 42) -> pa.Table:
    """Deterministic per-image augmentation: the op is chosen by a hash of
    (seed, image_id) — re-running the pipeline reproduces byte-identical
    output (the resumable-sink contract).  Emits re-encoded PNG bytes +
    the op name + new dims."""
    imgs = decode_batch(batch.column("bytes").to_pylist())
    ids = batch.column("image_id").to_pylist()
    out = {"image_id": [], "op": [], "w": [], "h": [], "bytes": []}
    for img_id, img in zip(ids, imgs):
        k = int.from_bytes(
            hashlib.blake2b(f"{seed}:{img_id}".encode(),
                            digest_size=8).digest(), "big")
        op = ops[k % len(ops)]
        aug = np.ascontiguousarray(_apply_aug(img, op))
        out["image_id"].append(img_id)
        out["op"].append(op)
        out["h"].append(aug.shape[0])
        out["w"].append(aug.shape[1])
        out["bytes"].append(encode_png(aug))
    return pa.table({
        "image_id": pa.array(out["image_id"], pa.string()),
        "op": pa.array(out["op"], pa.string()),
        "w": pa.array(out["w"], pa.int32()),
        "h": pa.array(out["h"], pa.int32()),
        "bytes": pa.array(out["bytes"], pa.binary()),
    })


# ----------------------------------------------------------- quality stats


def image_quality(batch: pa.Table) -> pa.Table:
    """Per-image quality metrics for training-data filtering:
    brightness (mean luma), contrast (luma std), sharpness (variance of
    the 4-neighbour Laplacian — the classic focus measure), entropy
    (8-bit luma histogram, bits), dynamic range."""
    imgs = decode_batch(batch.column("bytes").to_pylist())
    ids = batch.column("image_id").to_pylist()
    rows = {k: [] for k in ("image_id", "brightness", "contrast",
                            "sharpness", "entropy", "dyn_range")}
    for img_id, img in zip(ids, imgs):
        if img.ndim == 3:
            luma = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
                    + 0.114 * img[:, :, 2])
        else:
            luma = img.astype(np.float64)
        lap = (-4.0 * luma[1:-1, 1:-1] + luma[:-2, 1:-1] + luma[2:, 1:-1]
               + luma[1:-1, :-2] + luma[1:-1, 2:])
        histo = np.bincount(
            np.clip(luma, 0, 255).astype(np.uint8).ravel(), minlength=256)
        p = histo / max(luma.size, 1)
        nz = p[p > 0]
        rows["image_id"].append(img_id)
        rows["brightness"].append(float(luma.mean()))
        rows["contrast"].append(float(luma.std()))
        rows["sharpness"].append(float(lap.var()) if lap.size else 0.0)
        rows["entropy"].append(float(-(nz * np.log2(nz)).sum()))
        rows["dyn_range"].append(float(luma.max() - luma.min())
                                 if luma.size else 0.0)
    return pa.table({
        "image_id": pa.array(rows["image_id"], pa.string()),
        "brightness": pa.array(rows["brightness"], pa.float64()),
        "contrast": pa.array(rows["contrast"], pa.float64()),
        "sharpness": pa.array(rows["sharpness"], pa.float64()),
        "entropy": pa.array(rows["entropy"], pa.float64()),
        "dyn_range": pa.array(rows["dyn_range"], pa.float64()),
    })


# ------------------------------------------------------- aspect-ratio buckets

# SDXL-style training resolution buckets (public bucketing recipe from the
# NovelAI aspect-ratio-bucketing writeup / SDXL report): group images by
# nearest bucket aspect ratio so batches share one padded resolution.
SDXL_BUCKETS: tuple[tuple[int, int], ...] = (
    (1024, 1024), (1152, 896), (896, 1152), (1216, 832), (832, 1216),
    (1344, 768), (768, 1344), (1536, 640), (640, 1536),
)


def ar_bucket_batch(batch: pa.Table,
                    buckets: tuple[tuple[int, int], ...] = SDXL_BUCKETS,
                    w_col: str = "w", h_col: str = "h") -> pa.Table:
    """Assign each row to the bucket with the nearest aspect ratio.

    Criterion: argmin_j |w/h − bw_j/bh_j| in LINEAR aspect-ratio space,
    evaluated with exact integer rational arithmetic —
    |w·bh_j − h·bw_j| · (L/bh_j) with L = lcm(bh) — so the choice is
    bit-reproducible and SQL-mirrorable (ties break to the lowest bucket
    index, matching numpy argmin's first-minimum rule).  Appends
    bucket_id / bucket_w / bucket_h / px (=w·h) columns."""
    w = batch.column(w_col).to_numpy(zero_copy_only=False).astype(np.int64)
    h = batch.column(h_col).to_numpy(zero_copy_only=False).astype(np.int64)
    bw = np.array([b[0] for b in buckets], dtype=np.int64)
    bh = np.array([b[1] for b in buckets], dtype=np.int64)
    scale = np.lcm.reduce(bh) // bh
    cost = np.abs(w[:, None] * bh[None, :] - h[:, None] * bw[None, :]) * scale
    idx = cost.argmin(axis=1)
    batch = batch.append_column("bucket_id", pa.array(idx.astype(np.int64)))
    batch = batch.append_column("bucket_w", pa.array(bw[idx]))
    batch = batch.append_column("bucket_h", pa.array(bh[idx]))
    return batch.append_column("px", pa.array(w * h))


def resize_to_bucket_batch(batch: pa.Table,
                           buckets: tuple[tuple[int, int], ...] = SDXL_BUCKETS,
                           method: str = "average",
                           fill: int = 114) -> pa.Table:
    """Execute the aspect-ratio bucket plan on pixels: decode, resize to
    the largest AR-preserving fit inside the assigned bucket, letterbox
    pad (centered, YOLO-convention grey 114), re-encode PNG.

    Fit geometry is pure integer arithmetic (SQL-mirrorable): if
    bw·h ≤ bh·w the image is width-limited → fit_w = bw,
    fit_h = h·bw // w; else fit_h = bh, fit_w = w·bh // h;
    pads = (bucket − fit) // 2.  Downscale uses the exact-coverage box
    average (overview.cpp average semantics); upscale uses bilinear.
    Output rows carry the encoded bytes plus out_w/out_h measured by
    RE-DECODING the written PNG, so a geometry oracle checks the real
    pixel path end to end."""
    from gdal_ray.codecs import decode as _decode
    from gdal_ray.stages.resample import resize

    out = {k: [] for k in ("image_id", "bucket_id", "fit_w", "fit_h",
                           "pad_x", "pad_y", "out_w", "out_h", "bytes")}
    assigned = ar_bucket_batch(batch, buckets=buckets)
    ids = assigned.column("image_id").to_pylist()
    datas = assigned.column("bytes").to_pylist()
    fmts = (assigned.column("fmt").to_pylist()
            if "fmt" in assigned.schema.names else [None] * len(ids))
    bids = assigned.column("bucket_id").to_pylist()
    for img_id, data, fmt, bid in zip(ids, datas, fmts, bids):
        bw, bh = buckets[bid]
        img = _decode(data, fmt) if fmt else _decode(data)
        h, w = img.shape[:2]
        if bw * h <= bh * w:
            fw, fh = bw, (h * bw) // w
        else:
            fw, fh = (w * bh) // h, bh
        fw, fh = max(fw, 1), max(fh, 1)
        m = method if (fw <= w and fh <= h) else "bilinear"
        fitted = resize(img, fw, fh, method=m)
        shape = (bh, bw) + img.shape[2:]
        canvas = np.full(shape, fill, dtype=img.dtype)
        py, px = (bh - fh) // 2, (bw - fw) // 2
        canvas[py:py + fh, px:px + fw] = fitted
        enc = encode_png(canvas)
        dec = _decode(enc, "png")
        out["image_id"].append(img_id)
        out["bucket_id"].append(bid)
        out["fit_w"].append(fw)
        out["fit_h"].append(fh)
        out["pad_x"].append(px)
        out["pad_y"].append(py)
        out["out_w"].append(dec.shape[1])
        out["out_h"].append(dec.shape[0])
        out["bytes"].append(enc)
    return pa.table({
        "image_id": pa.array(out["image_id"], pa.string()),
        "bucket_id": pa.array(out["bucket_id"], pa.int64()),
        "fit_w": pa.array(out["fit_w"], pa.int64()),
        "fit_h": pa.array(out["fit_h"], pa.int64()),
        "pad_x": pa.array(out["pad_x"], pa.int64()),
        "pad_y": pa.array(out["pad_y"], pa.int64()),
        "out_w": pa.array(out["out_w"], pa.int64()),
        "out_h": pa.array(out["out_h"], pa.int64()),
        "bytes": pa.array(out["bytes"], pa.binary()),
    })
