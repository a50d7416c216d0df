"""Deterministic synthetic inputs (FIXTURES.md F1/F2) — seeded, no external data.

The primary table matches BASELINE.json's ``input_hint`` schema exactly:
(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64), with geo-footprint columns
(lon_min/lat_min/lon_max/lat_max:float64) added at ingest.

Everything is a pure function of the integer image index ``i`` (and a
global seed), so any worker can generate any shard independently —
generation itself runs *inside* ``map_batches`` over ``ray.data.range``,
never on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gdal_ray.codecs import encode

SEED = 42
W_CYCLE = [16, 64, 256, 257, 512]
H_CYCLE = [16, 64, 255, 256, 512]
FMT_CYCLE = ["png", "jpeg", "webp"]
RES_CYCLE = [1e-3, 1e-4, 1e-5]  # degrees/pixel — drives max-zoom selection
HOT_FRACTION_MOD = 20  # i % 20 == 0 → ~5% of rows land in the hot 1°x1° box
HOT_BOX = (10.0, 45.0)  # lon/lat of the hot cluster's lower-left corner
NEAR_DUP_MOD = 97  # i % 97 == 0 → pixel content repeats (phash near-dup fixtures)

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu"
).split()


# ---------------------------------------------------------------------------
# scalar helpers (deterministic in i)

def _halton(i: int, base: int) -> float:
    f, r = 1.0, 0.0
    n = i + 1
    while n > 0:
        f /= base
        r += f * (n % base)
        n //= base
    return r


def caption_for(i: int) -> str:
    k = (i * 2654435761) & 0xFFFFFFFF
    words = [_WORDS[(k >> s) % len(_WORDS)] for s in (0, 5, 10, 15)]
    return f"caption {i} " + " ".join(words)


def image_dims(i: int) -> tuple[int, int, str]:
    return W_CYCLE[i % 5], H_CYCLE[i % 5], FMT_CYCLE[i % 3]


def pixels_for(i: int, w: int, h: int) -> np.ndarray:
    """Procedural RGB pixels: gradient + checkerboard + noise block (F1)."""
    key = 0 if (i % NEAR_DUP_MOD == 0) else i
    rng = np.random.Generator(np.random.PCG64(SEED * 1_000_003 + key))
    yy, xx = np.mgrid[0:h, 0:w]
    grad = ((xx * 255) // max(w - 1, 1)).astype(np.uint8)
    checker = (((xx // 8) + (yy // 8)) % 2 * 128).astype(np.uint8)
    img = np.empty((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = grad
    img[:, :, 1] = checker
    img[:, :, 2] = ((yy * 255) // max(h - 1, 1)).astype(np.uint8)
    # noise block in the top-left quadrant so resampling/PSNR tests have texture
    nh, nw = max(h // 4, 1), max(w // 4, 1)
    img[:nh, :nw, :] = rng.integers(0, 256, size=(nh, nw, 3), dtype=np.uint8)
    return img


def phash64(img: np.ndarray) -> int:
    """64-bit aHash: mean of an 8x8 box-reduction of the gray image, bit per
    cell above the mean.  Deterministic, content-derived (FIXTURES F1).
    Fully vectorized (np.add.reduceat over row/col boundaries)."""
    gray = img.mean(axis=2) if img.ndim == 3 else img.astype(np.float64)
    h, w = gray.shape
    if h >= 8 and w >= 8:
        # boundaries strictly increasing here, so reduceat counts are ≥1
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(8) * w) // 8
        cells = np.add.reduceat(np.add.reduceat(gray, ys, axis=0), xs, axis=1)
        ycnt = np.diff(np.append(ys, h)).astype(np.float64)
        xcnt = np.diff(np.append(xs, w)).astype(np.float64)
        cells = cells / np.outer(ycnt, xcnt)
    else:
        # tiny images: duplicate reduceat boundaries would yield 0-count
        # cells (divide by zero) — take each cell as the mean of a window
        # clamped to at least one pixel (rows/cols shared between cells)
        cells = np.empty((8, 8), dtype=np.float64)
        for r in range(8):
            y0 = min((r * h) // 8, h - 1)
            y1 = min(max(((r + 1) * h) // 8, y0 + 1), h)
            for c in range(8):
                x0 = min((c * w) // 8, w - 1)
                x1 = min(max(((c + 1) * w) // 8, x0 + 1), w)
                cells[r, c] = gray[y0:y1, x0:x1].mean()
    bits = (cells > cells.mean()).ravel()
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return val - (1 << 64) if val >= (1 << 63) else val


def footprint_for(i: int, w: int, h: int) -> tuple[float, float, float, float]:
    """Halton placement + 5% hot cluster + res cycle (FIXTURES F1)."""
    res = RES_CYCLE[i % 3]
    if i % HOT_FRACTION_MOD == 0:
        lon_min = HOT_BOX[0] + _halton(i, 2)
        lat_min = HOT_BOX[1] + _halton(i, 3)
    else:
        lon_min = -180.0 + 360.0 * _halton(i, 2)
        lat_min = -85.0511 + 170.0 * _halton(i, 3)
    lon_max = min(lon_min + w * res, 180.0)
    lat_max = min(lat_min + h * res, 85.0511)
    return lon_min, lat_min, lon_max, lat_max


# ---------------------------------------------------------------------------
# batch generator (runs inside map_batches over ray.data.range(n))

def make_image_batch(batch: dict, with_footprint: bool = True) -> pa.Table:
    """dict with 'id' int64 numpy array -> full image-table Arrow batch."""
    ids = np.asarray(batch["id"], dtype=np.int64)
    image_id, blob, ws, hs, fmts, captions, phashes = [], [], [], [], [], [], []
    fps = []
    for i in ids.tolist():
        w, h, fmt = image_dims(i)
        img = pixels_for(i, w, h)
        blob.append(encode(img, fmt))
        image_id.append(f"img-{i:012d}")
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        captions.append(caption_for(i))
        phashes.append(phash64(img))
        if with_footprint:
            fps.append(footprint_for(i, w, h))
    cols = {
        "image_id": pa.array(image_id, pa.string()),
        "bytes": pa.array(blob, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "caption": pa.array(captions, pa.string()),
        "phash": pa.array(phashes, pa.int64()),
    }
    if with_footprint:
        fp = np.array(fps, dtype=np.float64).reshape(-1, 4)
        for j, name in enumerate(["lon_min", "lat_min", "lon_max", "lat_max"]):
            cols[name] = pa.array(fp[:, j], pa.float64())
    return pa.table(cols)


def synth_images_dataset(n: int, *, parallelism: int = -1, with_footprint: bool = True):
    """Distributed deterministic image table as a ray.data.Dataset.

    Blocks are sized so generation parallelizes across all cores
    (batch_size=None follows the block structure — a fixed batch_size
    would coalesce blocks and cap task concurrency below num_cpus)."""
    import ray.data as rd

    blocks = parallelism if parallelism > 0 else int(np.clip(n // 64, 16, 512))
    ds = rd.range(n, override_num_blocks=blocks)
    return ds.map_batches(
        lambda b: make_image_batch(b, with_footprint),
        batch_format="numpy",
        batch_size=None,
    )


# ---------------------------------------------------------------------------
# polygon table (FIXTURES F2)

def make_polygon_table(n: int = 50, seed: int = SEED) -> pa.Table:
    """Seeded polygon table: boxes, convex k-gons, concave "C" shapes,
    polygons with holes, one multipolygon.  All coordinates are multiples of
    0.01 degrees so the SQL oracle (edges embedded as VALUES) reproduces the
    exact same float64 values.
    """
    from gdal_ray.geometry.wkb import encode_multipolygon, encode_polygon
    from gdal_ray.geometry.predicates import polygon_area

    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    for j in range(n):
        cx = round(float(rng.uniform(-170, 170)), 2)
        cy = round(float(rng.uniform(-80, 80)), 2)
        kind = j % 5
        if kind == 0:  # axis-aligned box
            sx = round(float(rng.uniform(0.5, 8.0)), 2)
            sy = round(float(rng.uniform(0.5, 8.0)), 2)
            ring = np.array([[cx, cy], [cx + sx, cy], [cx + sx, cy + sy], [cx, cy + sy]])
            wkb = encode_polygon([ring])
            rings = [ring]
        elif kind == 1:  # convex k-gon (vertices rounded to 0.01)
            k = int(rng.integers(5, 9))
            ang = np.sort(rng.uniform(0, 2 * np.pi, k))
            rad = float(rng.uniform(1.0, 6.0))
            ring = np.round(np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1), 2)
            wkb = encode_polygon([ring])
            rings = [ring]
        elif kind == 2:  # concave "C"
            s = round(float(rng.uniform(1.0, 5.0)), 2)
            t = round(s / 3.0, 2)
            ring = np.array(
                [
                    [cx, cy], [cx + s, cy], [cx + s, cy + t], [cx + t, cy + t],
                    [cx + t, cy + s - t], [cx + s, cy + s - t], [cx + s, cy + s], [cx, cy + s],
                ]
            )
            wkb = encode_polygon([ring])
            rings = [ring]
        elif kind == 3:  # box with a hole
            s = round(float(rng.uniform(2.0, 6.0)), 2)
            outer = np.array([[cx, cy], [cx + s, cy], [cx + s, cy + s], [cx, cy + s]])
            q = round(s / 4.0, 2)
            inner = np.array(
                [[cx + q, cy + q], [cx + s - q, cy + q], [cx + s - q, cy + s - q], [cx + q, cy + s - q]]
            )
            wkb = encode_polygon([outer, inner])
            rings = [outer, inner]
        else:  # multipolygon: two disjoint boxes
            s = round(float(rng.uniform(0.5, 3.0)), 2)
            b1 = np.array([[cx, cy], [cx + s, cy], [cx + s, cy + s], [cx, cy + s]])
            off = round(s + 1.0, 2)
            b2 = b1 + np.array([off, off])
            wkb = encode_multipolygon([[b1], [b2]])
            rings = [b1, b2]
        rows.append(
            {
                "poly_id": f"poly-{j:06d}",
                "wkb": wkb,
                "category": "abc"[j % 3],
                "area_deg2": polygon_area(rings) if kind != 4 else polygon_area([rings[0]]) + polygon_area([rings[1]]),
            }
        )
    return pa.table(
        {
            "poly_id": pa.array([r["poly_id"] for r in rows], pa.string()),
            "wkb": pa.array([r["wkb"] for r in rows], pa.binary()),
            "category": pa.array([r["category"] for r in rows], pa.string()),
            "area_deg2": pa.array([r["area_deg2"] for r in rows], pa.float64()),
        }
    )


def polygon_edges_sql_values(polys: pa.Table) -> str:
    """Render every ring edge of every polygon as SQL VALUES rows
    ``(poly_id, x1, y1, x2, y2)`` so a DuckDB oracle can evaluate the exact
    even-odd crossing test our engine uses (geometry/predicates.py).

    Horizontal edges are kept (the crossing test skips them via the
    ``(y1>py) != (y2>py)`` guard, identically in SQL and numpy).
    """
    from gdal_ray.geometry.wkb import polygon_rings

    parts = []
    pids = polys.column("poly_id").to_pylist()
    wkbs = polys.column("wkb").to_pylist()
    for pid, wkb in zip(pids, wkbs):
        for ring in polygon_rings(wkb):
            r = np.asarray(ring, dtype=np.float64)
            if not (r[0] == r[-1]).all():
                r = np.vstack([r, r[:1]])
            for (x1, y1), (x2, y2) in zip(r[:-1], r[1:]):
                parts.append(f"('{pid}',{x1!r},{y1!r},{x2!r},{y2!r})")
    return ",".join(parts)
