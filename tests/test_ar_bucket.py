"""Aspect-ratio bucketing (imageops.ar_bucket_batch): exact-rational
nearest-AR choice vs a Fraction brute force, tie rule, known mappings."""

from fractions import Fraction

import numpy as np
import pyarrow as pa

from gdal_ray.stages.imageops import SDXL_BUCKETS, ar_bucket_batch


def _brute(w, h, buckets):
    ar = Fraction(w, h)
    best, best_d = 0, None
    for j, (bw, bh) in enumerate(buckets):
        d = abs(ar - Fraction(bw, bh))
        if best_d is None or d < best_d:
            best, best_d = j, d
    return best


def test_matches_fraction_brute_force():
    rng = np.random.RandomState(11)
    w = rng.randint(64, 2049, 500).astype(np.int64)
    h = rng.randint(64, 2049, 500).astype(np.int64)
    out = ar_bucket_batch(pa.table({"w": pa.array(w), "h": pa.array(h)}))
    got = out.column("bucket_id").to_numpy()
    want = [_brute(int(a), int(b), SDXL_BUCKETS) for a, b in zip(w, h)]
    assert got.tolist() == want


def test_known_mappings_and_px():
    cases = {(1000, 1000): (1024, 1024), (2000, 700): (1536, 640),
             (700, 2000): (640, 1536), (1300, 900): (1216, 832)}
    w = pa.array([c[0] for c in cases], pa.int64())
    h = pa.array([c[1] for c in cases], pa.int64())
    out = ar_bucket_batch(pa.table({"w": w, "h": h}))
    for i, ((ww, hh), (bw, bh)) in enumerate(cases.items()):
        assert (out.column("bucket_w")[i].as_py(),
                out.column("bucket_h")[i].as_py()) == (bw, bh)
        assert out.column("px")[i].as_py() == ww * hh


def test_tie_breaks_to_lowest_index():
    # square buckets listed twice → tie must pick the first
    buckets = ((512, 512), (256, 256), (100, 50))
    out = ar_bucket_batch(
        pa.table({"w": pa.array([300], pa.int64()),
                  "h": pa.array([300], pa.int64())}), buckets=buckets)
    assert out.column("bucket_id")[0].as_py() == 0


def test_resize_to_bucket_pixels():
    from gdal_ray.codecs import decode, encode_png
    from gdal_ray.stages.imageops import resize_to_bucket_batch
    from gdal_ray.stages.resample import resize

    buckets = ((64, 64), (80, 48), (48, 80))
    # wide 100x40 image → bucket (80,48); fit_w=80, fit_h=40*80//100=32
    y, x = np.mgrid[0:40, 0:100]
    img = ((y * 7 + x * 3) % 256).astype(np.uint8)
    b = pa.table({
        "image_id": pa.array(["a"], pa.string()),
        "bytes": pa.array([encode_png(img)], pa.binary()),
        "w": pa.array([100], pa.int64()),
        "h": pa.array([40], pa.int64()),
    })
    out = resize_to_bucket_batch(b, buckets=buckets)
    r = {n: out.column(n)[0].as_py() for n in out.schema.names}
    assert (r["bucket_id"], r["fit_w"], r["fit_h"]) == (1, 80, 32)
    assert (r["pad_x"], r["pad_y"]) == (0, 8)
    assert (r["out_w"], r["out_h"]) == (80, 48)
    dec = decode(r["bytes"], "png")
    assert dec.shape[:2] == (48, 80)
    # letterbox bands are the fill grey; content equals the box-average
    assert (dec[:8] == 114).all() and (dec[40:] == 114).all()
    want = resize(img, 80, 32, method="average")
    assert np.array_equal(dec[8:40], want)


def test_resize_to_bucket_upscale_path():
    from gdal_ray.codecs import decode, encode_png
    from gdal_ray.stages.imageops import resize_to_bucket_batch

    # tiny 10x10 → (64,64) bucket, bilinear upscale fills the canvas
    img = (np.arange(100).reshape(10, 10) % 256).astype(np.uint8)
    b = pa.table({
        "image_id": pa.array(["t"], pa.string()),
        "bytes": pa.array([encode_png(img)], pa.binary()),
        "w": pa.array([10], pa.int64()),
        "h": pa.array([10], pa.int64()),
    })
    out = resize_to_bucket_batch(b, buckets=((64, 64), (80, 48)))
    r = {n: out.column(n)[0].as_py() for n in out.schema.names}
    assert (r["fit_w"], r["fit_h"], r["pad_x"], r["pad_y"]) == (64, 64, 0, 0)
    assert decode(r["bytes"], "png").shape[:2] == (64, 64)
