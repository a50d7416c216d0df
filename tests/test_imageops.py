"""stages/imageops.py — patch grid exactness, augmentation involutions and
determinism, quality metrics vs naive references."""

import numpy as np
import pyarrow as pa

from gdal_ray.codecs import decode, encode_png
from gdal_ray.stages.imageops import (augment_images, extract_patches,
                                      image_quality)
from gdal_ray.synth import image_dims, pixels_for


def _batch(ids):
    rows = {"image_id": [], "bytes": []}
    for i in ids:
        w, h, _ = image_dims(i)
        rows["image_id"].append(f"img-{i:012d}")
        rows["bytes"].append(encode_png(pixels_for(i, w, h)))
    return pa.table({"image_id": pa.array(rows["image_id"]),
                     "bytes": pa.array(rows["bytes"], pa.binary())})


def test_patch_grid_counts_and_values():
    b = _batch([0, 1, 2, 3, 4])  # dims cycle 16/64/256x255/257x256/512
    out = extract_patches(b, patch=64, stride=64)
    df = out.to_pandas()
    counts = df.groupby("image_id").size().to_dict()
    assert counts == {
        "img-000000000001": 1,
        "img-000000000002": 4 * 3,
        "img-000000000003": 4 * 4,
        "img-000000000004": 8 * 8,
    }  # the 16x16 image yields no patches
    # mean_luma of one patch equals the naive slice mean
    w, h, _ = image_dims(4)
    img = pixels_for(4, w, h).astype(np.float64)
    luma = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    row = df[(df.image_id == "img-000000000004")
             & (df.px == 3) & (df.py == 5)].iloc[0]
    np.testing.assert_allclose(
        row.mean_luma, luma[5 * 64:6 * 64, 3 * 64:4 * 64].mean(), rtol=1e-12)


def test_patch_bytes_roundtrip():
    b = _batch([2])
    out = extract_patches(b, patch=64, stride=64, with_bytes=True)
    w, h, _ = image_dims(2)
    img = pixels_for(2, w, h)
    row = out.to_pandas().iloc[5]
    got = np.frombuffer(row.patch, dtype=np.uint8).reshape(64, 64, 3)
    np.testing.assert_array_equal(
        got, img[row.py * 64:row.py * 64 + 64, row.px * 64:row.px * 64 + 64])


def test_augment_deterministic_and_correct():
    b = _batch([1, 2, 3, 10, 11, 12])
    out1 = augment_images(b).to_pandas()
    out2 = augment_images(b).to_pandas()
    assert (out1["op"] == out2["op"]).all()
    assert all(b1 == b2 for b1, b2 in zip(out1["bytes"], out2["bytes"]))
    for _, row in out1.iterrows():
        i = int(row.image_id.split("-")[1])
        w, h, _ = image_dims(i)
        img = pixels_for(i, w, h)
        aug = decode(row.bytes)
        assert (row.w, row.h) == (
            (h, w) if row.op in ("rot90", "rot270") else (w, h))
        if row.op == "fliph":
            np.testing.assert_array_equal(aug, img[:, ::-1])
        elif row.op == "rot180":
            np.testing.assert_array_equal(aug, np.rot90(img, 2))
        elif row.op == "identity":
            np.testing.assert_array_equal(aug, img)


def test_augment_ops_cover_and_seed_changes():
    b = _batch(list(range(1, 40)))
    ops1 = set(augment_images(b).to_pandas()["op"])
    assert len(ops1) >= 4  # hash spreads over the op set
    ops_seed = augment_images(b, seed=7).to_pandas()["op"]
    ops_base = augment_images(b).to_pandas()["op"]
    assert (ops_seed != ops_base).any()


def test_quality_metrics_vs_naive():
    b = _batch([2])
    out = image_quality(b).to_pandas().iloc[0]
    w, h, _ = image_dims(2)
    img = pixels_for(2, w, h).astype(np.float64)
    luma = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    np.testing.assert_allclose(out.brightness, luma.mean(), rtol=1e-12)
    np.testing.assert_allclose(out.contrast, luma.std(), rtol=1e-12)
    np.testing.assert_allclose(out.dyn_range, luma.max() - luma.min(),
                               rtol=1e-12)
    # naive Laplacian variance
    lap = np.zeros((h - 2, w - 2))
    for dy, dx, c in ((0, 1, 1), (2, 1, 1), (1, 0, 1), (1, 2, 1), (1, 1, -4)):
        lap += c * luma[dy:dy + h - 2, dx:dx + w - 2]
    np.testing.assert_allclose(out.sharpness, lap.var(), rtol=1e-10)
    # entropy: flat image -> 0 bits; noisy block raises it
    flat = pa.table({"image_id": pa.array(["f"]),
                     "bytes": pa.array(
                         [encode_png(np.full((32, 32, 3), 77, np.uint8))],
                         pa.binary())})
    assert image_quality(flat).to_pandas().iloc[0].entropy == 0.0
    assert out.entropy > 3.0
