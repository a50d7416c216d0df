"""TGA decoder pinned against the reference's own ref_test_suite
fixtures (autotest/gdrivers/tga.py published checksums + metadata)."""

import os

import pytest

REF = "/root/reference/autotest/gdrivers/data/tga"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tga fixtures absent")

# (relpath, decode kwargs, per-band expected GDALChecksumImage)
CASES = [
    ("ref_test_suite/cbw8.tga", {"expand_palette": False}, [43089]),
    ("ref_test_suite/ccm8.tga", {"expand_palette": False}, [38151]),
    ("ref_test_suite/ctc24.tga", {}, [9797, 9952, 9848]),
    ("ref_test_suite/ubw8.tga", {"expand_palette": False}, [43089]),
    ("ref_test_suite/ucm8.tga", {"expand_palette": False}, [38151]),
    ("ref_test_suite/utc16.tga", {}, [64747, 64839, 64796]),
    ("ref_test_suite/utc24.tga", {}, [9797, 9952, 9848]),
    ("stefan_full_rgba.tga", {}, [12603, 58561, 36064, 10807]),
    # RLE runs crossing scanlines (the spec-permitted ffmpeg shape)
    ("from_ffmpeg_samples/test1g.tga", {}, [13077]),
    ("from_ffmpeg_samples/TEST24rle.tga", {}, [39607, 6458, 44534]),
]


@pytest.mark.parametrize("fn,kw,want", CASES, ids=[c[0] for c in CASES])
def test_fixture_checksums(fn, kw, want):
    from gdal_ray.codecs.tga import decode_tga
    from gdal_ray.stages.stats import checksum_plane

    arr, _ = decode_tga(open(os.path.join(REF, fn), "rb").read(), **kw)
    got = ([checksum_plane(arr[:, :, b]) for b in range(arr.shape[2])]
           if arr.ndim == 3 else [checksum_plane(arr)])
    assert got == want


def test_metadata_and_palette():
    from gdal_ray.codecs.tga import decode_tga

    data = open(os.path.join(REF, "ref_test_suite/cbw8.tga"), "rb").read()
    _, meta = decode_tga(data)
    assert meta["author"] == "Ricky True"
    assert meta["comments"] == \
        "Sample 8 bit run length compressed black and white image"
    assert meta["image_id"] == "Truevision(R) Sample Image"

    data = open(os.path.join(REF, "ref_test_suite/ccm8.tga"), "rb").read()
    _, meta = decode_tga(data, expand_palette=False)
    pal = meta["palette"]
    assert pal.shape[0] == 256
    assert list(pal[0]) == [0, 0, 0, 255]
    assert list(pal[1]) == [8, 8, 8, 255]
    assert list(pal[64]) == [248, 0, 0, 255]


def test_dispatch_and_info():
    from gdal_ray.codecs import decode
    from gdal_ray.info import describe

    p = os.path.join(REF, "stefan_full_rgba.tga")
    arr = decode(open(p, "rb").read(), "tga")  # footer-signature sniff
    assert arr.shape == (150, 162, 4)
    out = describe(p)
    assert out["driver"] == "TGA" and out["size"] == [162, 150]
    assert out["bands"] == 4
