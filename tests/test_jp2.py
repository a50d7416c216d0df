"""JPEG 2000 EBCOT decoder vs the GDAL autotest fixtures' published
expectations (autotest/gdrivers/jp2openjpeg.py) — reversible files are
pinned bit-exact by GDALChecksumImage; irreversible (9/7) files use the
autotest's own max-diff tolerances."""

import numpy as np
import pytest

from gdal_ray.codecs.j2k import decode_j2k, decode_jp2_bytes
from gdal_ray.stages.stats import checksum_plane

B = "/root/reference/autotest/gdrivers/data/jpeg2000/"
GCORE = "/root/reference/autotest/gcore/data/"


def _decode(name):
    with open(B + name, "rb") as f:
        return decode_jp2_bytes(f.read())


def _cs(a):
    if a.ndim == 2:
        return checksum_plane(a)
    return [checksum_plane(a[:, :, i]) for i in range(a.shape[2])]


def _tif(path):
    from gdal_ray.codecs.tiff import decode_tiff

    with open(path, "rb") as f:
        r = decode_tiff(f.read())
    return np.squeeze(r[0] if isinstance(r, tuple) else r)


# ---- reversible (5/3) files: bit-exact published checksums ----------------

def test_byte_lossless_golden_matches_byte_tif():
    # jp2openjpeg.py:3935 — golden lossless copy of gcore byte.tif
    a = _decode("byte_lossless_openjp2_golden.jp2")
    assert _cs(a) == 4672
    assert np.array_equal(a, _tif(GCORE + "byte.tif"))


def test_byte_jp2_pcrl_12layers():
    # jp2openjpeg.py:76 — GDALTest(..., "jpeg2000/byte.jp2", 1, 50054)
    assert _cs(_decode("byte.jp2")) == 50054


def test_byte_tile_larger_than_image():
    # jp2openjpeg.py:3059 — tile 2048x2048 > image 20x20, cs 4610
    assert _cs(_decode("byte_tile_2048.jp2")) == 4610


def test_13bit_and_1bit_rct_precincts_eph():
    # jp2openjpeg.py:233 — 3x13-bit + 1x1-bit, RCT, RPCL, 128px precincts
    assert _cs(_decode("3_13bit_and_1bit.jp2")) == [64570, 57277, 56048, 61292]


def test_int16_lossless_exact():
    a = _decode("int16_lossless.jp2")
    assert a.dtype == np.int16
    assert np.array_equal(a.astype(np.int32),
                          _tif(B + "../int16.tif").astype(np.int32))


def test_poc_marker():
    with open(B + "byte_one_poc.j2k", "rb") as f:
        a = decode_j2k(f.read())
    assert _cs(a) == 4672


def test_multi_tile_16px():
    # jp2openjpeg.py:3687 — 256x256 image in 16x16 tiles (256 tiles)
    a = _decode("tile_size_16.jp2")
    assert a.shape == (256, 256)
    assert _cs(a) == 43623


def test_1bit_alpha_promotion():
    # jp2openjpeg.py:295 — cdef-declared 1-bit opacity promoted to 0/255
    a = _decode("stefan_full_rgba_alpha_1bit.jp2")
    assert _cs(a)[3] == 8527
    raw = decode_jp2_bytes(open(B + "stefan_full_rgba_alpha_1bit.jp2",
                                "rb").read(), promote_1bit_alpha=False)
    assert set(np.unique(raw[:, :, 3])) <= {0, 1}


def test_truncated_codestream_raises():
    # jp2openjpeg.py:3759 — GDAL reports checksum -1 (error) for this file
    with pytest.raises(ValueError, match="truncated"):
        _decode("small_world_truncated.jp2")


# ---- irreversible (9/7) files: autotest tolerance -------------------------

def test_int16_97_lossy_within_autotest_tolerance():
    # jp2openjpeg.py:106 — maxdiff vs int16.tif must be <= 6
    a = _decode("int16.jp2").astype(np.int32)
    ref = _tif(B + "../int16.tif").astype(np.int32)
    assert np.abs(a - ref).max() <= 6


def test_stefan_rgba_97_ict():
    a = _decode("stefan_full_rgba.jp2")
    assert a.shape == (150, 162, 4)
    ref = _tif(GCORE + "stefan_full_rgba.tif")
    # fixture is a default-quality (lossy) encode of the tif: bound the
    # reconstruction error, not bit-exactness (mean |err| ~= 1 LSB)
    d = np.abs(a.astype(np.int32) - ref.astype(np.int32))
    assert d.max() <= 20 and d.mean() <= 2.0


# ---- distributed tile read ------------------------------------------------

def test_read_jp2_tiles_match_whole_decode(ray_session):
    from gdal_ray.sources.jp2 import read_jp2

    whole = _decode("tile_size_16.jp2")
    ds = read_jp2(B + "tile_size_16.jp2")
    out = np.zeros_like(whole)
    for r in ds.iter_rows():
        blk = np.frombuffer(r["data"], dtype=whole.dtype).reshape(
            r["h"], r["w"])
        out[r["row0"]:r["row0"] + r["h"], r["col0"]:r["col0"] + r["w"]] = blk
    assert np.array_equal(out, whole)


# ---- encoder (lossless) ---------------------------------------------------

def test_encoder_roundtrip_matrix():
    from gdal_ray.codecs.j2k import encode_j2k

    rng = np.random.default_rng(42)
    cases = [
        ((20, 20), np.uint8, {}),
        ((37, 23), np.uint8, {}),
        ((129, 65), np.uint16, {}),
        ((50, 60), np.int16, {}),
        ((40, 52, 3), np.uint8, {}),           # RCT
        ((40, 52, 3), np.uint8, {"mct": False}),
        ((33, 47, 4), np.uint8, {}),
        ((130, 140), np.uint8, {"tile_size": 64}),
        ((20, 20), np.uint8, {"levels": 0}),
        ((1, 1), np.uint8, {}),
        ((4, 200), np.uint8, {}),
    ]
    for shape, dtype, kw in cases:
        if np.issubdtype(dtype, np.signedinteger):
            a = rng.integers(-2 ** 12, 2 ** 12, size=shape).astype(dtype)
        elif dtype == np.uint16:
            a = rng.integers(0, 2 ** 16, size=shape).astype(dtype)
        else:
            a = rng.integers(0, 256, size=shape).astype(dtype)
        b = decode_j2k(encode_j2k(a, **kw))
        assert np.array_equal(np.squeeze(b.astype(np.int64)),
                              np.squeeze(a.astype(np.int64))), (shape, kw)


def test_encoder_compresses_smooth_content():
    from gdal_ray.codecs.j2k import encode_j2k

    x, y = np.meshgrid(np.arange(256), np.arange(256))
    smooth = ((np.sin(x / 17) + np.cos(y / 23)) * 60 + 128).astype(np.uint8)
    cs = encode_j2k(smooth)
    assert np.array_equal(decode_j2k(cs), smooth)
    assert len(cs) < smooth.nbytes // 4


def test_mq_coder_fuzz_roundtrip():
    from gdal_ray.codecs.j2k import _MQDecoder, _MQEncoder

    rng = np.random.default_rng(0)
    for _ in range(25):
        n = int(rng.integers(1, 3000))
        bits = rng.integers(0, 2, size=n).tolist()
        ctxs = rng.integers(0, 19, size=n).tolist()
        e = _MQEncoder()
        for b, c in zip(bits, ctxs):
            e.encode(b, c)
        d = _MQDecoder(e.flush())
        assert [d.decode(c) for c in ctxs] == bits


def test_write_jp2_parallel_byte_identical(ray_session, tmp_path):
    from gdal_ray.sources.jp2 import (decode_jp2 as dec, write_jp2,
                                      write_jp2_parallel)

    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(300, 260, 3)).astype(np.uint8)
    p1 = write_jp2(str(tmp_path / "s.jp2"), a, tile_size=128)
    p2 = write_jp2_parallel(str(tmp_path / "p.jp2"), a, tile_size=128)
    assert open(p1, "rb").read() == open(p2, "rb").read()
    assert np.array_equal(dec(p2), a)


def test_geojp2_georeferencing():
    """GeoJP2 uuid box -> geotransform/EPSG (jp2openjpeg.py:76 expects
    gt (440720,60,0,3751320,0,-60) and NAD27 UTM 11N for byte.jp2);
    writer emits a degenerate GeoTIFF uuid box read back identically."""
    from gdal_ray.codecs.j2k import encode_jp2
    from gdal_ray.sources.jp2 import jp2_info

    i = jp2_info(B + "byte.jp2")
    assert i["geotransform"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert i["epsg"] == 26711

    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, size=(25, 30)).astype(np.uint8)
    gt = (100.0, 0.5, 0.0, 200.0, 0.0, -0.5)
    data = encode_jp2(a, geotransform=gt, epsg=32611)
    import tempfile, os
    p = os.path.join(tempfile.mkdtemp(), "t.jp2")
    with open(p, "wb") as f:
        f.write(data)
    i2 = jp2_info(p)
    assert i2["geotransform"] == gt and i2["epsg"] == 32611
    assert np.array_equal(decode_jp2_bytes(data), a)


def test_gmljp2_georeferencing_and_precedence():
    """GMLJP2 RectifiedGrid -> geotransform (jp2metadata.py:202,243):
    lat/lon axis swap for urn EPSG:4326 (both offsetVector orders), the
    easting/northing 3035 form, NUL-embedded XML, and GeoJP2-over-GMLJP2
    precedence on the 'inconsistent' fixture (jp2openjpeg.py:3344)."""
    from gdal_ray.sources.jp2 import jp2_info

    cases = [
        ("gmljp2_dtedsm_epsg_4326_axes.jp2",
         (42.999583333333369, 0.008271349862259, 0,
          34.000416666666631, 0, -0.008271349862259), 4326, "GMLJP2"),
        ("gmljp2_dtedsm_epsg_4326_axes_alt_offsetVector.jp2",
         (42.999583333333369, 0.008271349862259, 0,
          34.000416666666631, 0, -0.008271349862259), 4326, "GMLJP2"),
        ("gmljp2_epsg3035_easting_northing.jp2",
         (4895766.0, 2.0, 0.0, 2296946.0, 0.0, -2.0), 3035, "GMLJP2"),
        ("byte_gmljp2_with_nul_car.jp2",
         (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0), 26711, "GMLJP2"),
        ("inconsitant_geojp2_gmljp2.jp2",
         (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0), 26711, "GeoJP2"),
    ]
    for f, egt, eepsg, esrc in cases:
        i = jp2_info(B + f)
        assert i["epsg"] == eepsg, f
        assert i["georef_source"] == esrc, f
        assert all(abs(a - b) < 1e-7 for a, b in
                   zip(i["geotransform"], egt)), f


def test_decode_jp2_parallel_matches_serial(ray_session):
    """Ray code-block-parallel tier-1 (the single-tile giant-image path)
    must be bit-identical to serial decode."""
    from gdal_ray.sources.jp2 import decode_jp2, decode_jp2_parallel

    for f in ["erdas_foo.jp2", "tile_size_16.jp2"]:
        a = decode_jp2(B + f)
        b = decode_jp2_parallel(B + f, batch_cblocks=8)
        assert np.array_equal(a, b), f


def test_cbstyle_roundtrip_all_modes():
    """Code-block styles (COD Table A-19): selective bypass (raw SPP/MRP
    from pass 10), context reset, termall (per-pass segments), vertically
    causal contexts, segmentation symbols — every combination must
    round-trip exactly (encoder and decoder share the segmentation rule
    _pass_spans and the VSC/RESET state machines)."""
    from gdal_ray.codecs.j2k import encode_j2k

    rng = np.random.default_rng(7)
    arrs = [rng.integers(0, 256, size=(70, 90)).astype(np.uint8),
            rng.integers(0, 2 ** 14, size=(50, 60)).astype(np.uint16),
            rng.integers(0, 256, size=(40, 52, 3)).astype(np.uint8)]
    for arr in arrs:
        for style in [0x01, 0x02, 0x04, 0x08, 0x20, 0x05, 0x0D, 0x3F]:
            b = decode_j2k(encode_j2k(arr, cbstyle=style))
            assert np.array_equal(np.squeeze(b).astype(np.int64),
                                  np.squeeze(arr).astype(np.int64)), \
                (arr.shape, hex(style))
