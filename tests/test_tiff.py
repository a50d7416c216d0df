"""GeoTIFF codec conformance (codecs/tiff.py vs TIFF 6.0 / GeoTIFF 1.1).

Reference behavior: frmts/gtiff/geotiff.cpp (driver), libtiff LZW/predictor
semantics (tif_lzw.c, tif_predict.c), gt_wkt_srs.cpp geokey parsing — all
reimplemented from the public specs, round-trip and hand-vector tested."""

import numpy as np
import pytest

from gdal_ray.codecs.tiff import (
    _lzw_decode, _lzw_encode, _packbits, _unpackbits,
    decode_tiff, encode_geotiff, read_geotiff,
)

RNG = np.random.default_rng(7)


DTYPES = [np.uint8, np.uint16, np.uint32, np.int8, np.int16, np.int32,
          np.float32, np.float64]


def _img(dt, h=37, w=23, c=1):
    if np.dtype(dt).kind == "f":
        a = RNG.normal(size=(h, w, c)).astype(dt)
    else:
        info = np.iinfo(dt)
        a = RNG.integers(info.min, info.max, size=(h, w, c), endpoint=True).astype(dt)
    return a[:, :, 0] if c == 1 else a


@pytest.mark.parametrize("dt", DTYPES)
def test_roundtrip_dtypes_deflate(dt):
    a = _img(dt)
    out = decode_tiff(encode_geotiff(a, compression="deflate"))
    assert out.dtype == a.dtype and np.array_equal(out, a)


@pytest.mark.parametrize("comp", ["none", "deflate", "lzw", "packbits"])
def test_roundtrip_compressions_rgb(comp):
    a = _img(np.uint8, 50, 41, 3)
    out = decode_tiff(encode_geotiff(a, compression=comp))
    assert np.array_equal(out, a)


@pytest.mark.parametrize("comp", ["deflate", "lzw"])
def test_roundtrip_predictor(comp):
    # smooth ramp — the case predictor 2 exists for
    x = (np.arange(64)[None, :] + np.arange(48)[:, None]).astype(np.uint16)
    out = decode_tiff(encode_geotiff(x, compression=comp, predictor=True))
    assert np.array_equal(out, x)


def test_roundtrip_tiled():
    a = _img(np.uint8, 70, 90, 4)
    data = encode_geotiff(a, compression="deflate", tile_size=32)
    out = decode_tiff(data)
    assert np.array_equal(out, a)


def test_roundtrip_multi_strip():
    a = _img(np.int16, 100, 30)
    out = decode_tiff(encode_geotiff(a, compression="lzw", rows_per_strip=7))
    assert np.array_equal(out, a)


def test_roundtrip_bigtiff():
    a = _img(np.float32, 33, 44, 2)
    data = encode_geotiff(a, big=True, compression="deflate")
    assert data[2:4] == b"+\x00"  # magic 43
    out = decode_tiff(data)
    assert np.array_equal(out, a)


def test_geotags_roundtrip():
    a = _img(np.uint8, 16, 16)
    gt = (100.0, 0.5, 0.0, 200.0, 0.0, -0.25)
    data = encode_geotiff(a, geotransform=gt, epsg=32633, nodata=7.0,
                          metadata="<GDALMetadata/>")
    arr, info = read_geotiff(data)
    assert np.array_equal(arr, a)
    assert info["geotransform"] == pytest.approx(gt)
    assert info["epsg"] == 32633 and info["model_type"] == "projected"
    assert info["nodata"] == 7.0
    assert info["metadata"] == "<GDALMetadata/>"


def test_geographic_geokey():
    a = _img(np.uint8, 4, 4)
    _, info = read_geotiff(encode_geotiff(a, epsg=4326))
    assert info["epsg"] == 4326 and info["model_type"] == "geographic"


def test_rotated_geotransform_uses_matrix():
    a = _img(np.uint8, 8, 8)
    gt = (10.0, 1.0, 0.25, 20.0, -0.5, -2.0)
    _, info = read_geotiff(encode_geotiff(a, geotransform=gt))
    assert info["geotransform"] == pytest.approx(gt)


def test_big_endian_decode():
    """Hand-build a minimal big-endian (MM) striped file and decode it."""
    import struct

    a = np.arange(12, dtype=">u2").reshape(3, 4)
    px = a.tobytes()
    # header + 8 IFD entries + next-ptr, then pixel data
    n = 8
    ifd_off = 8
    data_off = ifd_off + 2 + n * 12 + 4

    def ent(tag, ftype, count, val):
        return struct.pack(">HHI", tag, ftype, count) + struct.pack(">I", val)

    ifd = struct.pack(">H", n)
    ifd += ent(256, 3, 1, 4 << 16)   # width (SHORT packed left-justified)
    ifd += ent(257, 3, 1, 3 << 16)
    ifd += ent(258, 3, 1, 16 << 16)
    ifd += ent(259, 3, 1, 1 << 16)
    ifd += ent(262, 3, 1, 1 << 16)
    ifd += ent(273, 4, 1, data_off)
    ifd += ent(278, 4, 1, 3)
    ifd += ent(279, 4, 1, len(px))
    ifd += struct.pack(">I", 0)
    blob = b"MM" + struct.pack(">HI", 42, ifd_off) + ifd + px
    out = decode_tiff(blob)
    assert out.dtype == np.uint16
    assert np.array_equal(out, a.astype(np.uint16))


def test_lzw_hand_vector():
    """The worked example from the TIFF 6.0 spec's LZW section
    (7 bytes: 7 7 7 8 8 7 7 6) compresses and re-expands exactly."""
    src = bytes([7, 7, 7, 8, 8, 7, 7, 6])
    assert _lzw_decode(_lzw_encode(src), len(src)) == src


def test_lzw_width_transition():
    """Cross the 9->10 and 10->11 bit boundaries: incompressible bytes
    force one table add per ~byte, so 3000 random bytes pass both."""
    src = RNG.integers(0, 256, size=3000).astype(np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(src), len(src)) == src


def test_lzw_table_clear():
    """>4094 table adds forces a mid-stream CLEAR."""
    src = RNG.integers(0, 256, size=9000).astype(np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(src), len(src)) == src


def test_packbits_vectors():
    """Decode the packed example from the TIFF 6.0 PackBits section, and
    round-trip our own encoder over the same plaintext."""
    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    plain = (b"\xaa" * 3 + b"\x80\x00\x2a" + b"\xaa" * 4
             + b"\x80\x00\x2a\x22" + b"\xaa" * 10)
    assert _unpackbits(packed, len(plain)) == plain
    assert _unpackbits(_packbits(plain), len(plain)) == plain


def test_decode_dispatch():
    from gdal_ray.codecs import decode

    a = _img(np.uint8, 9, 9, 3)
    assert np.array_equal(decode(encode_geotiff(a), "tiff"), a)


# --------------------------------------------------------------------- COG


def _cog_src(h=600, w=900):
    rng = np.random.default_rng(7)
    return rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)


def test_cog_levels_and_roundtrip():
    from gdal_ray.codecs.tiff import encode_cog, read_cog

    arr = _cog_src()
    data = encode_cog(arr, tile_size=256,
                      geotransform=(10.0, 0.5, 0, 60.0, 0, -0.5), epsg=4326)
    levels = read_cog(data)
    # 900x600 -> 450x300 -> 225x150 fits one 256 tile: 3 levels
    assert len(levels) == 3
    a0, info0 = levels[0]
    assert np.array_equal(a0, arr)
    assert info0["geotransform"] == (10.0, 0.5, 0, 60.0, 0, -0.5)
    assert info0["epsg"] == 4326
    a1, _ = levels[1]
    assert a1.shape == (300, 450, 3)
    # overview equals the documented 2x average reduction
    from gdal_ray.codecs.tiff import _2x_reduce
    assert np.array_equal(a1, _2x_reduce(arr, "average"))
    a2, _ = levels[2]
    assert np.array_equal(a2, _2x_reduce(a1, "average"))


def test_cog_layout_rules():
    """COG structural invariants: IFD chain entirely before tile data,
    and data ordered smallest-overview-first / full-res LAST."""
    import struct as _s

    from gdal_ray.codecs.tiff import _Reader, _ifd_chain, encode_cog

    arr = _cog_src()
    data = encode_cog(arr, tile_size=256)
    r = _Reader(data)
    offs = _ifd_chain(r)
    assert len(offs) == 3
    all_tile_offs = []
    per_level = []
    for off in offs:
        t = r.ifd_tags(off)
        per_level.append(t[324])  # TileOffsets
        all_tile_offs += t[324]
    first_data = min(all_tile_offs)
    # every IFD (incl. its overflow values) sits before any tile data
    assert max(offs) < first_data
    # smallest level's tiles come first, level 0's last
    assert max(per_level[2]) < min(per_level[1]) < min(per_level[0])


def test_cog_nearest_resampler_and_single_level():
    from gdal_ray.codecs.tiff import encode_cog, read_cog

    arr = np.arange(64 * 48, dtype=np.uint8).reshape(48, 64)
    data = encode_cog(arr, tile_size=64, resampler="nearest")
    levels = read_cog(data)
    assert len(levels) == 1  # already fits one tile
    assert np.array_equal(levels[0][0].squeeze(), arr)


def test_cog_plain_reader_sees_full_res():
    """A single-IFD reader must decode a COG as the full-res image."""
    from gdal_ray.codecs.tiff import encode_cog, read_geotiff

    arr = _cog_src(300, 500)
    data = encode_cog(arr, tile_size=256)
    a, _ = read_geotiff(data)
    assert np.array_equal(a, arr)


# ------------------------------------------------ JPEG-in-TIFF (comp 7)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _smooth_rgb(h, w):
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 128 + 100 * np.sin(x / 17) * np.cos(y / 13)
    g = 128 + 90 * np.cos(x / 23)
    b = 128 + 80 * np.sin((x + y) / 29)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def test_jpeg_in_tiff_tiled_rgb():
    # TechNote 2 layout: abbreviated per-tile streams + shared JPEGTables,
    # photometric 6 (YCbCr) — the layout libtiff writes for compression 7.
    a = _smooth_rgb(70, 90)
    data = encode_geotiff(a, compression="jpeg", tile_size=32)
    out = decode_tiff(data)
    assert out.shape == a.shape and out.dtype == np.uint8
    assert _psnr(a, out) > 35

    # shared tables really are split out: per-tile streams hold no DQT/DHT
    from gdal_ray.codecs.tiff import T_JPEG_TABLES, _Reader
    r = _Reader(data)
    tags = r.ifd_tags(r.first_ifd)
    assert T_JPEG_TABLES in tags
    offs, cnts = tags[322 + 2], tags[322 + 3]  # tile offsets/counts
    for o, c in zip(offs, cnts):
        chunk = bytes(data[int(o):int(o) + int(c)])
        assert b"\xFF\xDB" not in chunk[:200]  # no DQT in the tile stream


def test_jpeg_in_tiff_striped_gray():
    a = _smooth_rgb(61, 40)[:, :, 0]
    out = decode_tiff(encode_geotiff(a, compression="jpeg", rows_per_strip=16))
    assert out.shape == a.shape
    assert _psnr(a, out) > 35


def test_jpeg_in_tiff_rejects_bad_dtype():
    with pytest.raises(NotImplementedError):
        encode_geotiff(_img(np.uint16, 8, 8), compression="jpeg")


# -------------------------------------------------- float predictor (3)


def _fp_diff_reference(block, cpp):
    """Pure-python TIFF TechNote 3 fpDiff (libtiff tif_predict.c
    pseudocode): big-endian byte-plane split per row, then byte-wise
    horizontal differencing with stride = samples-per-pixel."""
    import struct

    th, tw = block.shape[0], block.shape[1]
    B = block.dtype.itemsize
    n = tw * cpp
    fmt = ">f" if B == 4 else ">d"
    out = bytearray()
    for y in range(th):
        rowvals = block[y].reshape(n)
        # struct.pack, NOT numpy scalar .astype().tobytes() — numpy
        # scalars drop byte order and serialize native-endian
        bebytes = [struct.pack(fmt, float(rowvals[i])) for i in range(n)]
        planes = bytearray()
        for b in range(B):
            for i in range(n):
                planes.append(bebytes[i][b])
        row = bytearray(planes)
        for i in range(len(row) - 1, cpp - 1, -1):
            row[i] = (row[i] - row[i - cpp]) & 0xFF
        out += row
    return bytes(out)


def test_float_predictor_wire_format():
    import zlib

    from gdal_ray.codecs.tiff import (_Reader, T_PREDICTOR, T_STRIP_COUNTS,
                                      T_STRIP_OFFSETS, encode_geotiff,
                                      read_geotiff)

    rng = np.random.default_rng(8)
    for dt, spp in ((np.float32, 1), (np.float32, 3), (np.float64, 1)):
        shape = (5, 7) if spp == 1 else (5, 7, 3)
        a = (rng.normal(size=shape) * 100).astype(dt)
        blob = encode_geotiff(a, compression="deflate", predictor=True,
                              rows_per_strip=5)
        r = _Reader(blob)
        tags = r.ifd_tags(r.first_ifd)
        assert int(tags[T_PREDICTOR][0]) == 3
        off = int(tags[T_STRIP_OFFSETS][0])
        cnt = int(tags[T_STRIP_COUNTS][0])
        raw = zlib.decompress(blob[off:off + cnt])
        block = a if a.ndim == 3 else a[:, :, None]
        assert raw == _fp_diff_reference(block, spp)
        out, _ = read_geotiff(blob)
        np.testing.assert_array_equal(out, a)


def test_float_predictor_roundtrip_tiled():
    from gdal_ray.codecs.tiff import encode_geotiff, read_geotiff

    rng = np.random.default_rng(4)
    a = np.cumsum(rng.normal(size=(50, 41)), axis=1).astype(np.float32)
    for comp in ("deflate", "lzw", "packbits", "none"):
        blob = encode_geotiff(a, compression=comp, predictor=True,
                              tile_size=16)
        out, _ = read_geotiff(blob)
        np.testing.assert_array_equal(out, a)
    # smooth float data compresses better under the predictor
    b1 = len(encode_geotiff(a, compression="deflate"))
    b2 = len(encode_geotiff(a, compression="deflate", predictor=True))
    assert b2 < b1


def test_lerc_in_tiff_roundtrip():
    """LERC (compression 34887, GDAL gtiff extension backed by libLerc)
    round-trips losslessly for integer and float data in strips and
    tiles, multi-band included."""
    import pytest
    from gdal_ray.compress import HAVE_LERC
    if not HAVE_LERC:
        pytest.skip("libLerc not available")
    from gdal_ray.codecs.tiff import encode_geotiff, read_geotiff

    rng = np.random.default_rng(11)
    cases = [
        (rng.random((61, 83)) * 5000).astype(np.int16),
        rng.random((61, 83)).astype(np.float32),
        (rng.random((40, 55, 3)) * 255).astype(np.uint8),
    ]
    for a in cases:
        for ts in (None, 32):
            blob = encode_geotiff(a, compression="lerc", tile_size=ts,
                                  geotransform=(1.0, 0.25, 0, 9.0, 0, -0.25),
                                  epsg=32633)
            out, info = read_geotiff(blob)
            np.testing.assert_array_equal(out.squeeze(), a.squeeze())
            assert info["epsg"] == 32633


def test_lerc_in_tiff_lossy_bound():
    import pytest
    from gdal_ray.compress import HAVE_LERC
    if not HAVE_LERC:
        pytest.skip("libLerc not available")
    from gdal_ray.codecs.tiff import encode_geotiff, read_geotiff

    rng = np.random.default_rng(12)
    a = np.cumsum(rng.normal(size=(96, 96)), axis=1).astype(np.float64)
    tol = 1e-3
    blob = encode_geotiff(a, compression="lerc", tile_size=32,
                          lerc_max_z_err=tol)
    out, _ = read_geotiff(blob)
    assert float(np.abs(out.squeeze() - a).max()) <= tol
    # the lossy blob must actually be smaller than the lossless one
    assert len(blob) < len(encode_geotiff(a, compression="lerc",
                                          tile_size=32))


def test_lerc_predictor_rejected():
    import pytest
    from gdal_ray.compress import HAVE_LERC
    if not HAVE_LERC:
        pytest.skip("libLerc not available")
    from gdal_ray.codecs.tiff import encode_geotiff

    a = np.zeros((8, 8), dtype=np.int32)
    with pytest.raises(ValueError):
        encode_geotiff(a, compression="lerc", predictor=True)


def test_cog_zstd_and_lerc_tiles():
    """encode_cog must compress tiles with the codec the IFD declares
    (zstd previously fell through to PackBits under a ZSTD tag)."""
    import pytest
    from gdal_ray.compress import HAVE_ZSTD, HAVE_LERC
    from gdal_ray.codecs.tiff import encode_cog, read_cog

    a = (np.arange(300 * 300, dtype=np.uint16) % 997).reshape(300, 300)
    for comp, have in (("zstd", HAVE_ZSTD), ("lerc", HAVE_LERC)):
        if not have:
            pytest.skip(f"{comp} library not available")
        levels = read_cog(encode_cog(a, compression=comp))
        assert len(levels) >= 2
        np.testing.assert_array_equal(levels[0][0].squeeze(), a)


def test_palette_colormap_roundtrip():
    """Photometric 3 + ColorMap (TIFF 6.0 §ColorMap, 3·2^bits SHORTs in
    R..G..B plane order): index band and palette both survive, and
    expand_palette (pct2rgb) reconstructs the RGB."""
    from gdal_ray.codecs.tiff import encode_geotiff, read_geotiff
    from gdal_ray.stages.color import expand_palette

    rng = np.random.default_rng(5)
    idx = rng.integers(0, 16, size=(45, 67)).astype(np.uint8)
    pal8 = (rng.random((16, 3)) * 255).astype(np.uint8)
    # TIFF stores 16-bit palette entries; GDAL's convention scales 8-bit
    # component c to c*257 (0xFF -> 0xFFFF)
    blob = encode_geotiff(idx, palette=pal8.astype(np.uint16) * 257,
                          compression="lzw",
                          geotransform=(0, 30, 0, 0, 0, -30), epsg=32633)
    out, info = read_geotiff(blob)
    np.testing.assert_array_equal(out, idx)
    assert info["palette"].shape == (256, 3)
    np.testing.assert_array_equal(info["palette"][:16] // 257, pal8)
    rgb = expand_palette(out, (info["palette"] // 257).astype(np.uint8))
    np.testing.assert_array_equal(rgb, pal8[idx])


def test_palette_rejects_multiband():
    import pytest
    from gdal_ray.codecs.tiff import encode_geotiff

    with pytest.raises(ValueError):
        encode_geotiff(np.zeros((8, 8, 3), dtype=np.uint8),
                       palette=np.zeros((4, 3), dtype=np.uint16))
