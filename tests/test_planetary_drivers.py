"""ERS / VICAR / ISIS3 drivers vs the GDAL autotest fixtures' published
checksums (ers.py, vicar.py, isis.py)."""

import numpy as np
import pytest

from gdal_ray.stages.stats import checksum_plane

ERS = "/root/reference/autotest/gdrivers/data/ers/"
VIC = "/root/reference/autotest/gdrivers/data/vicar/"
ISI = "/root/reference/autotest/gdrivers/data/isis3/"


# ------------------------------------------------------------------- ERS

def test_ers_published_checksums():
    # ers.py:29 srtm.ers -> 64074; ers.py:75 ers_dem.ers -> 56588
    from gdal_ray.sources.ers import ers_meta, read_ers_array

    a = read_ers_array(ERS + "srtm.ers")
    assert a.dtype == np.int16 and checksum_plane(a) == 64074
    m = ers_meta(ERS + "srtm.ers")
    assert abs(m["geotransform"][1] - 0.00833333) < 1e-9

    d = read_ers_array(ERS + "ers_dem.ers")
    assert d.dtype == np.float32 and checksum_plane(d) == 56588

    rgb = read_ers_array(ERS + "8s.ers")
    assert rgb.shape == (10, 10, 3) and rgb.dtype == np.int8


def test_ers_lowercase_header():
    # ers.py:114 band description from an all-lowercase header
    from gdal_ray.sources.ers import ers_meta

    m = ers_meta(ERS + "caseinsensitive.ers")
    assert m["band_names"] == ["RTP 1st Vertical Derivative"]
    assert m["nodata"] == -99999.0


def test_ers_roundtrip(tmp_path):
    from gdal_ray.sources.ers import read_ers_array, write_ers

    rng = np.random.default_rng(5)
    a = rng.integers(-30000, 30000, size=(13, 17, 2)).astype(np.int16)
    p = str(tmp_path / "t.ers")
    write_ers(p, a, geotransform=(100.0, 2.0, 0.0, 500.0, 0.0, -2.0))
    b = read_ers_array(p)
    assert np.array_equal(a, b)


# ----------------------------------------------------------------- VICAR

VICAR_CASES = [
    ("vicar_byte", np.uint8, 129),
    ("vicar_int16", np.int16, 129),
    ("vicar_bigendian_int16", np.int16, 129),
    ("vicar_int32", np.int32, 129),
    ("vicar_float32_bsq", np.float32, 123),
    ("vicar_float32_bil", np.float32, 123),
    ("vicar_float32_bip", np.float32, 123),
    ("vicar_bigendian_float32", np.float32, 129),
    ("vicar_float64", np.float64, 129),
    ("vicar_vax_float32", np.float32, 129),
    # BASIC / BASIC2 compression (vicar.py:393 list)
    ("vicar_byte_basic", np.uint8, 4672),
    ("vicar_byte_basic2", np.uint8, 4672),
    ("vicar_int16_basic2", np.int16, 4672),
    ("vicar_all_ones_basic2", np.uint8, 34464),
]


@pytest.mark.parametrize("name,dt,cs", VICAR_CASES,
                         ids=[c[0] for c in VICAR_CASES])
def test_vicar_published_checksums(name, dt, cs):
    from gdal_ray.sources.vicar import read_vicar_array

    a = read_vicar_array(VIC + name + ".vic")
    p = a if a.ndim == 2 else a[:, :, 0]
    assert p.dtype == dt
    assert checksum_plane(p) == cs


def test_vicar_cfloat_interleaved_checksum():
    # vicar.py read_datatypes list: cfloat32 -> 148 (GDAL checksums
    # complex bands over interleaved real/imag values)
    from gdal_ray.sources.vicar import read_vicar_array

    a = read_vicar_array(VIC + "vicar_cfloat32.vic")
    inter = np.empty((a.shape[0], a.shape[1] * 2), np.float32)
    inter[:, 0::2] = a.real
    inter[:, 1::2] = a.imag
    assert checksum_plane(inter) == 148


def test_vicar_binary_prefix_skipped():
    from gdal_ray.sources.vicar import read_vicar_array, vicar_meta

    m = vicar_meta(VIC + "vicar_binary_prefix.vic")
    assert m["nbb"] > 0
    read_vicar_array(VIC + "vicar_binary_prefix.vic")


def test_vicar_dataset_reader_matches_array(ray_session):
    from gdal_ray.sources.vicar import read_vicar, read_vicar_array

    for name in ["vicar_byte_basic2", "vicar_float32_bil"]:
        whole = read_vicar_array(VIC + name + ".vic")
        if whole.ndim == 2:
            whole = whole[:, :, None]
        out = np.zeros_like(whole)
        for r in read_vicar(VIC + name + ".vic").iter_rows():
            blk = np.frombuffer(r["data"], dtype=whole.dtype).reshape(
                r["n_rows"], whole.shape[1])
            out[r["row0"]:r["row0"] + r["n_rows"], :, r["band"]] = blk
        assert np.array_equal(out, whole), name


# ----------------------------------------------------------------- ISIS3

def test_isis3_published_checksums():
    # isis.py:53 detached .lbl -> 9978; isis.py:78 tiled unit test -> 42403
    from gdal_ray.sources.isis3 import isis3_meta, read_isis3_array

    a = read_isis3_array(ISI + "isis3_detached.lbl")
    assert a.dtype == np.uint8 and a.shape == (30, 317)
    assert checksum_plane(a) == 9978

    b = read_isis3_array(ISI + "isis3_unit_test.cub")
    assert b.dtype == np.int16 and b.shape == (50, 150)
    assert checksum_plane(b) == 42403
    m = isis3_meta(ISI + "isis3_unit_test.cub")
    assert m["format"] == "Tile" and m["tile_w"] == 128
    assert abs(m["base"] - 8190.1245134999) < 1e-6


def test_isis3_dataset_reader_matches_array(ray_session):
    from gdal_ray.sources.isis3 import read_isis3, read_isis3_array

    whole = read_isis3_array(ISI + "isis3_unit_test.cub")
    out = np.zeros_like(whole)
    for r in read_isis3(ISI + "isis3_unit_test.cub").iter_rows():
        blk = np.frombuffer(r["data"], dtype=whole.dtype).reshape(
            r["h"], r["w"])
        out[r["row0"]:r["row0"] + r["h"], :] = blk
    assert np.array_equal(out, whole)


def test_open_raster_dispatch(ray_session):
    from gdal_ray.sources import open_raster

    assert open_raster(ERS + "srtm.ers").count() > 0
    assert open_raster(VIC + "vicar_byte.vic").count() > 0
    assert open_raster(ISI + "isis3_detached.lbl").count() > 0


# ----------------------------------------------------------------- PDS4

def test_pds4_published_checksums():
    # pds4.py:167 — every cart schema variant of byte.tif reads 4672
    from gdal_ray.sources.pds4 import pds4_meta, read_pds4_array

    B = "/root/reference/autotest/gdrivers/data/pds4/"
    for f in ["byte_pds4_cart_1700.xml", "byte_pds4_cart_1b00.xml",
              "byte_pds4_cart_1d00_1933.xml", "byte_pds4_cart_1g00_1950.xml"]:
        a = read_pds4_array(B + f)
        assert a.shape == (20, 20) and checksum_plane(a) == 4672, f
    m = pds4_meta(B + "byte_pds4_cart_1700.xml")
    assert m["geotransform"] == (-59280.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    multi = pds4_meta(B + "byte_pds4_cart_1700_multi_sds.xml")
    assert multi["n_arrays"] == 3
    a2 = read_pds4_array(B + "byte_pds4_cart_1700_multi_sds.xml", index=1)
    assert a2.shape[0] > 0


# ------------------------------------------------------------- USGS DEM

USGSDEM_CASES = [
    ("022gdeme_truncated", 1583),
    ("114p01_0100_deme_truncated.dem", 53864),
    ("39079G6_truncated.dem", 61424),
    ("39109h1_truncated.dem", 39443),
    ("4619old_truncated.dem", 10659),
    ("usgsdem_with_extra_values_at_end_of_profile.dem", 56679),
    ("usgsdem_with_spaces_after_byte_864.dem", 61078),
    ("record_1025_ending_with_linefeed.dem", 14172),
]


@pytest.mark.parametrize("name,cs", USGSDEM_CASES,
                         ids=[c[0][:24] for c in USGSDEM_CASES])
def test_usgsdem_published_checksums(name, cs):
    from gdal_ray.sources.usgsdem import read_usgsdem_array

    B = "/root/reference/autotest/gdrivers/data/usgsdem/"
    assert checksum_plane(read_usgsdem_array(B + name)) == cs


def test_usgsdem_geographic_geotransform():
    # usgsdem.py:44 expected gt for 114p01 (NAD27 geographic)
    from gdal_ray.sources.usgsdem import usgsdem_meta

    m = usgsdem_meta("/root/reference/autotest/gdrivers/data/usgsdem/"
                     "114p01_0100_deme_truncated.dem")
    exp = (-136.25010416667, 0.000208333, 0.0, 59.25010416667, 0.0,
           -0.000208333)
    for a, b in zip(m["geotransform"], exp):
        assert abs(a - b) < 1e-9


# ----------------------------------------------------------------- GXF

def test_gxf_published_checksums():
    # gxf.py:29/:40 — uncompressed + GTYPE-3 base-90 compressed
    from gdal_ray.sources.gxf import read_gxf_array

    B = "/root/reference/autotest/gdrivers/data/gxf/"
    assert checksum_plane(read_gxf_array(B + "small.gxf")) == 90
    assert checksum_plane(read_gxf_array(B + "small2.gxf")) == 65042


# ------------------------------------------------ SAGA / LAN / ILWIS

def test_simplegrids_published_checksums():
    """saga.py:30 (108 incl. zipped), lan.py:26/:36 (10, incl. 4-bit
    nibble packing), ilwis.py:23 (2351)."""
    from gdal_ray.sources.simplegrids import (read_ilwis_array,
                                              read_lan_array,
                                              read_saga_array, saga_meta)

    D = "/root/reference/autotest/gdrivers/data/"
    assert checksum_plane(read_saga_array(D + "saga/4byteFloat.sdat")) == 108
    assert checksum_plane(
        read_saga_array(D + "saga/4byteFloat.sg-grd-z")) == 108
    m = saga_meta(D + "saga/4byteFloat.sdat")
    assert m["geotransform"] == (328.3, 10.0, 0.0, 650.5, 0.0, -10.0)
    assert checksum_plane(read_lan_array(D + "lan/fakelan.lan")) == 10
    assert checksum_plane(read_lan_array(D + "lan/fakelan4bit.lan")) == 10
    assert checksum_plane(
        read_ilwis_array(D + "ilwis/LanduseSmall.mpr")) == 2351


# ------------------------------------------------------------------- HFA

def test_hfa_float_img_cross_checksum():
    """hfa/float.img must decode to checksum 23529 (published in
    ilwis.py:68 via the ILWIS CreateCopy cross-test) and its pixel stats
    must match the file's own Esta_Statistics node (hfa.py:184 pins
    minimum 40.91858291626)."""
    from gdal_ray.sources.hfa import hfa_meta, read_hfa_array

    B = "/root/reference/autotest/gdrivers/data/hfa/"
    a = read_hfa_array(B + "float.img")
    assert a.dtype == np.float32 and a.shape == (201, 201)
    assert checksum_plane(a) == 23529
    m = hfa_meta(B + "float.img")
    assert abs(m["statistics"]["minimum"] - 40.91858291626) < 1e-4
    assert abs(m["statistics"]["maximum"] - 41.134323120117) < 1e-4
    valid = a[a != 0]
    assert abs(float(valid.min()) - m["statistics"]["minimum"]) < 1e-4
    assert abs(float(valid.max()) - m["statistics"]["maximum"]) < 1e-4


def test_hfa_compressed_histogram_bit_exact():
    """i8u_c_i.img (RLE 'ESRI GRID compression'): the decoded image's
    256-bin histogram must equal the file's published
    STATISTICS_HISTOBINVALUES exactly (hfa.py:744) — pixel-level
    verification of the decompressor on real data."""
    from gdal_ray.sources.hfa import read_hfa_array

    a = read_hfa_array("/root/reference/autotest/gdrivers/data/hfa/"
                       "i8u_c_i.img")
    exp = [12603, 1, 0, 0, 45, 1, 0, 0, 0, 0, 656, 177, 0, 0, 5026, 1062,
           0, 0, 2] + [0] * 13 + [75, 1, 0, 0, 207, 158, 0, 0, 8, 34, 0,
                                  0, 0, 0, 538, 57, 0, 10, 214, 20]
    got = np.bincount(a.ravel(), minlength=256)
    assert list(got[:len(exp)]) == exp
    assert int(got[255]) == 16517 and int(got[254]) == 16


def test_hfa_int_and_stats():
    from gdal_ray.sources.hfa import hfa_meta, read_hfa_array

    B = "/root/reference/autotest/gdrivers/data/hfa/"
    a = read_hfa_array(B + "int.img")
    assert a.dtype == np.int32
    m = hfa_meta(B + "int.img")
    # hfa.py:136 int stats test pins STATISTICS_MINIMUM 40918
    assert m["statistics"]["minimum"] == 40918.0
    assert m["geotransform"] == (135362.5, 100.0, 0.0, 7122712.5, 0.0,
                                 -100.0)


def test_hfa_mapinfo_georef():
    from gdal_ray.sources.hfa import hfa_meta

    m = hfa_meta("/root/reference/autotest/gdrivers/data/hfa/dem10.img")
    gt = m["geotransform"]
    assert abs(gt[1] - 3.0) < 1e-9 and abs(gt[5] + 3.0) < 1e-9
    assert m["projection_name"] == "UTM"


def test_hfa_1bit_and_plain():
    from gdal_ray.sources.hfa import read_hfa_array

    B = "/root/reference/autotest/gdrivers/data/hfa/"
    one = read_hfa_array(B + "small1bit.img")
    assert set(np.unique(one)) <= {0, 1} and one.shape == (300, 300)
    t = read_hfa_array(B + "87test.img")
    assert t.shape == (24, 32)


def test_hfa_dataset_reader_matches_array(ray_session):
    from gdal_ray.sources.hfa import read_hfa, read_hfa_array

    B = "/root/reference/autotest/gdrivers/data/hfa/"
    whole = read_hfa_array(B + "i8u_c_i.img")
    out = np.zeros_like(whole)
    for r in read_hfa(B + "i8u_c_i.img").iter_rows():
        blk = np.frombuffer(r["data"], dtype=whole.dtype).reshape(
            r["h"], r["w"])
        out[r["row0"]:r["row0"] + r["h"],
            r["col0"]:r["col0"] + r["w"]] = blk
    assert np.array_equal(out, whole)


def test_terragen_and_leveller_published_checksums():
    # terragen.py:27 -> 1128 (bottom-up i16 ALTW); leveller.py:23 -> 33441
    from gdal_ray.sources.simplegrids import (read_leveller_array,
                                              read_terragen_array,
                                              terragen_meta)

    a = read_terragen_array("/root/reference/autotest/gdrivers/data/"
                            "terragen/float32.ter")
    assert a.dtype == np.int16 and checksum_plane(a) == 1128
    m = terragen_meta("/root/reference/autotest/gdrivers/data/"
                      "terragen/float32.ter")
    assert m["width"] == 20 and m["height"] == 20

    b = read_leveller_array("/root/reference/autotest/gdrivers/data/"
                            "leveller/ter6test.ter")
    assert b.dtype == np.float32 and checksum_plane(b) == 33441


# ----------------------------------------------- DIMAP2 / Sentinel SAFE

def test_dimap2_published_checksums():
    """dimap.py:77 — single_component opens from dir / VOL / DIM with
    4 bands 20x30; dimap.py:186 — bundle band 1 checksum 7024 with 2
    subdatasets (component TIFF tiles mosaicked by tile_R/tile_C)."""
    from gdal_ray.sources.products import dimap_meta, read_dimap_array

    D = "/root/reference/autotest/gdrivers/data/dimap2/"
    for p in [D + "single_component", D + "single_component/VOL_PHR.XML",
              D + "single_component/DIM_foo.XML"]:
        a = read_dimap_array(p)
        assert a.shape == (30, 20, 4), p
    m = dimap_meta(D + "bundle")
    assert m["n_subdatasets"] == 2
    a = read_dimap_array(D + "bundle")
    assert checksum_plane(a[:, :, 0]) == 7024


def test_safe_published_checksums():
    """safe.py:29/:41 — manifest.safe band 1 (VH) 65372, band 2 (VV)
    3732 from the measurement GeoTIFFs in manifest order."""
    from gdal_ray.sources.products import read_safe_array, safe_meta

    p = ("/root/reference/autotest/gdrivers/data/SAFE_FAKE/test.SAFE/"
         "manifest.safe")
    m = safe_meta(p)
    assert m["polarisations"] == ["VH", "VV"]
    a = read_safe_array(p)
    assert checksum_plane(a[:, :, 0]) == 65372
    assert checksum_plane(a[:, :, 1]) == 3732


def test_surfer_and_byn_published_checksums():
    # gsg.py:23/:29 both Surfer variants -> 4672; byn.py:29 -> 64764
    from gdal_ray.sources.simplegrids import (byn_meta, read_byn_array,
                                              read_surfer_array)

    D = "/root/reference/autotest/gdrivers/data/"
    assert checksum_plane(read_surfer_array(D + "gsg/gsg_binary.grd")) == 4672
    assert checksum_plane(
        read_surfer_array(D + "gsg/gsg_7binary.grd")) == 4672
    c = read_byn_array(D + "byn/cgg2013ai08_reduced.byn")
    assert checksum_plane(c) == 64764
    m = byn_meta(D + "byn/cgg2013ai08_reduced.byn")
    assert abs(m["geotransform"][0] + 170.0) < 1e-9


def test_bsb_published_checksums():
    """bsb.py:27/:56/:69 — base, index-table and split-line variants all
    checksum 30321 (values shifted down one: the reference drops the
    1-based palette's first entry, bsbdataset.cpp:101)."""
    from gdal_ray.sources.bsb import bsb_meta, read_bsb_array

    B = "/root/reference/autotest/gdrivers/data/bsb/"
    for f in ["rgbsmall.kap", "rgbsmall_index.kap",
              "rgbsmall_with_line_break.kap", "transverse_mercator.kap"]:
        a = read_bsb_array(B + f)
        assert a.shape == (50, 50) and checksum_plane(a) == 30321, f
    m = bsb_meta(B + "rgbsmall.kap")
    assert m["depth"] == 7 and len(m["palette"]) == 128
    # big chart decodes fully
    big = read_bsb_array(B + "australia4c.kap")
    assert big.shape == (480, 625)


def test_asciigrids_published_checksums():
    """isg.py:27 (159), grassasciigrid.py:23 (212), ctg.py:24 (21 band
    1 of 6 Int32 bands), ndf.py:24 (window cs 6510 on the one-line
    band file, zero-padded)."""
    from gdal_ray.sources.asciigrids import (ctg_meta, read_ctg_array,
                                             read_grass_array,
                                             read_isg_array,
                                             read_ndf_array)

    D = "/root/reference/autotest/gdrivers/data/"
    a = read_isg_array(D + "isg/test.isg")
    assert a.shape == (4, 6) and checksum_plane(a) == 159
    g = read_grass_array(D + "grassasciigrid/grassascii.txt")
    assert checksum_plane(g) == 212
    c = read_ctg_array(D + "ctg/fake_grid_cell")
    assert c.shape[2] == 6 and checksum_plane(c[:, :, 0]) == 21
    assert ctg_meta(D + "ctg/fake_grid_cell")["epsg"] == 32614
    n = read_ndf_array(D + "ndf/LE7134052000500350.H3")
    assert checksum_plane(n[0:1, :]) == 6510


def test_fast_published_expectations():
    """fast.py:31/:102 window checksums (60323 pan, 19110 band 2) and
    the corner-GCP least-squares geotransforms of tests 5-8, including
    the rotated Euromap LISS3/WIFS affines."""
    from gdal_ray.sources.fast import fast_meta, read_fast_band

    D = "/root/reference/autotest/gdrivers/data/fast/"
    a = read_fast_band(D + "L71118038_03820020111_HPN.FST")
    assert checksum_plane(a[0:1, 0:5000]) == 60323
    m = fast_meta(D + "L71230079_07920021111_HTM.FST")
    assert m["bands"] == 2
    for got, exp in zip(m["geotransform"],
                        (528417.25, 30.0, 0.0, 7071187.0, 0.0, -30.0)):
        assert abs(got - exp) < 1e-6
    b2 = read_fast_band(D + "L71230079_07920021111_HTM.FST", 1)
    assert checksum_plane(b2[0:1, 0:7000]) == 19110

    cases = [
        ("n0o0y867.0fl", 4, (14640936.89174916, 1.008817518246492,
                             24.9876841746236, 664274.3912497687,
                             24.98828832116786, -0.9907878581173808)),
        ("h0o0y867.1ah", 1, (676565.09, 5, 0, 5348341.5, 0, -5)),
        ("w0y13a4t.010", 2, (-336965.0150603952, 176.0817495260164,
                             -37.35662873563219, 484122.7765089957,
                             -37.35622603749736, -176.081791954023)),
    ]
    for f, nb, egt in cases:
        mm = fast_meta(D + f)
        assert mm["bands"] == nb, f
        for got, exp in zip(mm["geotransform"], egt):
            assert abs(got - exp) < 1e-4, f


def test_adrg_published_expectations():
    """adrg.py:28/:38 — band 1 checksum 62833 through both the .GEN and
    .THF open paths, and the ZNA 9/18 polar ARC geotransforms of
    adrg.py:65/:96 (fixed-position sddmmss.ss angle parsing)."""
    from gdal_ray.sources.adrg import adrg_meta, read_adrg_array

    D = "/root/reference/autotest/gdrivers/data/adrg/"
    for p in [D + "SMALL_ADRG/ABCDEF01.GEN", D + "SMALL_ADRG/TRANSH01.THF"]:
        a = read_adrg_array(p)
        assert a.shape == (128, 128, 3)
        assert checksum_plane(a[:, :, 0]) == 62833, p
    m9 = adrg_meta(D + "SMALL_ADRG_ZNA9/ABCDEF01.GEN")
    exp9 = (-307675.73602473765, 100.09145391818853, 0.0,
            -179477.5051066006, 0.0, -100.09145391818853)
    for got, exp in zip(m9["geotransform"], exp9):
        assert abs(got - exp) < 1e-5
    m18 = adrg_meta(D + "SMALL_ADRG_ZNA18/ABCDEF01.GEN")
    assert abs(m18["geotransform"][3] - 179477.5051066006) < 1e-5


def test_srp_published_expectations():
    """srp.py:48 — all three PCB modes (uncompressed, nibble RLE, byte
    RLE) checksum 24576 through both .IMG and .THF paths, with the
    projected USRP geotransform (500000, 5, 0, 5000000, 0, -5)."""
    from gdal_ray.sources.adrg import read_srp_array, srp_meta

    D = "/root/reference/autotest/gdrivers/data/srp/"
    for z in ["USRP_PCB0", "USRP_PCB4", "USRP_PCB8"]:
        for f in ["FKUSRP01.IMG", "TRANSH01.THF"]:
            a = read_srp_array(D + z + "/" + f)
            assert checksum_plane(a) == 24576, (z, f)
    m = srp_meta(D + "USRP_PCB4/FKUSRP01.IMG")
    assert m["geotransform"] == (500000.0, 5.0, 0.0, 5000000.0, 0.0, -5.0)
    assert m["pcb"] == 4


# ----------------------------------------------------------------- S-57

def test_s57_layers_and_geometries(ray_session):
    """ogr_s57.py:47 layer/count table (all 13 layers exact), plus the
    COALNE linestring endpoints, the closed 18-point M_QUAL ring and
    the exact SOUNDG 3D soundings of tests COALNE/M_QUAL/SOUNDG."""
    import struct

    from gdal_ray.sources.s57 import read_s57, s57_layers

    p = "/root/reference/autotest/ogr/data/s57/1B5X02NE.000"
    L = s57_layers(p)
    exp = {"DSID": 1, "COALNE": 1, "DEPARE": 4, "DEPCNT": 4, "LNDARE": 1,
           "LNDELV": 2, "SBDARE": 2, "SLCONS": 1, "SLOTOP": 1,
           "SOUNDG": 2, "M_COVR": 1, "M_NSYS": 1, "M_QUAL": 1}
    assert {k: len(v) for k, v in L.items()} == exp

    wkb = L["COALNE"][0]["wkb"]
    n = struct.unpack_from("<I", wkb, 5)[0]
    assert n == 15
    x0, y0 = struct.unpack_from("<dd", wkb, 9)
    xn, yn = struct.unpack_from("<dd", wkb, 9 + 16 * (n - 1))
    assert abs(x0 - 60.976834) < 1e-8 and abs(y0 + 32.494426) < 1e-8
    assert abs(xn - 60.979426) < 1e-8 and abs(yn + 32.498666) < 1e-8

    q = L["M_QUAL"][0]["wkb"]
    nr = struct.unpack_from("<I", q, 5)[0]
    npts = struct.unpack_from("<I", q, 9)[0]
    assert nr == 1 and npts == 18

    s = L["SOUNDG"][0]["wkb"]
    nm = struct.unpack_from("<I", s, 5)[0]
    assert nm == 4
    zs = sorted(round(struct.unpack_from("<ddd", s, 9 + i * 29 + 5)[2], 3)
                for i in range(nm))
    assert zs == [-3.2, 1.2, 1.4, 3.4]

    ds = read_s57(p)
    assert ds.count() == sum(exp.values())


def test_mixedrasters_published_checksums():
    """rraster.py:30 (4672), til.py:29 (4672), paux.py:25 (band 2
    12816, PCIDSK 'Swapped'-is-LE semantics), genbin.py:28 (500x1
    window 5738), ngsgeoid.py:23/:43 (65534 both endiannesses),
    mff.py:25 (1) + bytemff (4672), eir.py:25 (1), snodas.py:27 gt."""
    from gdal_ray.sources.mixedrasters import (ngsgeoid_meta,
                                               read_eir_array,
                                               read_genbin_array,
                                               read_mff_band,
                                               read_ngsgeoid_array,
                                               read_paux_band,
                                               read_rraster_array,
                                               read_til_array,
                                               snodas_meta)

    D = "/root/reference/autotest/gdrivers/data/"
    assert checksum_plane(
        read_rraster_array(D + "rraster/byte_rraster.grd")) == 4672
    assert checksum_plane(read_til_array(D + "til/testtil.til")) == 4672
    assert checksum_plane(
        read_paux_band(D + "paux/small16.raw", 1)) == 12816
    g = read_genbin_array(D + "genbin/tm4628_96.bil")
    assert checksum_plane(g[0:1, 0:500, 0]) == 5738
    for f in ["ngsgeoid/g2009u01_le_truncated.bin",
              "ngsgeoid/g2009u01_be_truncated.bin"]:
        assert checksum_plane(read_ngsgeoid_array(D + f)) == 65534
        m = ngsgeoid_meta(D + f)
        assert abs(m["geotransform"][1] - 1.0 / 60) < 1e-12
    assert checksum_plane(read_mff_band(D + "mff/fakemff.hdr")) == 1
    assert checksum_plane(read_mff_band(D + "mff/bytemff.hdr")) == 4672
    assert checksum_plane(read_eir_array(D + "eir/fakeeir.hdr")) == 1
    s = snodas_meta(D + "snodas/fake_snodas.hdr")
    assert abs(s["geotransform"][0] + 124.733749999995) < 1e-9
    assert abs(s["geotransform"][1] - 0.0083333333333) < 1e-10


def test_iris_published_checksums():
    """iris.py:28 (fake, 65532) and :39 (real dBZ product, 52872 —
    bottom-up scanlines + the (raw-64)/2 dBZ conversion with the 95.5
    nodata rule)."""
    from gdal_ray.sources.mixedrasters import iris_meta, read_iris_array

    D = "/root/reference/autotest/gdrivers/data/iris/"
    assert checksum_plane(read_iris_array(D + "fakeiris.dat")) == 65532
    a = read_iris_array(D + "iristest.dat")
    assert a.shape == (262, 260) and checksum_plane(a) == 52872
    assert iris_meta(D + "iristest.dat")["data_type_code"] == 2


def test_bag_published_checksums():
    """bag.py:56-64 — true_n_nominal.bag bands (elevation 1072,
    uncertainty 150, nominal_elevation 1315), south-up flip; exercises
    the HDF5 reader's uncached root symtab, object-header continuation
    blocks and nested-group walk."""
    from gdal_ray.sources.mixedrasters import bag_meta, read_bag_band

    p = "/root/reference/autotest/gdrivers/data/bag/true_n_nominal.bag"
    m = bag_meta(p)
    assert m["band_names"] == ["elevation", "uncertainty",
                               "nominal_elevation"]
    for b, exp in [(0, 1072), (1, 150), (2, 1315)]:
        assert checksum_plane(read_bag_band(p, b)) == exp


def test_kro_roundtrip_matches_reference_checksum(tmp_path):
    """kro.py:28 pins rgbsmall band 2 cs 21053 through a KRO CreateCopy
    — our writer+reader round-trips the same data to the same checksum,
    plus u16/f32 depths."""
    import numpy as np

    from gdal_ray.codecs.tiff import decode_tiff
    from gdal_ray.sources.mixedrasters import read_kro_array, write_kro

    ref = np.squeeze(np.asarray(decode_tiff(open(
        "/root/reference/autotest/gdrivers/data/rgbsmall.tif",
        "rb").read())))
    p = str(tmp_path / "t.kro")
    write_kro(p, ref)
    a = read_kro_array(p)
    assert np.array_equal(a, ref)
    assert checksum_plane(a[:, :, 1]) == 21053
    f32 = ref[:, :, 2].astype(np.float32) / 2
    write_kro(p, f32)
    assert np.array_equal(read_kro_array(p), f32)


def test_pnm_jdem_pcidsk_published_checksums(tmp_path):
    """pnm.py:27 (4672), jdem.py:23 (15, decimeter records),
    pcidsk.py:38 (utm.pix band 1 39576, BAND interleave)."""
    import numpy as np

    from gdal_ray.sources.mixedrasters import (read_jdem_array,
                                               read_pcidsk_band,
                                               read_pnm_array, write_pnm)

    D = "/root/reference/autotest/gdrivers/data/"
    a = read_pnm_array(D + "pnm/byte.pgm")
    assert checksum_plane(a) == 4672
    p = str(tmp_path / "x.pgm")
    write_pnm(p, a)
    assert np.array_equal(read_pnm_array(p), a)
    assert checksum_plane(read_jdem_array(D + "jdem/fakejdem.mem")) == 15
    b = read_pcidsk_band(D + "pcidsk/utm.pix")
    assert b.shape == (7, 500) and checksum_plane(b) == 39576


def test_idrisi_rst_published_checksums():
    # idrisi.py:28 byte.rst -> 5044; :43 real.rst -> 5275
    from gdal_ray.sources.mixedrasters import read_rst_array, rst_meta

    D = "/root/reference/autotest/gdrivers/data/rst/"
    assert checksum_plane(read_rst_array(D + "byte.rst")) == 5044
    r = read_rst_array(D + "real.rst")
    assert r.dtype == np.float32 and checksum_plane(r) == 5275
    m = rst_meta(D + "byte.rst")
    assert m["geotransform"][0] == 50.0


def test_noaa_mff2_roipac_pcraster_published_checksums():
    """noaa_b.py:26 (cs 3 + gt, BE + LE, Fortran records south-up),
    mff2.py:25 (4672), roipac.py:28 (64074 with .rsc sizes),
    pcraster.py:27 (ldd.map 4528, CSF raster header)."""
    from gdal_ray.sources.mixedrasters import (noaa_b_meta,
                                               pcraster_meta,
                                               read_mff2_array,
                                               read_noaa_b_array,
                                               read_pcraster_array,
                                               read_roipac_array)

    D = "/root/reference/autotest/gdrivers/data/"
    for f in ["noaa_b/test.b", "noaa_b/test_little_endian.b"]:
        assert checksum_plane(read_noaa_b_array(D + f)) == 3, f
    assert noaa_b_meta(D + "noaa_b/test.b")["geotransform"] == \
        (1.75, 0.5, 0.0, 49.25, 0.0, -0.5)
    assert checksum_plane(read_mff2_array(D + "mff2/bytemff2")) == 4672
    assert checksum_plane(read_roipac_array(D + "roipac/srtm.dem")) == 64074
    p = read_pcraster_array(D + "pcraster/ldd.map")
    assert p.shape == (100, 80) and checksum_plane(p) == 4528
    assert pcraster_meta(D + "pcraster/ldd.map")["value_scale"] == 240


def test_dimap_v1_published_checksum(tmp_path):
    """dimap.py:32 — METADATA.DIM (v1) with a VRT-disguised IMAGERY.TIF
    referencing rgbsmall.tif: 6000x6000 declared, 100x100 window
    checksum 21586 (same tmp-copy setup as the autotest)."""
    import shutil

    from gdal_ray.sources.products import read_dimap_array

    D = "/root/reference/autotest/gdrivers/data/"
    shutil.copy(D + "dimap/METADATA.DIM", tmp_path)
    shutil.copy(D + "dimap/IMAGERY.TIF", tmp_path)
    shutil.copy(D + "rgbsmall.tif", tmp_path)
    a = read_dimap_array(str(tmp_path / "METADATA.DIM"))
    assert a.shape == (6000, 6000, 1)
    assert checksum_plane(a[:100, :100, 0]) == 21586


def test_nwt_grd_published_checksums():
    """nwt_grd.py:29/:31 — bands 1/2 (ramp RGB through the 4096-entry
    createIP inflection interpolation) checksum 28093/33690."""
    from gdal_ray.sources.mixedrasters import (nwt_grd_meta,
                                               read_nwt_grd_band)

    p = "/root/reference/autotest/gdrivers/data/nwt_grd/nwt_grd.grd"
    assert checksum_plane(read_nwt_grd_band(p, 0)) == 28093
    assert checksum_plane(read_nwt_grd_band(p, 1)) == 33690
    m = nwt_grd_meta(p)
    assert len(m["inflections"]) == 5 and m["bands"] == 4


def test_dispatch_roipac_and_hgpc_routing():
    """Round-5 ADVICE fix: .dem with a companion .rsc must route to the
    ROI_PAC reader (not USGS DEM) in BOTH describe() and open_raster, and
    .grd with the HGPC magic must route to the Northwood reader (not
    Surfer) in open_raster — previously both advertised drivers were
    unreachable through the registry doors."""
    from gdal_ray.info import describe
    from gdal_ray.sources import open_raster

    D = "/root/reference/autotest/gdrivers/data/"
    m = describe(D + "roipac/srtm.dem")
    assert m["driver"].lower().startswith("roi"), m["driver"]
    ds = open_raster(D + "roipac/srtm.dem")
    rows = ds.take_all()
    assert len(rows) >= 1 and rows[0]["n_rows"] >= 1 and rows[0]["data"]

    m2 = describe(D + "nwt_grd/nwt_grd.grd")
    assert m2["driver"] == "NWT_GRD"
    ds2 = open_raster(D + "nwt_grd/nwt_grd.grd")
    rows2 = ds2.take_all()
    assert len(rows2) == 4  # Z + ramp RGB bands
    import numpy as np

    z = np.frombuffer(rows2[0]["data"], dtype=np.uint8)
    assert checksum_plane(z.reshape(rows2[0]["n_rows"], -1)) == 28093


def test_s57_objl_matches_reference_catalogue():
    """Round-5 ADVICE fix: codes 115-120 were shifted by one vs the
    reference s57objectclasses.csv; table now regenerated verbatim.
    Sample assertions pin the previously-wrong region plus spot checks."""
    from gdal_ray.sources.s57 import _OBJL

    expect = {115: "RIVBNK", 116: "ROADWY", 117: "RUNWAY", 118: "SNDWAV",
              119: "SEAARE", 120: "SPLARE", 121: "SBDARE", 122: "SLCONS",
              123: "SISTAT", 124: "SISTAW", 131: "SQUARE", 143: "TIDEWY",
              160: "TS_FEB", 161: "ARCSLN", 162: "ASLXIS", 129: "SOUNDG",
              42: "DEPARE", 71: "LNDARE", 159: "WRECKS", 300: "M_ACCY",
              302: "M_COVR", 312: "M_VDAT"}
    for code, acr in expect.items():
        assert _OBJL[code] == acr, (code, _OBJL.get(code), acr)
    # and the full table agrees with the reference catalogue when present
    import csv
    import os

    cat = ("/root/reference/ogr/ogrsf_frmts/s57/data/"
           "s57objectclasses.csv")
    if os.path.exists(cat):
        with open(cat) as f:
            r = csv.reader(f)
            next(r)
            for line in r:
                try:
                    code = int(line[0])
                except (ValueError, IndexError):
                    continue
                assert _OBJL.get(code) == line[2], (code, line[2])


def test_dted_published_checksums():
    """DTED (MIL-PRF-89020B, frmts/dted): published autotest pins —
    n43.dt0 checksum 49187 + exact geotransform (dted.py:39,56);
    partial/sparse column files 56006/56369 (embedded column index +
    nodata fill, dted.py:296,307); inverted-header file detected by
    hemisphere letters (dted.py:252)."""
    from gdal_ray.sources.dted import dted_meta, read_dted_array

    D = "/root/reference/autotest/gdrivers/data/"
    assert checksum_plane(read_dted_array(D + "n43.dt0")) == 49187
    gt = dted_meta(D + "n43.dt0")["geotransform"]
    assert abs(gt[0] - (-80.004166666666663)) < 1e-6
    assert abs(gt[3] - 44.00416666666667) < 1e-6
    assert abs(gt[5] - (-0.0083333333333333332)) < 1e-9
    assert checksum_plane(
        read_dted_array(D + "dted/n43_partial_cols.dt0")) == 56006
    assert checksum_plane(
        read_dted_array(D + "dted/n43_sparse_cols.dt0")) == 56369
    gti = dted_meta(D + "dted/n43_coord_inverted.dt0")["geotransform"]
    assert abs(gti[0] - (-80.004166666666663)) < 1e-6
    assert abs(gti[3] - 44.00416666666667) < 1e-6


def test_lcp_loslas_isis2_published_values():
    """Round-5 batch: FARSITE LCP (lcp.py:69-150 all 8 band checksums +
    both geotransforms), NADCON LOS/LAS (loslas.py gt + 4 stats), ISIS2
    (isis2.py checksum 382)."""
    from gdal_ray.sources.mixedrasters import (isis2_meta, lcp_meta,
                                               loslas_meta,
                                               read_isis2_array,
                                               read_lcp_array,
                                               read_loslas_array)

    D = "/root/reference/autotest/gdrivers/data/"
    m = lcp_meta(D + "lcp/test_FARSITE_UTM12.LCP")
    assert m["bands"] == 8
    assert abs(m["geotransform"][0] - 285807.932887174887583) < 1e-6
    assert abs(m["geotransform"][3] - 5379230.386217921040952) < 1e-6
    a = read_lcp_array(D + "lcp/test_FARSITE_UTM12.LCP")
    want = [18645, 16431, 18851, 26182, 30038, 22077, 30388, 23249]
    assert [checksum_plane(a[:, :, b]) for b in range(8)] == want
    a2 = read_lcp_array(D + "lcp/test_USGS_LFNM_Alb83.lcp")
    assert [checksum_plane(a2[:, :, b]) for b in range(2)] == [28381, 25824]

    m = loslas_meta(D + "loslas/wyhpgn.los")
    assert m["geotransform"] == (-111.625, 0.25, 0.0, 45.625, 0.0, -0.25)
    g = read_loslas_array(D + "loslas/wyhpgn.los")
    assert abs(float(g.min()) - (-0.027868999168276787)) < 1e-9
    assert abs(float(g.max()) - 0.033906999975442886) < 1e-9
    assert abs(float(g.mean()) - 0.009716129862575248) < 1e-9
    assert abs(float(g.std()) - 0.008260044951413324) < 1e-9

    i2 = read_isis2_array(D + "isis2/arvidson_original_truncated.cub")
    assert checksum_plane(i2) == 382
    assert isis2_meta(
        D + "isis2/arvidson_original_truncated.cub")["dtype"] == ">f4"


def test_mrf_published_checksums():
    """NASA MRF (frmts/mrf): every lossless page codec variant of the
    byte.tif fixture reads checksum 4672 (mrf.py matrix) — LERC v2,
    LERC v1 (CntZImage, validity mask), PNG, DEFLATE, NONE, embedded
    TIF; JPEG is lossy (4668 via libjpeg's IDCT)."""
    from gdal_ray.sources.mixedrasters import mrf_meta, read_mrf_array

    B = "/root/reference/autotest/gdrivers/data/mrf/"
    for d in ("lerc", "lerc_v1", "png", "deflate", "none", "tif"):
        a = read_mrf_array(B + d + "/byte.mrf")
        assert checksum_plane(a.astype(np.uint8)) == 4672, d
    m = mrf_meta(B + "lerc/byte.mrf")
    assert m["geotransform"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0,
                                 -60.0)
    aj = read_mrf_array(B + "jpeg/byte.mrf")
    assert abs(int(checksum_plane(aj.astype(np.uint8))) - 4672) < 20


def test_esric_published_checksums(tmp_path):
    """Esri Compact Cache V2 + .tpkx (frmts/esric): published autotest
    pins — Usa.tpkx full-res LOD5 per-band checksums 61275/57672/
    61542/19476 and LOD3 band-2 53503 (esric.py:146,169); the tar'd V2
    cache's LOD1 band-2 46857 (esric.py:91)."""
    import tarfile

    from gdal_ray.sources.esric import esric_meta, read_esric_level

    E = "/root/reference/autotest/gdrivers/data/esric/"
    a = read_esric_level(E + "Usa.tpkx", 5)
    assert a.shape == (8192, 8192, 4)
    assert [checksum_plane(a[:, :, b]) for b in range(4)] == \
        [61275, 57672, 61542, 19476]
    a3 = read_esric_level(E + "Usa.tpkx", 3)
    assert checksum_plane(a3[:, :, 1]) == 53503
    assert esric_meta(E + "Usa.tpkx")["n_lods"] == 6

    tarfile.open(E + "Layers.tar").extractall(str(tmp_path))
    v2 = str(tmp_path / "Layers")
    a1 = read_esric_level(v2, 1)
    assert checksum_plane(a1[:, :, 1]) == 46857


def test_fits_published_values():
    """FITS from the 4.0 standard (the reference delegates to cfitsio):
    byte_merc.fits reads checksum 4672; multi-HDU walking matches the
    autotest's expected metadata dict and subdataset sizes
    (fits.py:151-180); BSCALE/BZERO surfaces scaled floats."""
    from gdal_ray.sources.fits import (fits_meta, read_fits_array)

    B = "/root/reference/autotest/gdrivers/data/fits/"
    assert checksum_plane(read_fits_array(B + "byte_merc.fits")) == 4672
    m = fits_meta(B + "image_in_second_hdu.fits")
    assert m["image_hdus"] == [{"hdu": 1, "width": 1, "height": 2,
                                "bands": 1, "bitpix": 8}]
    assert m["metadata"] == {"FOO": "BAR_override", "FOO2": "BAR2    ",
                             "BAR": "BAZ     "}
    m2 = fits_meta(B + "image_in_first_and_second_hdu.fits")
    assert [(h["width"], h["height"]) for h in m2["image_hdus"]] == \
        [(1, 2), (1, 3)]
    assert fits_meta(B + "empty_primary_hdu.fits")["image_hdus"] == []
    a = read_fits_array(B + "offset_scale_no_georef.fits")
    assert a.dtype == np.float64  # BSCALE/BZERO applied


def test_isce_published_checksum():
    """JPL ISCE (frmts/raw/iscedataset.cpp): CFLOAT SLC fixture reads
    checksum 350 (isce.py, complex checksummed over interleaved
    real/imag like the reference)."""
    from gdal_ray.sources.mixedrasters import isce_meta, read_isce_array

    p = "/root/reference/autotest/gdrivers/data/isce/isce.slc"
    m = isce_meta(p)
    assert (m["width"], m["height"]) == (12, 10)
    a = read_isce_array(p)
    inter = np.empty((a.shape[0], a.shape[1] * 2), np.float32)
    inter[:, 0::2] = a.real
    inter[:, 1::2] = a.imag
    assert checksum_plane(inter) == 350


def test_aig_published_values():
    """Arc/Info Binary Grid (frmts/aigrid/gridlib.c): abc3x1 reads
    values [0,1,2] / checksum 3 with the exact autotest geotransform
    (-0.5, 1, 0, 0.5, 0, -1), both lowercase and UPPERCASE coverages
    (aigrid.py:31,60)."""
    from gdal_ray.sources.mixedrasters import aig_meta, read_aig_array

    B = "/root/reference/autotest/gdrivers/data/aigrid/"
    for d in ("abc3x1", "ABC3X1UC"):
        a = read_aig_array(B + d)
        assert a.ravel().tolist() == [0, 1, 2], d
        assert checksum_plane(a) == 3, d
        assert aig_meta(B + d)["geotransform"] == \
            (-0.5, 1.0, 0.0, 0.5, 0.0, -1.0)


def test_stacta_expected_values():
    """STAC Tiled Assets (frmts/stacta): size 2048x1024, the autotest's
    exact WGS84 geotransform, and the mosaic equals the direct
    concatenation of the level-2 tiles (stacta.py:31-55)."""
    from gdal_ray.codecs.tiff import decode_tiff
    from gdal_ray.sources.stacta import read_stacta_array, stacta_meta

    p = "/root/reference/autotest/gdrivers/data/stacta/test.json"
    m = stacta_meta(p)
    assert (m["width"], m["height"], m["bands"]) == (2048, 1024, 3)
    gt = m["geotransform"]
    assert abs(gt[0] + 180.0) < 1e-8
    assert abs(gt[1] - 0.17578125) < 1e-8
    assert abs(gt[3] - 90.0) < 1e-8
    assert abs(gt[5] + 0.17578125) < 1e-8
    a = read_stacta_array(p)
    B = ("/root/reference/autotest/gdrivers/data/stacta/"
         "WorldCRS84Quad/2/0/")
    ref = np.concatenate(
        [decode_tiff(open(B + "0.tif", "rb").read()),
         decode_tiff(open(B + "1.tif", "rb").read())], axis=1)
    if ref.ndim == 2:
        ref = ref[:, :, None]
    assert np.array_equal(a, ref)
    assert m["levels"] == [0, 1, 2]  # overview pyramid


def test_doq2_and_gsc(tmp_path):
    """USGS DOQ2 keyword-header driver: first-row per-band checksums
    4201/4010/5820 + exact geotransform (doq2.py:34-45); GSC geogrid:
    fake-fixture open + a synthesized Fortran-record file round-trips."""
    import struct

    from gdal_ray.sources.mixedrasters import (doq2_meta, gsc_meta,
                                               read_doq2_array,
                                               read_gsc_array)

    p = ("/root/reference/autotest/gdrivers/data/doq2/"
         "C3607614_truncated.NWS")
    m = doq2_meta(p)
    assert (m["width"], m["height"], m["bands"]) == (500, 7631, 3)
    assert m["geotransform"] == (377054.0, 1.0, 0.0, 4082205.0, 0.0,
                                 -1.0)
    a = read_doq2_array(p, max_rows=1)
    assert [checksum_plane(a[:, :, b]) for b in range(3)] == \
        [4201, 4010, 5820]

    assert gsc_meta("/root/reference/autotest/gdrivers/data/gsc/"
                    "fakegsc.gsc")["width"] == 1

    # synthesized GSC: 3x2 float grid laid out by the driver's absolute
    # offsets (record = 4-byte marker + rec_len payload + 4-byte marker;
    # info floats at rec+12, data rows at rec*2+4 + r*rec)
    w, h = 12, 2  # rec_len must exceed the 8+32-byte info span
    rec_len = w * 4
    rec = rec_len + 8
    vals = np.arange(w * h, dtype="<f4").reshape(h, w) * 1.5
    buf = bytearray(rec * 2 + 4 + h * rec)
    struct.pack_into("<4i", buf, 0, rec_len, w, h, 2)
    struct.pack_into("<8f", buf, rec + 12, 2.0, 3.0, 100.0, 0, 0,
                     200.0, 0, 0)
    for r in range(h):
        buf[rec * 2 + 4 + r * rec:rec * 2 + 4 + r * rec + rec_len] = \
            vals[r].tobytes()
    g = str(tmp_path / "t.gsc")
    with open(g, "wb") as f:
        f.write(bytes(buf))
    mg = gsc_meta(g)
    assert mg["geotransform"] == (100.0, 2.0, 0.0, 200.0, 0.0, -3.0)
    assert np.array_equal(read_gsc_array(g), vals)


def test_gti_tile_index_mosaic(tmp_path, ray_session):
    """GTI (frmts/gti): a GPKG tile index of two GeoTIFFs opens as their
    mosaic, both through the driver-side assembly and the per-tile Ray
    door."""
    from gdal_ray.codecs.tiff import encode_geotiff
    from gdal_ray.geometry.wkb import encode_polygon
    from gdal_ray.sources.gpkg import write_gpkg
    from gdal_ray.sources.gti import gti_meta, read_gti, read_gti_array

    import pyarrow as pa

    rng = np.random.default_rng(8)
    a = rng.integers(0, 255, (10, 12), dtype=np.uint8)
    b = rng.integers(0, 255, (10, 12), dtype=np.uint8)
    pa_t = str(tmp_path / "a.tif")
    pb_t = str(tmp_path / "b.tif")
    with open(pa_t, "wb") as f:  # west tile
        f.write(encode_geotiff(a, geotransform=(0.0, 1.0, 0, 10.0, 0,
                                                -1.0)))
    with open(pb_t, "wb") as f:  # east tile
        f.write(encode_geotiff(b, geotransform=(12.0, 1.0, 0, 10.0, 0,
                                                -1.0)))

    def box(x0, x1):
        r = np.array([[x0, 0], [x1, 0], [x1, 10], [x0, 10], [x0, 0]],
                     float)
        return encode_polygon([r])

    idx = pa.table({
        "fid": pa.array([1, 2], pa.int64()),
        "wkb": pa.array([box(0, 12), box(12, 24)], pa.binary()),
        "location": pa.array(["a.tif", "b.tif"]),
    })
    ip = str(tmp_path / "index.gpkg")
    write_gpkg(idx, ip, layer="index")

    m = gti_meta(ip)
    assert (m["width"], m["height"], m["n_tiles"]) == (24, 10, 2)
    assert m["geotransform"] == (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
    full = read_gti_array(ip)[:, :, 0]
    assert np.array_equal(full, np.concatenate([a, b], axis=1))

    out = np.zeros((10, 24), np.uint8)
    for r in read_gti(ip).take_all():
        out[r["y0"]:r["y0"] + r["h"], r["x0"]:r["x0"] + r["w"]] = \
            np.frombuffer(r["data"], np.uint8).reshape(r["h"], r["w"])
    assert np.array_equal(out, full)


def test_sentinel2_l1c_metadata_exact():
    """Sentinel-2 L1C SAFE (frmts/sentinel2): the product metadata dict
    matches the reference autotest's expected_md EXACTLY (29 keys, no
    extras — sentinel2.py:59-88) and the resolution-grouped subdataset
    descriptions match."""
    from gdal_ray.sources.sentinel2 import sentinel2_meta

    p = ("/root/reference/autotest/gdrivers/data/sentinel2/fake_l1c/"
         "S2A_OPER_PRD_MSIL1C.SAFE/S2A_OPER_MTD_SAFL1C.xml")
    m = sentinel2_meta(p)
    expected = {
        "CLOUD_COVERAGE_ASSESSMENT": "0.0",
        "DATATAKE_1_DATATAKE_SENSING_START": "2015-12-31T23:59:59.999Z",
        "DATATAKE_1_DATATAKE_TYPE": "INS-NOBS",
        "DATATAKE_1_ID": "GS2A_20151231T235959_000123_N01.03",
        "DATATAKE_1_SENSING_ORBIT_DIRECTION": "DESCENDING",
        "DATATAKE_1_SENSING_ORBIT_NUMBER": "22",
        "DATATAKE_1_SPACECRAFT_NAME": "Sentinel-2A",
        "DEGRADED_ANC_DATA_PERCENTAGE": "0",
        "DEGRADED_MSI_DATA_PERCENTAGE": "0",
        "FOOTPRINT": "POLYGON((11 46, 11 45, 13 45, 13 46, 11 46))",
        "FORMAT_CORRECTNESS_FLAG": "PASSED",
        "GENERAL_QUALITY_FLAG": "PASSED",
        "GENERATION_TIME": "2015-12-31T23:59:59.999Z",
        "GEOMETRIC_QUALITY_FLAG": "PASSED",
        "PREVIEW_GEO_INFO": "BrowseImageFootprint",
        "PREVIEW_IMAGE_URL": "http://example.com",
        "PROCESSING_BASELINE": "01.03",
        "PROCESSING_LEVEL": "Level-1C",
        "PRODUCT_START_TIME": "2015-12-31T23:59:59.999Z",
        "PRODUCT_STOP_TIME": "2015-12-31T23:59:59.999Z",
        "PRODUCT_TYPE": "S2MSI1C",
        "QUANTIFICATION_VALUE": "1000",
        "RADIOMETRIC_QUALITY_FLAG": "PASSED",
        "REFERENCE_BAND": "B1",
        "REFLECTANCE_CONVERSION_U": "0.97",
        "SENSOR_QUALITY_FLAG": "PASSED",
        "SPECIAL_VALUE_NODATA": "1",
        "SPECIAL_VALUE_SATURATED": "0",
    }
    assert m["metadata"] == expected
    assert [s["desc"] for s in m["subdatasets"]] == [
        "Bands B2, B3, B4, B8 with 10m resolution, UTM 32N",
        "Bands B5, B6, B7, B8A, B11, B12 with 20m resolution, UTM 32N",
        "Bands B1, B9, B10 with 60m resolution, UTM 32N",
        "RGB preview, UTM 32N",
    ]


def test_snap_tiff_header(tmp_path):
    """SNAP (Sentinel-1) TIFF: the engine's own TIFF reader parses the
    header of the double-zipped truncated fixture to the autotest's
    pinned size/type (snap_tiff.py: 25548x16716 float32, 1 band)."""
    import glob
    import zipfile

    z = ("/root/reference/autotest/gdrivers/data/snap_tiff/"
         "S1A_IW_GRDH_1SDV_20171009T141532_20171009T141557_018737_"
         "01F9E2_E974_tnr_empty_truncated.tif.zip.zip")
    zipfile.ZipFile(z).extractall(str(tmp_path))
    inner = glob.glob(str(tmp_path / "*.zip"))[0]
    zipfile.ZipFile(inner).extractall(str(tmp_path))
    tif = glob.glob(str(tmp_path / "*.tif"))[0]

    from gdal_ray.sources.gtiff_reader import tiff_levels

    m = tiff_levels(tif)[0]
    assert (m["width"], m["height"], m["spp"]) == (25548, 16716, 1)
    assert np.dtype(m["dtype"]) == np.float32
