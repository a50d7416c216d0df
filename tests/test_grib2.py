"""GRIB2 driver conformance (sources/grib2.py vs the public WMO FM 92
edition-2 spec).  Reference: frmts/grib reads the same wire format via its
vendored degrib/g2clib."""

import struct

import numpy as np
import pytest

from gdal_ray.sources.grib2 import (
    _pack_bits,
    _unpack_bits,
    read_grib2,
    read_grib2_field,
    read_grib2_meta,
    write_grib2,
)


def _fields():
    rng = np.random.default_rng(7)
    temp = rng.normal(280.0, 15.0, (19, 36))
    pres = np.linspace(950.0, 1050.0, 19 * 36).reshape(19, 36)
    return temp, pres


def _write_sample(path, nbits=16):
    temp, pres = _fields()
    n = write_grib2(
        path,
        [temp, (pres, {"category": 3, "number": 0, "forecast_hours": 6})],
        lat0=90.0, lon0=0.0, dlat=10.0, dlon=10.0, nbits=nbits,
        ref_time=(2024, 5, 17, 12, 0, 0),
    )
    assert n == 2
    return temp, pres


def test_wire_layout(tmp_path):
    """Spec anchors: indicator magic/edition/total-length, '7777' trailer,
    section numbering in order."""
    p = str(tmp_path / "t.grib2")
    _write_sample(p)
    raw = open(p, "rb").read()
    assert raw[:4] == b"GRIB"
    assert raw[7] == 2  # edition
    total1 = struct.unpack(">Q", raw[8:16])[0]
    assert raw[total1 - 4:total1] == b"7777"
    assert raw[total1:total1 + 4] == b"GRIB"  # second message abuts
    total2 = struct.unpack(">Q", raw[total1 + 8:total1 + 16])[0]
    assert total1 + total2 == len(raw)
    # first section after the 16-byte indicator is Identification (=1)
    assert raw[20] == 1
    assert struct.unpack(">I", raw[16:20])[0] == 21  # spec-fixed sec1 length


def test_meta_index(tmp_path):
    p = str(tmp_path / "t.grib2")
    _write_sample(p)
    m = read_grib2_meta(p)
    assert m["format"] == "GRIB2" and m["n_messages"] == 2
    m0, m1 = m["messages"]
    assert (m0["ni"], m0["nj"]) == (36, 19)
    assert m0["lat0"] == 90.0 and m0["lon0"] == 0.0
    assert m0["dlat"] == 10.0 and m0["dlon"] == 10.0
    assert m0["lat1"] == pytest.approx(90.0 - 10.0 * 18)
    assert m0["nbits"] == 16
    assert m0["ref_time"] == (2024, 5, 17, 12, 0, 0)
    assert (m1["category"], m1["number"]) == (3, 0)
    assert m1["offset"] == m0["length"]


@pytest.mark.parametrize("nbits", [8, 12, 16, 24])
def test_roundtrip_quantization_bound(tmp_path, nbits):
    """Y = (R + X·2^E)/10^D with E chosen so the span fits nbits: the
    round-trip error is bounded by half a quantization step."""
    p = str(tmp_path / "t.grib2")
    temp, pres = _write_sample(p, nbits=nbits)
    m = read_grib2_meta(p)
    for i, f in enumerate([temp, pres]):
        got = read_grib2_field(p, i)
        assert got.shape == f.shape
        # X = round((v−R)/2^E) ⇒ |err| ≤ 2^(E−1) plus R's float32 rounding
        bound = 2.0 ** (m["messages"][i]["E"] - 1) + abs(f.min()) * 2.0 ** -23
        assert np.abs(got - f).max() <= bound


def test_constant_field_zero_bits_data(tmp_path):
    """A constant field packs to zero data bits (X≡0, Y≡R)."""
    p = str(tmp_path / "c.grib2")
    write_grib2(p, [np.full((4, 8), 42.5)], dlat=1.0, dlon=1.0)
    got = read_grib2_field(p, 0)
    np.testing.assert_allclose(got, 42.5, atol=1e-6)


def test_bit_packing_inverse():
    rng = np.random.default_rng(3)
    for nbits in (1, 7, 13, 20):
        x = rng.integers(0, 1 << nbits, 999).astype(np.uint64)
        assert (_unpack_bits(_pack_bits(x, nbits), len(x), nbits) == x).all()


def test_ray_read_parallel(tmp_path, ray_session):
    """One row per message; each task decodes only its own range."""
    p = str(tmp_path / "t.grib2")
    temp, pres = _write_sample(p)
    rows = sorted(read_grib2(p).take_all(), key=lambda r: r["msg"])
    assert len(rows) == 2
    a0 = np.frombuffer(rows[0]["data"], dtype=np.float64).reshape(19, 36)
    np.testing.assert_allclose(a0, read_grib2_field(p, 0))
    assert rows[1]["category"] == 3 and rows[1]["lat0"] == 90.0


def test_open_registry_and_info(tmp_path, ray_session):
    from gdal_ray.info import describe
    from gdal_ray.sources import open_raster

    p = str(tmp_path / "t.grib2")
    _write_sample(p)
    ds = open_raster(p)
    assert ds.count() == 2
    d = describe(p)
    assert d["driver"] == "GRIB2" and d["n_messages"] == 2
    assert d["messages"][0]["size"] == [19, 36]
    assert d["messages"][1]["category"] == 3


def test_unsupported_templates_raise(tmp_path):
    p = str(tmp_path / "t.grib2")
    _write_sample(p)
    raw = bytearray(open(p, "rb").read())
    # flip grid-definition template number (bytes 12..13 of section 3 body)
    off = 16 + 21  # indicator + section 1
    assert raw[off + 4] == 3
    struct.pack_into(">H", raw, off + 12, 40)  # gaussian grid
    bad = str(tmp_path / "bad.grib2")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(NotImplementedError, match="template 40"):
        read_grib2_meta(bad)


def test_complex_packing_templates(tmp_path):
    """Templates 5.2 (complex) and 5.3 (complex + 2nd-order spatial
    differencing) decode to exactly the same quantized field as 5.0
    simple packing — the real-archive packing family."""
    import numpy as np

    rng = np.random.RandomState(0)
    field = np.cumsum(rng.randn(40, 60) * 0.5, axis=1) + 280.0
    ref = None
    for packing, tmpl in (("simple", 0), ("complex", 2),
                          ("complex_diff", 3)):
        p = str(tmp_path / f"{packing}.grib2")
        write_grib2(p, [field], nbits=16, packing=packing)
        m = read_grib2_meta(p)["messages"][0]
        assert m.get("template") == tmpl
        got = read_grib2_field(p)
        assert np.abs(got - field).max() < 2e-4  # 16-bit quantization
        if ref is None:
            ref = got
        else:
            assert np.array_equal(got, ref)
    # constant field and tiny field edge cases
    for packing in ("complex", "complex_diff"):
        p = str(tmp_path / f"edge_{packing}.grib2")
        write_grib2(p, [np.full((3, 5), 7.25)], packing=packing)
        assert np.allclose(read_grib2_field(p), 7.25)
        write_grib2(p, [np.arange(6.0).reshape(2, 3)], packing=packing)
        assert np.abs(read_grib2_field(p)
                      - np.arange(6.0).reshape(2, 3)).max() < 1e-3
