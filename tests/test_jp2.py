"""JP2/JPEG 2000 structural driver: box walk, SIZ/COD main header,
SOT tile-part index, info-door dispatch, loud decode gate."""

import struct

import pytest


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _codestream(w=64, h=48, tw=32, th=48, ncomp=3, depth=8, levels=5,
                tile_bytes=b"\x00" * 40):
    soc = b"\xffO"
    siz = _seg(0x51, struct.pack(
        ">HIIIIIIIIH", 0, w, h, 0, 0, tw, th, 0, 0, ncomp)
        + bytes([depth - 1, 1, 1]) * ncomp)
    cod = _seg(0x52, bytes([0])               # Scod
               + bytes([0]) + struct.pack(">H", 1) + bytes([0])  # SGcod
               + bytes([levels, 4, 4, 0, 1]))  # SPcod (reversible 5/3)
    qcd = _seg(0x5C, bytes([0x20]) + bytes(levels * 3 + 1))
    com = _seg(0x64, b"\x00\x01synthetic fixture")
    ntx = -(-w // tw)
    body = b""
    for t in range(ntx):
        sod = b"\xff\x93"
        part = tile_bytes
        psot = 12 + len(sod) + len(part)
        body += _seg(0x90, struct.pack(">HIBB", t, psot, 0, 1)) + sod + part
    return soc + siz + cod + qcd + com + body + b"\xff\xd9"


def _box(btype, payload):
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _jp2(cs, w=64, h=48, ncomp=3, depth=8):
    sig = b"\x00\x00\x00\x0cjP  \r\n\x87\n"
    ftyp = _box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    ihdr = _box(b"ihdr", struct.pack(">IIHB", h, w, ncomp, depth - 1) + b"\x07\x00\x00")
    colr = _box(b"colr", bytes([1, 0, 0]) + struct.pack(">I", 16))
    jp2h = _box(b"jp2h", ihdr + colr)
    return sig + ftyp + jp2h + _box(b"jp2c", cs)


def test_jp2_container_info(tmp_path):
    from gdal_ray.sources.jp2 import jp2_info

    p = tmp_path / "t.jp2"
    p.write_bytes(_jp2(_codestream()))
    info = jp2_info(str(p))
    assert info["container"] == "jp2" and info["brand"] == "jp2 "
    assert info["ihdr"] == {"width": 64, "height": 48, "bands": 3, "depth": 8}
    assert info["colorspace"] == "sRGB"
    assert (info["width"], info["height"]) == (64, 48)
    assert (info["tile_width"], info["tile_height"]) == (32, 48)
    assert (info["n_tiles_x"], info["n_tiles_y"]) == (2, 1)
    assert info["progression"] == "LRCP" and info["n_resolutions"] == 6
    assert info["reversible"] is True
    assert info["n_tile_parts"] == 2
    # tile-part index: contiguous, SOT-anchored ranges
    tp = info["tile_parts"]
    assert [t["tile"] for t in tp] == [0, 1]
    assert all(t["length"] > 12 for t in tp)
    assert tp[1]["offset"] > tp[0]["offset"]
    assert info["comments"] == ["synthetic fixture"]


def test_raw_codestream_and_last_part_psot0(tmp_path):
    from gdal_ray.sources.jp2 import jp2_info

    cs = _codestream(w=32, h=32, tw=32, th=32, ncomp=1)
    # rewrite the single SOT's Psot to 0 (= runs to EOC, Annex A.4.2)
    sot_at = cs.find(b"\xff\x90")
    cs = cs[:sot_at + 6] + struct.pack(">I", 0) + cs[sot_at + 10:]
    p = tmp_path / "t.j2k"
    p.write_bytes(cs)
    info = jp2_info(str(p))
    assert info["container"] == "raw-codestream"
    assert info["n_tile_parts"] == 1
    t = info["tile_parts"][0]
    assert t["offset"] + t["length"] == len(cs) - 2  # up to EOC


def test_info_door_dispatch_and_decode_gate(tmp_path):
    from gdal_ray.info import describe
    from gdal_ray.sources.jp2 import decode_jp2

    p = tmp_path / "d.jp2"
    p.write_bytes(_jp2(_codestream()))
    out = describe(str(p))
    assert out["driver"] == "JP2" and "tile_parts" not in out
    with pytest.raises(NotImplementedError):
        decode_jp2(str(p))


def test_rejects_non_jp2(tmp_path):
    from gdal_ray.sources.jp2 import jp2_info

    p = tmp_path / "x.jp2"
    p.write_bytes(b"not a jp2 at all")
    with pytest.raises(ValueError):
        jp2_info(str(p))
