"""ADRG (ARC Digitized Raster Graphics, MIL-A-89007) driver —
frmts/adrg/adrgdataset.cpp over the ISO 8211 container
(sources/iso8211.py).

Wire facts: the .GEN general-information file holds 8211 records typed
by field 001/RTY; the GIN record carries GEN (STR=3, ARV/BRV pixel
counts per 360 deg, LSO/PSO origin strings sdddmmss.ss, ZNA zone),
SPR (NFL/NFC tile grid, PNC=PNL=128, BAD = image file name, TIF
tile-index flag) and TIM (TSI tile indices).  The .IMG file is 8211
too; pixel data starts right after the field whose tag is ``IMG``
(located by the reference's 0x1E+"IMG" scan, skipping pad spaces) and
is stored tile-sequentially: 128*128 bytes per band (R, G, B) per
tile; TIM maps (row, col) tiles to 1-based positions (<= 0 = blank).

Geotransform: ZNA regular: (LSO, 360/ARV, 0, PSO, 0, -360/BRV);
ZNA 9/18 (polar): the reference's ARC polar equations.
"""

from __future__ import annotations

import math
import os

import numpy as np

from gdal_ray.sources.iso8211 import ISO8211Reader


def _angle(s: str, deg_digits: int) -> float:
    """Fixed-position sdddmmss.ss (lon: 3 degree digits) / sddmmss.ss
    (lat: 2) -> decimal degrees; seconds are whatever follows (the
    reference parses by character position, so '0.810' seconds are
    legal)."""
    s = s.strip()
    sign = -1.0 if s.startswith("-") else 1.0
    s = s.lstrip("+-")
    deg = int(s[:deg_digits] or 0)
    minutes = int(s[deg_digits:deg_digits + 2] or 0)
    sec = float(s[deg_digits + 2:] or 0)
    return sign * (deg + minutes / 60.0 + sec / 3600.0)


def _find_ci(dirname: str, name: str):
    name = name.strip()
    c = os.path.join(dirname, name)
    if os.path.exists(c):
        return c
    for f in os.listdir(dirname):
        if f.lower() == name.lower():
            return os.path.join(dirname, f)
    return None


def adrg_meta(path: str) -> dict:
    """`path` = .GEN or .THF (transmittal header: sibling .GEN used)."""
    dirname = os.path.dirname(path) or "."
    if path.upper().endswith(".THF"):
        gens = [f for f in os.listdir(dirname)
                if f.upper().endswith(".GEN")]
        if not gens:
            raise ValueError("ADRG: no .GEN next to the THF")
        path = os.path.join(dirname, sorted(gens)[0])
    with open(path, "rb") as f:
        r = ISO8211Reader(f.read())
    gin = None
    for rec in r.records():
        rty = (rec.get("001", [{}])[0].get("RTY") or [""])[0]
        if rty == "GIN":
            gin = rec
            break
    if gin is None:
        raise ValueError("ADRG: no GIN record in GEN file")
    gen = gin["GEN"][0]
    spr = gin["SPR"][0]

    def g(d, k, default=None):
        v = d.get(k)
        return v[0] if v else default

    nfl, nfc = g(spr, "NFL"), g(spr, "NFC")
    bad = (g(spr, "BAD") or "").strip()
    tif = (g(spr, "TIF") or "N").strip().upper().startswith("Y")
    tiles = gin.get("TIM", [{}])[0].get("TSI") if tif else None
    arv, brv = g(gen, "ARV"), g(gen, "BRV")
    zna = g(gen, "ZNA", 0)
    lso = _angle(g(gen, "LSO") or "0", 3)
    pso = _angle(g(gen, "PSO") or "0", 2)
    if zna == 9:  # north polar ARC
        gt = (111319.4907933 * (90.0 - pso) * math.sin(
            lso * math.pi / 180.0),
            40075016.68558 / arv, 0.0,
            -111319.4907933 * (90.0 - pso) * math.cos(
                lso * math.pi / 180.0),
            0.0, -40075016.68558 / brv)
    elif zna == 18:  # south polar ARC
        gt = (111319.4907933 * (90.0 + pso) * math.sin(
            lso * math.pi / 180.0),
            40075016.68558 / arv, 0.0,
            111319.4907933 * (90.0 + pso) * math.cos(
                lso * math.pi / 180.0),
            0.0, -40075016.68558 / brv)
    else:
        gt = (lso, 360.0 / arv, 0.0, pso, 0.0, -360.0 / brv)
    img = _find_ci(dirname, bad) or _find_ci(
        dirname, os.path.basename(path)[:-4] + ".IMG")
    return {
        "driver": "ADRG",
        "width": nfc * 128, "height": nfl * 128, "bands": 3,
        "dtype": "uint8", "nfl": nfl, "nfc": nfc,
        "tile_index": list(tiles) if tiles else None,
        "img_path": img, "zna": zna, "geotransform": gt,
        "arv": arv, "brv": brv,
    }


def _img_data_offset(buf: bytes) -> int:
    """Reference scan: after 0x1E + 'IMG', skip 4 then pad spaces."""
    m = buf.find(b"\x1eIMG")
    if m < 0:
        raise ValueError("ADRG: no IMG field in image file")
    p = m + 4 + 3  # past 1E+'IMG', then 3 skipped bytes
    while p < len(buf) and buf[p:p + 1] == b" ":
        p += 1
    return p + 1


def read_adrg_array(path: str) -> np.ndarray:
    m = adrg_meta(path)
    with open(m["img_path"], "rb") as f:
        buf = f.read()
    off = _img_data_offset(buf)
    nfl, nfc = m["nfl"], m["nfc"]
    out = np.zeros((nfl * 128, nfc * 128, 3), np.uint8)
    tilesz = 128 * 128
    for ty in range(nfl):
        for tx in range(nfc):
            blk = ty * nfc + tx
            if m["tile_index"] is not None:
                tsi = m["tile_index"][blk]
                if tsi <= 0:
                    continue
                base = off + (tsi - 1) * tilesz * 3
            else:
                base = off + blk * tilesz * 3
            for b in range(3):
                raw = buf[base + b * tilesz:base + (b + 1) * tilesz]
                if len(raw) < tilesz:
                    raw = raw + b"\x00" * (tilesz - len(raw))
                out[ty * 128:(ty + 1) * 128, tx * 128:(tx + 1) * 128,
                    b] = np.frombuffer(raw, np.uint8).reshape(128, 128)
    return out


# ------------------------------------------------------------- ASRP/USRP


def srp_meta(path: str) -> dict:
    """SRP (ASRP geographic / USRP projected, frmts/adrg/srpdataset.cpp):
    same ISO 8211 shell; GIN record GEN holds numeric LSO/PSO (+LOD/LAD
    ground resolutions for USRP), SPR adds PCB (0 none, 4 nibble-RLE,
    8 byte-RLE) and PVB=8; one paletted byte band of 128px tiles."""
    dirname = os.path.dirname(path) or "."
    low = path.upper()
    if low.endswith(".THF"):
        gens = [f for f in os.listdir(dirname)
                if f.upper().endswith(".GEN")]
        if not gens:
            raise ValueError("SRP: no .GEN next to the THF")
        path = os.path.join(dirname, sorted(gens)[0])
    elif low.endswith(".IMG"):
        cand = path[:-4] + ".GEN"
        path = _find_ci(dirname, os.path.basename(cand)) or cand
    with open(path, "rb") as f:
        r = ISO8211Reader(f.read())
    gin = None
    prt = None
    for rec in r.records():
        rty = (rec.get("001", [{}])[0].get("RTY") or [""])[0]
        if rty == "GIN":
            gin = rec
            dsi = rec.get("DSI", [{}])[0]
            prt = (dsi.get("PRT") or [""])[0].strip()
            break
    if gin is None:
        raise ValueError("SRP: no GIN record")
    gen = gin["GEN"][0]
    spr = gin["SPR"][0]

    def g(d, k, default=None):
        v = d.get(k)
        return v[0] if v else default

    nfl, nfc = g(spr, "NFL"), g(spr, "NFC")
    pcb = g(spr, "PCB", 0)
    bad = (str(g(spr, "BAD") or "")).strip()
    tif = str(g(spr, "TIF") or "N").strip().upper().startswith("Y")
    tiles = gin.get("TIM", [{}])[0].get("TSI") if tif else None
    lso = float(g(gen, "LSO", 0.0))
    pso = float(g(gen, "PSO", 0.0))
    lod = float(g(gen, "LOD", 0.0))
    lad = float(g(gen, "LAD", 0.0))
    arv = g(gen, "ARV", 0)
    brv = g(gen, "BRV", 0)
    zna = g(gen, "ZNA", 0)
    if (prt or "").startswith("ASRP"):
        if zna == 9:
            gt = (111319.4907933 * (90.0 - pso / 3600.0) * math.sin(
                lso * math.pi / 648000.0), 40075016.68558 / arv, 0.0,
                -111319.4907933 * (90.0 - pso / 3600.0) * math.cos(
                    lso * math.pi / 648000.0), 0.0,
                -40075016.68558 / arv)
        elif zna == 18:
            gt = (111319.4907933 * (90.0 + pso / 3600.0) * math.sin(
                lso * math.pi / 648000.0), 40075016.68558 / arv, 0.0,
                111319.4907933 * (90.0 + pso / 3600.0) * math.cos(
                    lso * math.pi / 648000.0), 0.0,
                -40075016.68558 / arv)
        else:
            gt = (lso / 3600.0, 360.0 / arv, 0.0,
                  pso / 3600.0, 0.0, -360.0 / brv)
    else:  # USRP: projected meters + ground resolutions
        gt = (lso, lod, 0.0, pso, 0.0, -lad)
    img = _find_ci(dirname, bad) or _find_ci(
        dirname, os.path.basename(path)[:-4] + ".IMG")
    return {
        "driver": "SRP", "product": prt,
        "width": nfc * 128, "height": nfl * 128, "bands": 1,
        "dtype": "uint8", "nfl": nfl, "nfc": nfc, "pcb": pcb,
        "tile_index": list(tiles) if tiles else None,
        "img_path": img, "zna": zna, "geotransform": gt,
        "utm_zone": zna if prt == "USRP" else None,
    }


def _srp_decompress(buf: bytes, pcb: int) -> np.ndarray:
    """One compressed 128x128 tile (PCB 8: byte count+value pairs;
    PCB 4: nibble counts packed across bytes, rows nibble-aligned)."""
    out = np.zeros(128 * 128, np.uint8)
    i = 0
    px = 0
    half = False
    n = len(buf)
    while px < 128 * 128 and i + 1 < n + 1:
        if pcb == 8:
            if i + 2 > n:
                break
            count = buf[i]
            value = buf[i + 1]
            i += 2
        else:  # pcb == 4
            if (px % 128) == 0 and half:
                i += 1
                half = False
                continue
            if half:
                if i + 2 > n:
                    break
                count = buf[i] & 0xF
                value = buf[i + 1]
                i += 2
                half = False
            else:
                if i + 1 >= n:
                    break
                count = buf[i] >> 4
                value = ((buf[i] & 0xF) << 4) + (buf[i + 1] >> 4)
                half = True
                i += 1
        end = min(px + count, 128 * 128)
        out[px:end] = value
        px = end
    return out.reshape(128, 128)


def read_srp_array(path: str) -> np.ndarray:
    m = srp_meta(path)
    with open(m["img_path"], "rb") as f:
        buf = f.read()
    off = _img_data_offset(buf)
    nfl, nfc = m["nfl"], m["nfc"]
    pcb = m["pcb"]
    out = np.zeros((nfl * 128, nfc * 128), np.uint8)
    tilesz = 128 * 128
    for ty in range(nfl):
        for tx in range(nfc):
            blk = ty * nfc + tx
            if m["tile_index"] is not None:
                tsi = m["tile_index"][blk]
                if tsi <= 0:
                    continue
                base = off + (tsi - 1) * (tilesz if pcb == 0 else 1)
            else:
                base = off + blk * tilesz
            if pcb == 0:
                raw = buf[base:base + tilesz]
                if len(raw) < tilesz:
                    raw = raw + b"\x00" * (tilesz - len(raw))
                tile = np.frombuffer(raw, np.uint8).reshape(128, 128)
            else:
                tile = _srp_decompress(buf[base:base + tilesz * 2], pcb)
            out[ty * 128:(ty + 1) * 128,
                tx * 128:(tx + 1) * 128] = tile
    return out
