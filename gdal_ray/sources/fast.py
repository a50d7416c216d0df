"""EOSAT FAST Format driver (Landsat L7A / Euromap IRS) —
frmts/raw/fastdataset.cpp wire facts:

- ASCII administrative header: ``KEY =VALUE`` fields (PIXELS PER LINE,
  LINES PER BAND [a/b pair], BITS PER PIXEL, SATELLITE, SENSOR,
  PROJECTION, ZONE, FILENAME = per-band entries);
- band files: Landsat via the FILENAME fields (or <base>.b%02d),
  Euromap IRS via the em_names.pdf last-character conventions
  (PAN: header letter a..j -> digit '0'+i; LISS3: the 7 letter groups
  each mapping to 4 band characters; WIFS: trailing '0' -> '1','2');
- georeferencing: the four corner records after the PROJECTION keyword
  (``UL  <28 chars of lon/lat text><13-char easting> <13-char
  northing>``), eastings >= 1e6 carry the UTM zone premultiplied
  (zone * 1e6 subtracted), and the geotransform is the least-squares
  affine through the 4 pixel-center corner GCPs — matching
  GDALGCPsToGeoTransform.
"""

from __future__ import annotations

import os
import re

import numpy as np


def _find_file_ci(dirname: str, name: str):
    cand = os.path.join(dirname, name)
    if os.path.exists(cand):
        return cand
    low = name.lower()
    for f in os.listdir(dirname):
        if f.lower() == low:
            return os.path.join(dirname, f)
    return None


def _euromap_bands(path: str, sensor: str):
    """Band files per the Euromap IRS-1C/1D naming convention."""
    base = path[:-1]
    last = path[-1].lower()
    out = []

    def try_char(c):
        for cc in (c, c.upper() if c.isalpha() else c):
            p = base + cc
            if os.path.exists(p) and os.path.getsize(p) >= 0:
                return p
        return None

    if sensor == "PAN":
        if "a" <= last <= "j":
            p = try_char(chr(ord(last) - ord("a") + ord("0")))
            if p:
                out.append(p)
        elif "k" <= last <= "m":
            p = try_char(chr(ord(last) - ord("k") + ord("n")))
            if p:
                out.append(p)
    elif sensor == "LISS3":
        groups = [("0", "2345"), ("6", "789a"), ("b", "cdef"),
                  ("g", "hijk"), ("l", "mnop"), ("q", "rstu"),
                  ("v", "wxyz")]
        for head, data in groups:
            if last == head:
                for c in data:
                    p = try_char(c)
                    if p:
                        out.append(p)
                break
    elif sensor == "WIFS":
        if last == "0":
            for c in "12":
                p = try_char(c)
                if p:
                    out.append(p)
    return out


def fast_meta(path: str) -> dict:
    with open(path, "rb") as f:
        header = f.read(65536).decode("latin-1", "replace")
    if "PIXELS PER LINE" not in header or "ACQUISITION DATE" not in header:
        raise ValueError("not an EOSAT FAST header")

    def val(key, pat=r"([^\s]+)"):
        m = re.search(re.escape(key) + r"\s*=\s*" + pat, header)
        return m.group(1) if m else None

    w = int(val("PIXELS PER LINE", r"(\d+)") or 0)
    lines = val("LINES PER BAND", r"(\d+)") or "0"
    h = int(lines)
    bits = int(val("BITS PER PIXEL", r"(\d+)") or 8)
    if bits != 8:
        raise NotImplementedError(f"FAST {bits} bits per pixel")
    satellite = val("SATELLITE") or ""
    sensor = val("SENSOR") or ""
    is_landsat = satellite.upper().startswith("LANDSAT")
    dirname = os.path.dirname(path) or "."
    bands = []
    if is_landsat:
        # FILENAME values are fixed 29-char fields that may abut the
        # next keyword with no separator
        for m in re.finditer(r"FILENAME\s*=(.{0,29})", header):
            name = m.group(1).strip()
            if not name:
                continue
            p = _find_file_ci(dirname, name)
            if p:
                bands.append(p)
    if not bands:
        bands = _euromap_bands(path, sensor.upper())
    zone = int(val("ZONE", r"(\d+)") or 0)
    # corner records after the PROJECTION keyword: "UL <28 chars of
    # lon/lat><13-char x> <13-char y>"
    gi = header.find("PROJECTION")
    corners = {}
    if gi >= 0:
        geom = header[gi:]
        for tag in ("UL ", "UR ", "LL ", "LR "):
            i = geom.find(tag)
            if i < 0:
                continue
            base = i + len(tag) + 28
            try:
                x = float(geom[base:base + 13])
                y = float(geom[base + 14:base + 27])
            except ValueError:
                continue
            if x >= 1000000.0 and zone:
                x -= zone * 1000000.0
            corners[tag.strip()] = (x, y)
    gt = None
    if len(corners) == 4 and w and h:
        # least-squares affine through pixel-center corner GCPs
        # (GDALGCPsToGeoTransform)
        px = np.array([0.5, w - 0.5, w - 0.5, 0.5])
        ln = np.array([0.5, 0.5, h - 0.5, h - 0.5])
        xs = np.array([corners[k][0] for k in ("UL", "UR", "LR", "LL")])
        ys = np.array([corners[k][1] for k in ("UL", "UR", "LR", "LL")])
        A = np.column_stack([np.ones(4), px, ln])
        cx, _, _, _ = np.linalg.lstsq(A, xs, rcond=None)
        cy, _, _, _ = np.linalg.lstsq(A, ys, rcond=None)
        gt = (cx[0], cx[1], cx[2], cy[0], cy[1], cy[2])
    return {
        "driver": "FAST", "width": w, "height": h,
        "bands": max(1, len(bands)), "dtype": "uint8",
        "band_files": bands, "satellite": satellite, "sensor": sensor,
        "projection": val("PROJECTION"), "utm_zone": zone or None,
        "geotransform": gt,
    }


def read_fast_band(path: str, band: int = 0) -> np.ndarray:
    """One band -> (h, w) uint8; short band files zero-pad (the
    autotest fixtures carry placeholder/truncated imagery)."""
    m = fast_meta(path)
    w, h = m["width"], m["height"]
    if band >= len(m["band_files"]):
        return np.zeros((h, w), np.uint8)
    with open(m["band_files"][band], "rb") as f:
        raw = f.read(w * h)
    if len(raw) < w * h:
        raw = raw + b"\x00" * (w * h - len(raw))
    return np.frombuffer(raw, np.uint8).reshape(h, w)
