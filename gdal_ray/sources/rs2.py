"""RADARSAT-2 product reader (frmts/rs2/rs2dataset.cpp): product.xml
names the per-polarization band rasters (fullResolutionImageData) and
calibration LUTs; calibrated values are (DN^2 + offset) / gain[col] as
float32 for magnitude data, DN / gain for complex.  Band files open
through the engine's TIFF reader.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np


def _strip(tag: str) -> str:
    return tag.split("}")[-1]


def rs2_meta(product_xml: str) -> dict:
    root = ET.parse(product_xml).getroot()
    md = {}
    for key in ("satellite", "sensor", "beamModeMnemonic",
                "rawDataStartTime", "productType", "dataType",
                "bitsPerSample", "numberOfSamplesPerLine",
                "numberOfLines"):
        for el in root.iter():
            if _strip(el.tag) == key and el.text:
                md[key] = el.text.strip()
                break
    bands = []
    for el in root.iter():
        if _strip(el.tag) == "fullResolutionImageData":
            bands.append({"pole": el.get("pole", ""),
                          "file": (el.text or "").strip()})
    gcps = []
    for el in root.iter():
        if _strip(el.tag) == "imageTiePoint":
            pt = {}
            for ch in el.iter():
                t = _strip(ch.tag)
                if t in ("line", "pixel", "latitude", "longitude",
                         "height") and ch.text:
                    pt[t] = float(ch.text)
            if pt:
                gcps.append(pt)
    return {"driver": "RS2",
            "width": int(md.get("numberOfSamplesPerLine", "0")),
            "height": int(md.get("numberOfLines", "0")),
            "bands": bands, "gcps": gcps, "metadata": md}


def _read_band(product_xml: str, band: dict) -> np.ndarray:
    from gdal_ray.codecs.tiff import read_geotiff

    p = os.path.join(os.path.dirname(os.path.abspath(product_xml)),
                     band["file"])
    a, _ = read_geotiff(open(p, "rb").read())
    return a[:, :, 0] if a.ndim == 3 else a


def _lut(product_xml: str, name: str) -> tuple[float, np.ndarray]:
    p = os.path.join(os.path.dirname(os.path.abspath(product_xml)),
                     name)
    root = ET.parse(p).getroot()
    offset = 0.0
    gains = np.ones(1)
    for el in root.iter():
        if _strip(el.tag) == "offset" and el.text:
            offset = float(el.text)
        elif _strip(el.tag) == "gains" and el.text:
            gains = np.array([float(v) for v in el.text.split()])
    return offset, gains


def read_rs2_array(product_xml: str, *, pole: str | None = None,
                   calibration: str | None = None,
                   lut: str = "lut.xml") -> np.ndarray:
    """One polarization band; ``calibration`` in {None, 'BETA0',
    'SIGMA0', 'GAMMA'} applies the per-column LUT the reference way:
    (DN^2 + offset) / gain  ->  float32."""
    m = rs2_meta(product_xml)
    band = next((b for b in m["bands"]
                 if pole is None or b["pole"] == pole), None)
    if band is None:
        raise ValueError(f"no band for pole {pole!r}")
    a = _read_band(product_xml, band)
    if calibration is None:
        return a
    offset, gains = _lut(product_xml, lut)
    g = gains[:a.shape[1]] if len(gains) >= a.shape[1] else np.resize(
        gains, a.shape[1])
    dn = a.astype(np.float32)
    return ((dn * dn) + np.float32(offset)) / g.astype(np.float32)
