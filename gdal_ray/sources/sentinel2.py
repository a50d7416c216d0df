"""Sentinel-2 L1C/L2A SAFE product metadata driver
(frmts/sentinel2/sentinel2dataset.cpp): the user-product
S2*_MTD_*.xml is parsed into the reference's flat metadata dict and the
resolution-grouped subdataset list (10m/20m/60m band groups + preview);
band rasters are the granule JP2s, which open through the engine's
JPEG 2000 reader.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

# index -> band name (MSI band order)
_BANDS = ["B1", "B2", "B3", "B4", "B5", "B6", "B7", "B8", "B8A",
          "B9", "B10", "B11", "B12"]
_RES_GROUPS = {
    "10m": ["B2", "B3", "B4", "B8"],
    "20m": ["B5", "B6", "B7", "B8A", "B11", "B12"],
    "60m": ["B1", "B9", "B10"],
}


def _strip(tag: str) -> str:
    return tag.split("}")[-1]


def _find_text(root, name: str) -> str | None:
    for el in root.iter():
        if _strip(el.tag) == name and el.text is not None:
            return el.text.strip()
    return None


def sentinel2_meta(xml_path: str) -> dict:
    tree = ET.parse(xml_path)
    root = tree.getroot()
    md: dict = {}

    for key in ("PRODUCT_START_TIME", "PRODUCT_STOP_TIME",
                "PROCESSING_LEVEL", "PRODUCT_TYPE",
                "PROCESSING_BASELINE", "GENERATION_TIME",
                "PREVIEW_IMAGE_URL", "PREVIEW_GEO_INFO",
                "DEGRADED_ANC_DATA_PERCENTAGE",
                "DEGRADED_MSI_DATA_PERCENTAGE"):
        v = _find_text(root, key)
        if v is not None:
            md[key] = v

    # Datatake block -> DATATAKE_1_* keys
    for el in root.iter():
        if _strip(el.tag) == "Datatake":
            md["DATATAKE_1_ID"] = el.get("datatakeIdentifier", "")
            for ch in el:
                md[f"DATATAKE_1_{_strip(ch.tag)}"] = (ch.text or "").strip()
            break

    cca = _find_text(root, "Cloud_Coverage_Assessment")
    if cca is not None:
        md["CLOUD_COVERAGE_ASSESSMENT"] = cca
    for flag in ("SENSOR_QUALITY_FLAG", "GEOMETRIC_QUALITY_FLAG",
                 "GENERAL_QUALITY_FLAG", "FORMAT_CORRECTNESS_FLAG",
                 "RADIOMETRIC_QUALITY_FLAG"):
        v = _find_text(root, flag)
        if v is not None:
            md[flag] = v

    qv = _find_text(root, "QUANTIFICATION_VALUE")
    if qv is not None:
        md["QUANTIFICATION_VALUE"] = qv
    u = _find_text(root, "U")
    if u is not None:
        md["REFLECTANCE_CONVERSION_U"] = u
    rb = _find_text(root, "REFERENCE_BAND")
    if rb is not None and rb.isdigit():
        md["REFERENCE_BAND"] = _BANDS[int(rb)]

    # special values: NODATA / SATURATED indices
    for el in root.iter():
        if _strip(el.tag) == "Special_Values":
            txt = idx = None
            for ch in el:
                if _strip(ch.tag) == "SPECIAL_VALUE_TEXT":
                    txt = (ch.text or "").strip()
                elif _strip(ch.tag) == "SPECIAL_VALUE_INDEX":
                    idx = (ch.text or "").strip()
            if txt and idx is not None:
                md[f"SPECIAL_VALUE_{txt}"] = idx

    # footprint: EXT_POS_LIST is lat lon pairs -> WKT lon lat
    pos = _find_text(root, "EXT_POS_LIST")
    if pos:
        vals = pos.split()
        pts = [(vals[i + 1], vals[i]) for i in range(0, len(vals), 2)]
        md["FOOTPRINT"] = "POLYGON((%s))" % ", ".join(
            f"{lon} {lat}" for lon, lat in pts)

    # granules -> UTM zones (granule id ...T{zone}{band letter}{..}_)
    zones = []
    granules = []
    for el in root.iter():
        if _strip(el.tag) == "Granules" or _strip(el.tag) == "Granule":
            gid = el.get("granuleIdentifier", "")
            granules.append(gid)
            m = re.search(r"_T(\d{2})[A-Z]{3}", gid)
            if m and m.group(1) not in zones:
                zones.append(m.group(1))

    subdatasets = []
    for zone in zones or [""]:
        epsg = f"EPSG_326{zone}" if zone else ""
        utm = f"UTM {int(zone)}N" if zone else ""
        for res in ("10m", "20m", "60m"):
            subdatasets.append({
                "name": f"SENTINEL2_L1C:{xml_path}:{res}:{epsg}",
                "desc": (f"Bands {', '.join(_RES_GROUPS[res])} with "
                         f"{res} resolution, {utm}"),
            })
        subdatasets.append({
            "name": f"SENTINEL2_L1C:{xml_path}:PREVIEW:{epsg}",
            "desc": f"RGB preview, {utm}",
        })
    return {"driver": "SENTINEL2", "metadata": md,
            "subdatasets": subdatasets, "granules": granules}
