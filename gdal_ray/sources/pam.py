"""World files (.tfw/.wld) and PAM .aux.xml sidecars — GDAL's
out-of-band georeferencing and cached-statistics mechanisms:

- **World file** (gcore/gdal_misc.cpp GDALReadWorldFile /
  GDALWriteWorldFile): six lines A D B E C F where (C, F) is the CENTER
  of the top-left pixel; GDAL geotransforms are anchored at the
  top-left CORNER, so gt0 = C − A/2 − B/2 and gt3 = F − D/2 − E/2.
  Lookup order matches the reference: the "squeezed" extension
  (first + last letter + 'w', e.g. .tif → .tfw), then '.wld'.
- **PAM** (gcore/gdalpamdataset.cpp): ``<path>.aux.xml`` carrying
  per-band STATISTICS_* metadata so `gdalinfo -stats` is computed once
  and read back on every later open.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET


def world_file_candidates(raster_path: str) -> list[str]:
    base, ext = os.path.splitext(raster_path)
    out = []
    e = ext.lstrip(".")
    if len(e) >= 2:
        out.append(f"{base}.{e[0]}{e[-1]}w")          # .tif -> .tfw
        out.append(f"{base}{ext}w")                   # .tif -> .tifw
    out.append(base + ".wld")
    return out


def read_world_file(raster_path: str):
    """-> GDAL geotransform 6-tuple, or None when no world file."""
    for cand in world_file_candidates(raster_path):
        if os.path.exists(cand):
            with open(cand) as f:
                vals = [float(x) for x in f.read().split()[:6]]
            if len(vals) != 6:
                continue
            a, d, b, e, c, fy = vals
            return (c - a / 2.0 - b / 2.0, a, b,
                    fy - d / 2.0 - e / 2.0, d, e)
    return None


def write_world_file(raster_path: str, gt, *, generic: bool = False) -> str:
    """Write the squeezed-extension world file (or .wld); returns its
    path.  gt is the corner-anchored GDAL geotransform."""
    cands = world_file_candidates(raster_path)
    path = cands[-1] if generic else cands[0]
    cx = gt[0] + gt[1] / 2.0 + gt[2] / 2.0
    cy = gt[3] + gt[4] / 2.0 + gt[5] / 2.0
    body = "\n".join(f"{v:.10f}" for v in
                     (gt[1], gt[4], gt[2], gt[5], cx, cy)) + "\n"
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(body)
    os.replace(tmp, path)
    return path


def pam_path(raster_path: str) -> str:
    return raster_path + ".aux.xml"


def read_pam_stats(raster_path: str) -> dict[int, dict[str, float]]:
    """-> {band: {min, max, mean, stddev}} from <path>.aux.xml, empty
    when absent (the reference's silent-fallback behavior)."""
    p = pam_path(raster_path)
    if not os.path.exists(p):
        return {}
    out: dict[int, dict[str, float]] = {}
    root = ET.parse(p).getroot()
    keymap = {"STATISTICS_MINIMUM": "min", "STATISTICS_MAXIMUM": "max",
              "STATISTICS_MEAN": "mean", "STATISTICS_STDDEV": "stddev"}
    for band in root.findall("PAMRasterBand"):
        n = int(band.attrib.get("band", "1"))
        md = band.find("Metadata")
        if md is None:
            continue
        stats = {}
        for mdi in md.findall("MDI"):
            k = keymap.get(mdi.attrib.get("key", ""))
            if k is not None and mdi.text is not None:
                stats[k] = float(mdi.text)
        if stats:
            out[n] = stats
    return out


def write_pam_stats(raster_path: str,
                    stats: dict[int, dict[str, float]]) -> str:
    """Write per-band STATISTICS_* into <path>.aux.xml (atomic); merges
    over an existing PAM file's other content by rewriting only the
    stats entries."""
    root = ET.Element("PAMDataset")
    keymap = {"min": "STATISTICS_MINIMUM", "max": "STATISTICS_MAXIMUM",
              "mean": "STATISTICS_MEAN", "stddev": "STATISTICS_STDDEV"}
    for band in sorted(stats):
        b = ET.SubElement(root, "PAMRasterBand", band=str(band))
        md = ET.SubElement(b, "Metadata")
        for k in ("min", "max", "mean", "stddev"):
            if k in stats[band]:
                mdi = ET.SubElement(md, "MDI", key=keymap[k])
                mdi.text = repr(float(stats[band][k]))
    p = pam_path(raster_path)
    tmp = p + ".tmp"
    ET.ElementTree(root).write(tmp, encoding="utf-8",
                               xml_declaration=False)
    os.replace(tmp, p)
    return p
