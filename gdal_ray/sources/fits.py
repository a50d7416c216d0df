"""FITS reader (frmts/fits/fitsdataset.cpp delegates to cfitsio; here
the public FITS 4.0 standard directly): 2880-byte header units of
80-char keyword cards (SIMPLE/XTENSION, BITPIX, NAXIS/NAXISn, BSCALE,
BZERO, END), big-endian data units padded to 2880, multiple HDUs —
the primary plus IMAGE/BINTABLE extensions.  Like the reference, a
dataset is the first HDU with image data; several image HDUs surface
as subdatasets.
"""

from __future__ import annotations

import numpy as np

_BLOCK = 2880

_BITPIX_DT = {8: ">u1", 16: ">i2", 32: ">i4", 64: ">i8",
              -32: ">f4", -64: ">f8"}


def _read_header(f) -> tuple[dict, list[tuple[str, str]]] | None:
    cards = []
    kv = {}
    while True:
        block = f.read(_BLOCK)
        if len(block) < _BLOCK:
            return None
        done = False
        for i in range(0, _BLOCK, 80):
            card = block[i:i + 80].decode("ascii", "replace")
            key = card[:8].strip()
            if key == "END":
                done = True
                break
            if not key or card[8] != "=":
                continue
            val = card[10:].split("/")[0].strip()
            if val.startswith("'"):
                val = val[1:val.rindex("'")]
            cards.append((key, val))
            kv[key] = val
        if done:
            return kv, cards


def _hdu_layout(kv: dict) -> tuple[int, list[int], int]:
    bitpix = int(kv.get("BITPIX", "8"))
    naxis = int(kv.get("NAXIS", "0"))
    dims = [int(kv.get(f"NAXIS{i}", "0")) for i in range(1, naxis + 1)]
    if naxis == 0 or any(d == 0 for d in dims):
        n = 0  # headerless HDU: no data unit at all
    else:
        n = 1
        for d in dims:
            n *= d
    nbytes = n * abs(bitpix) // 8
    # PCOUNT/GCOUNT for extensions
    nbytes += int(kv.get("PCOUNT", "0")) * abs(bitpix) // 8
    return bitpix, dims, nbytes


def fits_hdus(path: str) -> list[dict]:
    """Walk every HDU: keyword dict + data offset/size."""
    out = []
    with open(path, "rb") as f:
        while True:
            h = _read_header(f)
            if h is None:
                break
            kv, cards = h
            bitpix, dims, nbytes = _hdu_layout(kv)
            off = f.tell()
            out.append({"kv": kv, "cards": cards, "bitpix": bitpix,
                        "dims": dims, "data_offset": off,
                        "data_bytes": nbytes,
                        "xtension": kv.get("XTENSION", "").strip()})
            pad = (nbytes + _BLOCK - 1) // _BLOCK * _BLOCK
            f.seek(off + pad)
    return out


def fits_meta(path: str) -> dict:
    hdus = fits_hdus(path)
    images = [i for i, h in enumerate(hdus)
              if len(h["dims"]) >= 2 and all(d > 0 for d in h["dims"])
              and h["xtension"] in ("", "IMAGE")]
    layers = []
    for i in images:
        d = hdus[i]["dims"]
        layers.append({"hdu": i, "width": d[0], "height": d[1],
                       "bands": d[2] if len(d) > 2 else 1,
                       "bitpix": hdus[i]["bitpix"]})
    # non-structural metadata cards, later HDUs overriding earlier
    skip = {"SIMPLE", "BITPIX", "NAXIS", "XTENSION", "PCOUNT", "GCOUNT",
            "EXTEND", "BSCALE", "BZERO", "COMMENT", "HISTORY",
            "CHECKSUM", "DATASUM"}
    md = {}
    for h in hdus:
        for k, v in h["cards"]:
            if k not in skip and not k.startswith("NAXIS"):
                md[k] = v
    return {"driver": "FITS", "n_hdus": len(hdus),
            "image_hdus": layers, "metadata": md}


def read_fits_array(path: str, hdu: int | None = None) -> np.ndarray:
    """Image data of one HDU (default: first image HDU) -> numpy array,
    rows in file order (the reference driver's convention), BSCALE/BZERO
    applied when non-identity (floats out)."""
    hdus = fits_hdus(path)
    if hdu is None:
        cands = [i for i, h in enumerate(hdus)
                 if len(h["dims"]) >= 2 and all(d > 0 for d in h["dims"])
                 and h["xtension"] in ("", "IMAGE")]
        if not cands:
            raise ValueError(f"no image HDU in {path}")
        hdu = cands[0]
    h = hdus[hdu]
    dt = np.dtype(_BITPIX_DT[h["bitpix"]])
    dims = h["dims"]
    with open(path, "rb") as f:
        f.seek(h["data_offset"])
        raw = f.read(int(np.prod(dims)) * dt.itemsize)
    a = np.frombuffer(raw, dtype=dt)
    # FITS is Fortran-ordered (NAXIS1 fastest); rows surface in file
    # order, matching the reference driver's checksums
    a = a.reshape(list(reversed(dims)))
    a = np.ascontiguousarray(a.astype(dt.newbyteorder("=")))
    bscale = float(h["kv"].get("BSCALE", "1"))
    bzero = float(h["kv"].get("BZERO", "0"))
    if (bscale, bzero) != (1.0, 0.0) and h["bitpix"] > 0 and \
            not (h["bitpix"] == 8 and bzero == 0.0):
        return a.astype(np.float64) * bscale + bzero
    return a


def read_fits(path: str, hdu: int | None = None, **_kw):
    """-> Ray Dataset (row0, n_rows, band, data) over the image HDU."""
    import ray.data as rd

    arr = read_fits_array(path, hdu)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    elif arr.ndim == 3:
        arr = np.moveaxis(arr, 0, 2)  # (bands, h, w) -> (h, w, bands)
    return rd.from_items(
        [{"row0": 0, "n_rows": arr.shape[0], "band": b,
          "data": np.ascontiguousarray(arr[:, :, b]).tobytes()}
         for b in range(arr.shape[2])])
