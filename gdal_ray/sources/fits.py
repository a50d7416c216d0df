"""FITS raster driver — frmts/fits/fitsdataset.cpp analogue, from the
public NASA FITS 4.0 standard (the astronomy archive format).

Layout: 2880-byte blocks.  The primary HDU header is a sequence of
80-character cards (``KEYWORD = value / comment``) ending at ``END``,
padded to a block boundary; the data unit follows, big-endian,
row-major with NAXIS1 the fastest axis, padded to a block boundary.
Supported BITPIX: 8, 16, 32, 64 (signed ints) and -32/-64 (IEEE
floats); the BZERO=32768/BSCALE=1 convention for unsigned 16-bit is
decoded to uint16 exactly as the reference does (fitsdataset.cpp
LoadMetadata → GUInt16 path).  Extensions (additional HDUs) are
indexed by walking block counts — headers only, no data read.

Scale shape (the rawgrid/netcdf3 pattern): the header parses
driver-side; Ray tasks seek straight to their row-slab byte ranges.
The writer emits a spec-valid primary HDU driver-side (single
contiguous file, atomic rename).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

BLOCK = 2880

_BITPIX_DTYPE = {8: ">u1", 16: ">i2", 32: ">i4", 64: ">i8",
                 -32: ">f4", -64: ">f8"}


def _parse_cards(block_bytes: bytes) -> tuple[dict, bool]:
    """Parse one header block of 36 cards -> (updates, saw_END)."""
    out = {}
    for i in range(0, BLOCK, 80):
        card = block_bytes[i:i + 80].decode("ascii", "replace")
        key = card[:8].strip()
        if key == "END":
            return out, True
        if card[8:10] != "= ":
            continue  # COMMENT / HISTORY / blank
        val = card[10:].split("/", 1)[0].strip()
        if val.startswith("'"):
            out[key] = val.strip("'").strip()
        elif val in ("T", "F"):
            out[key] = val == "T"
        else:
            try:
                out[key] = int(val)
            except ValueError:
                try:
                    out[key] = float(val)
                except ValueError:
                    out[key] = val
    return out, False


def _read_header(f) -> tuple[dict, int]:
    """-> (cards, data_offset_after_header) from the current position."""
    cards: dict = {}
    while True:
        blk = f.read(BLOCK)
        if len(blk) < BLOCK:
            raise ValueError("FITS: truncated header")
        upd, done = _parse_cards(blk)
        cards.update(upd)
        if done:
            return cards, f.tell()


def _data_size(cards: dict) -> int:
    naxis = int(cards.get("NAXIS", 0))
    if naxis == 0:
        return 0
    n = abs(int(cards["BITPIX"])) // 8
    for ax in range(1, naxis + 1):
        n *= int(cards[f"NAXIS{ax}"])
    return n


def fits_meta(path: str) -> dict:
    """Primary-HDU geometry + an index of extension HDUs (headers only)."""
    with open(path, "rb") as f:
        cards, data_off = _read_header(f)
        if cards.get("SIMPLE") is not True:
            raise ValueError("FITS: primary HDU missing SIMPLE = T")
        bitpix = int(cards["BITPIX"])
        if bitpix not in _BITPIX_DTYPE:
            raise NotImplementedError(f"FITS BITPIX {bitpix}")
        naxis = int(cards.get("NAXIS", 0))
        w = int(cards.get("NAXIS1", 0))
        h = int(cards.get("NAXIS2", 1 if naxis >= 1 and w else 0))
        bands = int(cards.get("NAXIS3", 1)) if naxis >= 3 else 1
        bzero = float(cards.get("BZERO", 0.0))
        bscale = float(cards.get("BSCALE", 1.0))
        meta = {
            "format": "FITS", "width": w, "height": h, "bands": bands,
            "bitpix": bitpix, "dtype": _BITPIX_DTYPE[bitpix],
            "bzero": bzero, "bscale": bscale,
            "uint16_convention": bitpix == 16 and bzero == 32768.0
                                 and bscale == 1.0,
            "data_offset": data_off, "cards": cards, "extensions": [],
        }
        # linear WCS geotransform in the native WCS units: CRPIX is
        # 1-based at the pixel CENTER per the FITS standard and rows map
        # in storage order (edge = CRVAL + (0.5 − CRPIX)·CDELT — derived
        # against the reference's expected byte_merc.fits geotransform,
        # which this formula reproduces exactly after the per-axis
        # unit conversion).  The reference additionally converts
        # degree-space projected CTYPEs to meters via the A_RADIUS
        # spheroid (fitsdataset.cpp WCS handling) — not performed here;
        # values stay in WCS units with the CTYPE reported alongside.
        if all(k in cards for k in
               ("CRPIX1", "CRVAL1", "CDELT1", "CRPIX2", "CRVAL2", "CDELT2")):
            d1, d2 = float(cards["CDELT1"]), float(cards["CDELT2"])
            gt0 = float(cards["CRVAL1"]) + (0.5 - float(cards["CRPIX1"])) * d1
            top = float(cards["CRVAL2"]) + (0.5 - float(cards["CRPIX2"])) * d2
            meta["geotransform"] = (gt0, d1, 0.0, top, 0.0, d2)
            meta["ctype"] = (cards.get("CTYPE1"), cards.get("CTYPE2"))
        if "BLANK" in cards:
            meta["nodata"] = float(cards["BLANK"])
        # walk extension HDUs (headers only — block-count seeks)
        size = os.path.getsize(path)
        pos = data_off + (_data_size(cards) + BLOCK - 1) // BLOCK * BLOCK
        while pos + BLOCK <= size:
            f.seek(pos)
            try:
                xcards, xoff = _read_header(f)
            except ValueError:
                break
            meta["extensions"].append({
                "xtension": xcards.get("XTENSION", "?"),
                "offset": pos, "data_offset": xoff,
                "naxis": [int(xcards.get(f"NAXIS{i}", 0))
                          for i in range(1, int(xcards.get("NAXIS", 0)) + 1)],
            })
            pos = xoff + (_data_size(xcards) + BLOCK - 1) // BLOCK * BLOCK
        return meta


def _apply_scaling(arr: np.ndarray, meta: dict) -> np.ndarray:
    if meta["uint16_convention"]:
        return (arr.astype(np.int32) + 32768).astype(np.uint16)
    if meta["bzero"] != 0.0 or meta["bscale"] != 1.0:
        return arr * meta["bscale"] + meta["bzero"]
    return arr


def read_fits_array(path: str) -> np.ndarray:
    """Whole primary data unit -> (h, w) or (h, w, bands), native order,
    unsigned-16 convention applied (tests/small rasters)."""
    m = fits_meta(path)
    n = m["width"] * m["height"] * m["bands"]
    with open(path, "rb") as f:
        f.seek(m["data_offset"])
        flat = np.frombuffer(f.read(n * np.dtype(m["dtype"]).itemsize),
                             dtype=m["dtype"]).astype(
            np.dtype(m["dtype"]).newbyteorder("="))
    arr = flat.reshape(m["bands"], m["height"], m["width"])
    arr = _apply_scaling(arr, m)
    return arr[0] if m["bands"] == 1 else arr.transpose(1, 2, 0)


def read_fits(path: str, *, rows_per_block: int = 1024):
    """-> Dataset of row-slab chunks (row0, n_rows, band, data:binary),
    the open_raster chunk schema; one seek per (slab, band)."""
    import ray.data as rd

    m = fits_meta(path)
    h, w, bands = m["height"], m["width"], m["bands"]
    itemsize = np.dtype(m["dtype"]).itemsize
    items = []
    for lo in range(0, h, rows_per_block):
        for band in range(bands):
            items.append({"row0": lo, "n_rows": min(rows_per_block, h - lo),
                          "band": band})

    def load(t: pa.Table) -> pa.Table:
        rows = {"row0": [], "n_rows": [], "band": [], "data": []}
        with open(path, "rb") as f:
            for it in t.to_pylist():
                lo, n, band = it["row0"], it["n_rows"], it["band"]
                f.seek(m["data_offset"] + (band * h + lo) * w * itemsize)
                raw = np.frombuffer(f.read(n * w * itemsize), dtype=m["dtype"])
                arr = _apply_scaling(
                    raw.astype(np.dtype(m["dtype"]).newbyteorder("=")), m)
                rows["row0"].append(lo)
                rows["n_rows"].append(n)
                rows["band"].append(band)
                rows["data"].append(np.ascontiguousarray(arr).tobytes())
        return pa.table({
            "row0": pa.array(rows["row0"], pa.int64()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "band": pa.array(rows["band"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    nb = max(1, min(len(items), 32))
    return rd.from_items(items, override_num_blocks=nb).map_batches(
        load, batch_format="pyarrow")


# ---------------------------------------------------------------- writer

def _card(key: str, val) -> bytes:
    if isinstance(val, bool):
        s = f"{key:<8}= {'T' if val else 'F':>20}"
    elif isinstance(val, (int, float, np.integer, np.floating)):
        s = f"{key:<8}= {val!r:>20}"
    else:
        s = f"{key:<8}= '{val}'"
    return s.ljust(80).encode("ascii")


def write_fits(path: str, arr: np.ndarray, *, extra_cards: dict | None = None) -> None:
    """(h, w[, bands]) -> spec-valid primary HDU.  uint16 input uses the
    BZERO=32768 convention (stored int16), matching the reference."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        planes = arr[None, :, :]
    else:
        planes = arr.transpose(2, 0, 1)
    bzero = None
    store = planes
    if arr.dtype == np.uint16:
        store = (planes.astype(np.int32) - 32768).astype(np.int16)
        bzero = 32768.0
    dt_map = {np.dtype(np.uint8): 8, np.dtype(np.int16): 16,
              np.dtype(np.int32): 32, np.dtype(np.int64): 64,
              np.dtype(np.float32): -32, np.dtype(np.float64): -64}
    if store.dtype not in dt_map:
        raise NotImplementedError(f"FITS write dtype {store.dtype}")
    bitpix = dt_map[store.dtype]
    cards = [_card("SIMPLE", True), _card("BITPIX", bitpix),
             _card("NAXIS", 3 if planes.shape[0] > 1 else 2),
             _card("NAXIS1", store.shape[2]), _card("NAXIS2", store.shape[1])]
    if planes.shape[0] > 1:
        cards.append(_card("NAXIS3", store.shape[0]))
    if bzero is not None:
        cards.append(_card("BZERO", bzero))
        cards.append(_card("BSCALE", 1.0))
    for k, v in (extra_cards or {}).items():
        cards.append(_card(k[:8].upper(), v))
    cards.append("END".ljust(80).encode("ascii"))
    header = b"".join(cards)
    header += b" " * (-len(header) % BLOCK)
    data = store.astype(_BITPIX_DTYPE[bitpix]).tobytes()
    data += b"\x00" * (-len(data) % BLOCK)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(header + data)
    os.replace(tmp, path)
