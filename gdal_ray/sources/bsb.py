"""Maptech/NOAA BSB nautical chart driver (.kap) — frmts/bsb/bsb_read.c
wire facts:

- ASCII header records (VER/, BSB/ with RA=width,height, KNP/, RGB/i,r,g,b
  palette entries; continuation lines start with whitespace) terminated
  by the byte pair 0x1A 0x00 (up to ~100 junk bytes tolerated);
- one depth byte follows (1..7 bits per pixel; some USGS files store the
  ASCII digit);
- scanlines: a big-endian 7-bit varint line marker (1-based for
  VER >= 2.0), then runs until a 0x00 terminator: the first byte holds
  the pixel value in the bits under the continuation bit
  (value = (b & ((2^depth - 1) << (7 - depth))) >> (7 - depth)) and the
  low (7 - depth) bits start the run count; while the continuation bit
  is set further bytes extend the count (count = count * 128 + low 7
  bits); each run emits count + 1 pixels.  A line decoded one pixel
  short is padded with 0 (known producer quirk).

The band is the palette index plane (matching the reference's checksum
convention); the RGB palette rides in the meta dict.
"""

from __future__ import annotations

import numpy as np


def _parse_header(buf: bytes):
    """-> (header_text_records, data_offset_after_1A00)."""
    # find 0x1A 0x00 within the early file
    pos = 0
    while True:
        i = buf.find(b"\x1a", pos)
        if i < 0:
            raise ValueError("BSB: no 0x1A header terminator")
        if buf[i + 1:i + 2] == b"\x00":
            return buf[:i].decode("latin-1", "replace"), i + 2
        pos = i + 1


def bsb_meta(path: str) -> dict:
    with open(path, "rb") as f:
        buf = f.read()
    text, dpos = _parse_header(buf)
    # unfold continuation lines
    records = []
    for ln in text.split("\n"):
        ln = ln.rstrip("\r")
        if not ln:
            continue
        if ln[0] in " \t" and records:
            records[-1] += "," + ln.strip()
        else:
            records.append(ln.strip())
    kv = {}
    palette = {}
    version = 2.0
    w = h = None
    for r in records:
        if r.startswith("VER/"):
            try:
                version = float(r[4:].split(",")[0])
            except ValueError:
                pass
        elif r.startswith("RGB/"):
            try:
                i, rr, gg, bb = (int(v) for v in r[4:].split(",")[:4])
                palette[i] = (rr, gg, bb)
            except ValueError:
                pass
        elif r.startswith("BSB/") or r.startswith("NOS/"):
            for part in r[4:].split(","):
                if "=" in part:
                    k, v = part.split("=", 1)
                    kv[k.strip()] = v.strip()
            if "RA" in kv:
                # RA=w,h -> the two values straddle the comma split
                pass
    # RA appears as RA=w followed by a bare h in the comma split; re-scan
    import re

    m = re.search(r"RA=(\d+)\s*,\s*(\d+)", text)
    if m:
        w, h = int(m.group(1)), int(m.group(2))
    if not w or not h:
        raise ValueError("BSB: no RA= dimensions")
    depth = buf[dpos]
    if 0x31 <= depth <= 0x38:
        depth -= 0x30
    if not (1 <= depth <= 7):
        raise ValueError(f"BSB: bad color depth {depth}")
    first_line = dpos + 1
    # trailing index table: last 4 bytes are a BIG-endian pointer to a
    # table of big-endian per-line offsets; a table one row shorter
    # than the declared height means the last row has no data — the
    # reference decrements the raster height (bsb_read.c)
    import struct

    line_offsets = None
    n = len(buf)
    if n >= 8:
        (tbl,) = struct.unpack_from(">I", buf, n - 4)
        if tbl > 0 and tbl + 4 * (h - 1) == n - 4:
            h -= 1
        if first_line < tbl and tbl + 4 * h <= n - 4:
            offs = struct.unpack_from(">%dI" % h, buf, tbl)
            ok = all(first_line <= o < tbl for o in offs) and \
                all(offs[i] <= offs[i + 1] for i in range(h - 1))
            if ok:
                line_offsets = list(offs)
    return {
        "driver": "BSB", "width": w, "height": h, "bands": 1,
        "dtype": "uint8", "version": version, "depth": int(depth),
        "palette": [palette.get(i, (0, 0, 0)) for i in
                    range(max(palette) + 1 if palette else 0)],
        "data_offset": first_line,
        "line_offsets": line_offsets,
        "scale": kv.get("SC"), "projection": kv.get("PR"),
        "datum": kv.get("GD"),
    }


def read_bsb_array(path: str) -> np.ndarray:
    """Sequential decode of all scanlines -> (h, w) palette indices."""
    m = bsb_meta(path)
    with open(path, "rb") as f:
        buf = f.read()
    w, h, depth = m["width"], m["height"], m["depth"]
    vshift = 7 - depth
    vmask = ((1 << depth) - 1) << vshift
    cmask = (1 << vshift) - 1
    h = m["height"]
    out = np.zeros((h, w), np.uint8)
    n = len(buf)
    line_offsets = m["line_offsets"]
    p = m["data_offset"]
    for y in range(h):
        if line_offsets is not None:
            p = line_offsets[y]
        # line marker: 7-bit varint (skip stray zero bytes before it)
        marker = 0
        while p < n:
            b = buf[p]
            p += 1
            if y != 0 and marker == 0 and b == 0:
                continue
            marker = (marker << 7) | (b & 0x7F)
            if not b & 0x80:
                break
        if p >= n:
            break
        row = out[y]
        x = 0
        while x < w and p < n:
            # one zero-terminated run segment; a line may span several
            # (bsb_read.c repeats until the buffer fills, #2782)
            while p < n:
                b = buf[p]
                p += 1
                if b == 0:
                    break
                pix = (b & vmask) >> vshift
                count = b & cmask
                while b & 0x80 and p < n:
                    b = buf[p]
                    p += 1
                    count = count * 128 + (b & 0x7F)
                if x + count + 1 > w:
                    count = w - x - 1
                if count >= 0:
                    row[x:x + count + 1] = pix
                    x += count + 1
            if x == w - 1:  # known one-pixel-short producer quirk
                row[x] = 0
                x += 1
    # the reference drops the 1-based palette's first entry and shifts
    # band values down by one (bsbdataset.cpp:101)
    return np.maximum(out.astype(np.int16) - 1, 0).astype(np.uint8)


def read_bsb(path: str, *, rows_per_block: int = 2048):
    """-> Dataset of row-slab chunks (the RLE stream is sequential, so
    one producing task decodes and slabs stream out)."""
    import pyarrow as pa
    import ray.data as rd

    m = bsb_meta(path)
    h = m["height"]
    items = [{"row0": lo, "n_rows": min(rows_per_block, h - lo)}
             for lo in range(0, h, rows_per_block)]

    def load(t: pa.Table) -> pa.Table:
        arr = read_bsb_array(path)
        rows = {"row0": [], "n_rows": [], "band": [], "data": []}
        for it in t.to_pylist():
            lo, nr = it["row0"], it["n_rows"]
            rows["row0"].append(lo)
            rows["n_rows"].append(nr)
            rows["band"].append(0)
            rows["data"].append(np.ascontiguousarray(
                arr[lo:lo + nr]).tobytes())
        return pa.table({
            "row0": pa.array(rows["row0"], pa.int64()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "band": pa.array(rows["band"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    return rd.from_items(items, override_num_blocks=max(1, min(
        len(items), 8))).map_batches(load, batch_format="pyarrow")
